"""Pipeline op + on-device preprocessing tests."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.data.pipelines import (
    SampleFrames, UntrimmedSampleFrames, Resize, CenterCrop, ThreeCrop,
    TenCrop, Flip, Normalize, FormatShape, RandomShuffleFrames,
    build_pipeline)
from cross_modal_video_engine_tpu.io.video_decode import (
    CvVideoReader, write_test_video)
from cross_modal_video_engine_tpu.ops.preprocess import (
    CLIP_MEAN, CLIP_STD, clip_preprocess, patchify, preprocess_frames)

rng = np.random.default_rng(31)


def _imgs(n=4, h=48, w=64):
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


# ---- samplers ---------------------------------------------------------------

def test_sample_frames_test_mode_centered():
    op = SampleFrames(clip_len=8, frame_interval=4, num_clips=1,
                      test_mode=True)
    r = op({"total_frames": 300, "start_index": 0})
    inds = r["frame_inds"]
    assert len(inds) == 8
    # avg_interval=(300-32+1)/1=269; offset=269/2=134; stride 4
    np.testing.assert_array_equal(inds, 134 + np.arange(8) * 4)


def test_sample_frames_short_video_loops():
    op = SampleFrames(clip_len=8, frame_interval=4, num_clips=1,
                      test_mode=True)
    r = op({"total_frames": 10, "start_index": 0})
    assert r["frame_inds"].max() < 10          # looped into range
    assert len(r["frame_inds"]) == 8


def test_sample_frames_train_randomized_in_range():
    op = SampleFrames(clip_len=8, frame_interval=2, num_clips=3, seed=0)
    r = op({"total_frames": 120, "start_index": 0})
    assert len(r["frame_inds"]) == 24
    assert r["frame_inds"].max() < 120


def test_untrimmed_sampler():
    op = UntrimmedSampleFrames(clip_len=1, frame_interval=16)
    r = op({"total_frames": 64})
    np.testing.assert_array_equal(r["frame_inds"], [8, 24, 40, 56])
    assert r["num_clips"] == 4


# ---- geometric ops ----------------------------------------------------------

def test_resize_short_side():
    r = Resize((-1, 32))({"imgs": _imgs(h=48, w=64)})
    assert r["imgs"][0].shape == (32, int(round(64 * 32 / 48)), 3)


def test_center_crop_and_threecrop_tencrop():
    r = CenterCrop(32)({"imgs": _imgs(h=48, w=64)})
    assert r["imgs"][0].shape == (32, 32, 3)
    r3 = ThreeCrop(48)({"imgs": _imgs(h=48, w=64)})
    assert len(r3["imgs"]) == 12 and r3["num_crops"] == 3
    r10 = TenCrop(32)({"imgs": _imgs(h=48, w=64)})
    assert len(r10["imgs"]) == 40 and r10["num_crops"] == 10


def test_flip_and_shuffle():
    imgs = _imgs()
    r = Flip(flip_ratio=1.0, seed=0)({"imgs": [i.copy() for i in imgs]})
    assert r["flip"]
    np.testing.assert_array_equal(r["imgs"][0], imgs[0][:, ::-1])
    rs = RandomShuffleFrames(shuffle_idx=[3, 2, 1, 0])(
        {"imgs": [i.copy() for i in imgs]})
    np.testing.assert_array_equal(rs["imgs"][0], imgs[3])


def test_normalize_and_format():
    imgs = _imgs(n=8, h=16, w=16)
    r = Normalize([127.5] * 3, [127.5] * 3)({"imgs": imgs})
    assert abs(float(np.mean(r["imgs"][0]))) < 1.0
    r.update({"num_clips": 2, "clip_len": 4})
    rf = FormatShape("NCTHW")(r)
    assert rf["imgs"].shape == (2, 3, 4, 16, 16)
    r2 = Normalize([127.5] * 3, [127.5] * 3)({"imgs": imgs,
                                              "num_clips": 2, "clip_len": 4})
    rf2 = FormatShape("NTHWC")(r2)
    assert rf2["imgs"].shape == (2, 4, 16, 16, 3)


def test_merge_clips_folds_segments_into_time():
    """The 1x1xN segment protocol (TSN/TSM/TRN/TIN recipes): N one-frame
    clips fold into a single (1, N, H, W, C) sample so the trainer's
    static layout carries the segments on the temporal axis."""
    from cross_modal_video_engine_tpu.data.pipelines import MergeClips
    imgs = _imgs(n=8, h=16, w=16)
    r = FormatShape("NTHWC")({"imgs": imgs, "num_clips": 8, "clip_len": 1})
    assert r["imgs"].shape == (8, 1, 16, 16, 3)
    m = MergeClips()(r)
    assert m["imgs"].shape == (1, 8, 16, 16, 3)
    assert m["num_clips"] == 1 and m["clip_len"] == 8
    # frames keep segment order
    np.testing.assert_array_equal(m["imgs"][0], np.stack(imgs))

    # segment sampling spreads one frame per uniform segment: offsets
    # must land in strictly increasing segments across the whole video
    op = SampleFrames(clip_len=1, frame_interval=1, num_clips=8, seed=0)
    inds = op({"total_frames": 80})["frame_inds"]
    assert len(inds) == 8
    assert all(10 * i <= f < 10 * (i + 1) for i, f in enumerate(inds))


def test_build_pipeline_from_config():
    p = build_pipeline([
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1,
             test_mode=True),
    ])
    r = p({"total_frames": 100, "start_index": 0})
    assert len(r["frame_inds"]) == 4


# ---- video decode end-to-end -------------------------------------------------

def test_video_decode_pipeline(tmp_path):
    frames = rng.integers(0, 255, (20, 64, 80, 3), dtype=np.uint8)
    path = str(tmp_path / "t.mp4")
    write_test_video(path, frames)
    p = build_pipeline([
        dict(type="DecordInit"),
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1,
             test_mode=True),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(-1, 48)),
        dict(type="CenterCrop", crop_size=48),
        dict(type="FormatShape", input_format="NTHWC"),
    ])
    r = p({"filename": path, "start_index": 0})
    assert r["imgs"].shape == (1, 4, 48, 48, 3)
    # lossy codec: frames roughly match the source at sampled indices
    reader = CvVideoReader(path)
    assert len(reader) == 20


# ---- on-device preprocessing --------------------------------------------------

def test_preprocess_frames_matches_host_math():
    u8 = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    out = np.asarray(preprocess_frames(u8, short_side=32, crop_size=32,
                                       out_dtype="float32"), np.float32)
    assert out.shape == (2, 32, 32, 3)
    # compare against numpy reference of the same math
    import jax
    x = u8.astype(np.float32) / 255.0
    ref = jax.image.resize(x, (2, 32, int(round(64 * 32 / 48)), 3), "bilinear")
    x0 = (np.asarray(ref.shape)[2] - 32) // 2
    ref = np.asarray(ref)[:, :, x0:x0 + 32, :]
    ref = (ref - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_clip_preprocess_targetpad():
    # 3:1 aspect exceeds 1.25 -> padded before resize
    u8 = rng.integers(0, 255, (1, 30, 90, 3), dtype=np.uint8)
    out = np.asarray(clip_preprocess(u8, dim=32), np.float32)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_patchify_layout():
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    out = np.asarray(patchify(x, 4))
    assert out.shape == (2, 4, 48)
    # first patch = top-left 4x4 block, row-major
    np.testing.assert_array_equal(out[0, 0], x[0, :4, :4, :].reshape(-1))
    # patch 1 is top-right block
    np.testing.assert_array_equal(out[0, 1], x[0, :4, 4:, :].reshape(-1))
