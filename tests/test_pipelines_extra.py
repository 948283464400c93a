"""Audio / pose / localization pipeline-op tail (data/pipelines_extra.py)
against reference semantics (MCT/mmaction/datasets/pipelines)."""

import os
import pickle
import wave

import numpy as np
import pytest

from cross_modal_video_engine_tpu.data.pipelines import build_pipeline
from cross_modal_video_engine_tpu.data.pipelines_extra import (
    AudioAmplify, AudioDecode, AudioDecodeInit, AudioFeatureSelector,
    BuildPseudoClip, FormatAudioShape, FormatGCNInput,
    GenerateLocalizationLabels, GeneratePoseTarget, JointToBone,
    LoadAudioFeature, LoadKineticsPose, LoadLocalizationFeature,
    LoadProposals, MelSpectrogram, PaddingWithLoop, PoseCompact, PoseDecode,
    PoseNormalize, RandomCrop, RandomRescale, SampleAVAFrames,
    SampleProposalFrames, UniformSampleFrames)

rng = np.random.default_rng(7)


# ---------------------------------------------------------------- audio


def _write_wav(path, y, sr=16000):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


def test_audio_decode_init_reads_wav(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    _write_wav(tmp_path / "a.wav", y, sr)
    out = AudioDecodeInit(sample_rate=sr)(
        {"audio_path": str(tmp_path / "a.wav")})
    assert out["sample_rate"] == sr
    assert out["length"] == sr
    np.testing.assert_allclose(out["audios"][:100], y[:100], atol=1e-3)


def test_audio_decode_init_resamples(tmp_path):
    _write_wav(tmp_path / "b.wav", np.zeros(8000) + 0.25, sr=8000)
    out = AudioDecodeInit(sample_rate=16000)(
        {"audio_path": str(tmp_path / "b.wav")})
    assert out["length"] == 16000  # 1 s at the target rate


def test_audio_decode_init_missing_pads_10s():
    out = AudioDecodeInit(sample_rate=4000)({"audio_path": "/nope.wav"})
    assert out["audios"].shape == (40000,)
    assert (out["audios"] == 0).all()


def test_audio_decode_clip_window():
    # 100 frames over 1000 samples; clip frames 0..9 -> samples ~10..100
    res = {"audios": np.arange(1000, dtype=np.float32),
           "frame_inds": np.arange(10), "num_clips": 1,
           "total_frames": 100, "length": 1000}
    out = AudioDecode(fixed_length=128)(res)
    assert out["audios"].shape == (1, 128)
    assert out["audios"][0, 0] == 10.0  # round((0+1)/100*1000)
    # window is samples 10..100 = 90 samples -> zero-padded from 90 on
    assert out["audios"][0, 89] == 99.0
    assert out["audios"][0, 90] == 0.0


def test_audio_feature_selector_and_format():
    res = {"audios": rng.standard_normal((640, 80)).astype(np.float32),
           "frame_inds": np.arange(32), "num_clips": 1,
           "total_frames": 64, "length": 640}
    out = AudioFeatureSelector(fixed_length=128)(res)
    assert out["audios"].shape == (1, 128, 80)
    out = FormatAudioShape("NCTF")(out)
    assert out["audios"].shape == (1, 1, 128, 80)
    assert out["input_shape"] == (1, 1, 128, 80)


def test_audio_amplify():
    out = AudioAmplify(2.0)({"audios": np.ones(4, np.float32)})
    assert (out["audios"] == 2.0).all() and out["amplify_ratio"] == 2.0


def test_load_audio_feature_dummy():
    out = LoadAudioFeature()({"audio_path": "/does/not/exist.npy"})
    assert out["audios"].shape == (640, 80) and out["length"] == 640


def test_mel_spectrogram_tone_energy():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    res = {"audios": tone[None, :], "sample_rate": sr, "num_clips": 1}
    out = MelSpectrogram(window_size=32, step_size=16, n_mels=80,
                         fixed_length=128)(res)
    mel = out["audios"]
    assert mel.shape == (1, 128, 80)
    # a 1 kHz tone at sr 16k concentrates well below the top mel bins
    band = np.argmax(mel[0].mean(axis=0))
    assert 10 <= band <= 60
    assert np.isfinite(mel).all()


# ---------------------------------------------------------------- pose


def test_uniform_sample_frames_train_long():
    op = UniformSampleFrames(clip_len=8, seed=0)
    out = op({"total_frames": 64, "start_index": 0})
    inds = out["frame_inds"]
    assert inds.shape == (8,)
    # one frame per segment of 8
    assert all(8 * i <= v < 8 * (i + 1) for i, v in enumerate(inds))


def test_uniform_sample_frames_test_deterministic():
    op = UniformSampleFrames(clip_len=8, num_clips=2, test_mode=True)
    a = op({"total_frames": 30, "start_index": 0})["frame_inds"]
    b = UniformSampleFrames(clip_len=8, num_clips=2, test_mode=True)(
        {"total_frames": 30, "start_index": 0})["frame_inds"]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16,)
    assert (a < 30).all()


def test_padding_with_loop():
    out = PaddingWithLoop(clip_len=10)({"total_frames": 4})
    np.testing.assert_array_equal(out["frame_inds"],
                                  np.arange(10) % 4)


def test_pose_decode_gathers():
    kp = rng.standard_normal((2, 16, 17, 2)).astype(np.float32)
    score = rng.random((2, 16, 17)).astype(np.float32)
    res = {"keypoint": kp, "keypoint_score": score,
           "frame_inds": np.array([3, 5, 7]), "total_frames": 16}
    out = PoseDecode()(res)
    np.testing.assert_allclose(out["keypoint"], kp[:, [3, 5, 7]])
    np.testing.assert_allclose(out["keypoint_score"], score[:, [3, 5, 7]])


def test_load_kinetics_pose_dense_packing(tmp_path):
    # 3 detections: two on frame 0, one on frame 5 -> squeeze to 2 frames
    kps = np.zeros((3, 17, 3), np.float32)
    kps[:, :, 0] = 0.5  # x (normalized for openpose source)
    kps[:, :, 1] = 0.5
    kps[:, :, 2] = 0.9
    path = tmp_path / "pose.pkl"
    with open(path, "wb") as f:
        pickle.dump(kps, f)
    res = {"filename": str(path), "total_frames": 10,
           "img_shape": (100, 200),
           "frame_inds": np.array([0, 0, 5])}
    out = LoadKineticsPose(source="openpose-18", max_person=100)(res)
    assert out["total_frames"] == 2          # squeezed
    assert out["num_person"] == 2            # two people on frame 0
    assert out["keypoint"].shape == (2, 2, 17, 2)
    # x scaled by width, y by height
    assert out["keypoint"][0, 0, 0, 0] == pytest.approx(100.0)
    assert out["keypoint"][0, 0, 0, 1] == pytest.approx(50.0)
    # frame 1 (was 5) has a single person; slot 1 stays zero
    assert (np.asarray(out["keypoint"][1, 1]) == 0).all()


def test_pose_normalize_roundtrip():
    kp = np.full((3, 2, 17, 1), 960.0, np.float32)  # C T V M layout source
    out = PoseNormalize()({"keypoint": kp.copy()})
    assert out["keypoint"][0].max() == pytest.approx(0.0)  # (960-960)/1920


def test_pose_compact_shrinks():
    kp = np.zeros((1, 2, 3, 2), np.float32)
    kp[0, :, :, 0] = [[40, 50, 60]] * 2
    kp[0, :, :, 1] = [[40, 50, 60]] * 2
    res = {"img_shape": (100, 100), "keypoint": kp}
    out = PoseCompact(padding=0.25)(res)
    h, w = out["img_shape"]
    assert h < 100 and w < 100
    # keypoints translated into the new box
    assert out["keypoint"][..., 0].max() <= w
    assert "crop_quadruple" in out


def test_joint_to_bone_coco():
    kp = rng.standard_normal((1, 4, 17, 2)).astype(np.float32)
    out = JointToBone(dataset="coco")({"keypoint": kp.copy()})
    bone = out["keypoint"]
    # root bone (0,0) is zero; bone[3] = kp[3] - kp[1]
    assert (bone[..., 0, :] == 0).all()
    np.testing.assert_allclose(bone[..., 3, :], kp[..., 3, :] - kp[..., 1, :])


def test_format_gcn_input_pads_person():
    kp = rng.standard_normal((1, 4, 17, 2)).astype(np.float32)
    score = rng.random((1, 4, 17)).astype(np.float32)
    out = FormatGCNInput(num_person=2)(
        {"keypoint": kp, "keypoint_score": score})
    assert out["keypoint"].shape == (3, 4, 17, 2)  # C T V M
    assert (out["keypoint"][..., 1] == 0).all()    # padded person


def test_generate_pose_target_kp_peak():
    kp = np.array([[[[8.0, 12.0]]]], np.float32)      # (M=1,T=1,V=1,2)
    score = np.ones((1, 1, 1), np.float32) * 0.7
    res = {"keypoint": kp, "keypoint_score": score, "img_shape": (24, 24)}
    out = GeneratePoseTarget(sigma=1.0)(res)
    hm = out["imgs"]
    assert hm.shape == (1, 24, 24, 1)
    assert hm[0, 12, 8, 0] == pytest.approx(0.7, abs=1e-5)
    assert hm[0].max() == pytest.approx(0.7, abs=1e-5)


def test_generate_pose_target_limb():
    kp = np.array([[[[4.0, 10.0], [16.0, 10.0]]]], np.float32)
    res = {"keypoint": kp, "img_shape": (20, 20)}
    out = GeneratePoseTarget(with_kp=False, with_limb=True,
                             skeletons=((0, 1),), sigma=1.0)(res)
    hm = out["imgs"][0, :, :, 0]
    # the segment between the joints is hot, far corners are cold
    assert hm[10, 10] == pytest.approx(1.0, abs=1e-5)
    assert hm[0, 0] < 1e-4


def test_generate_pose_target_double():
    kp = np.array([[[[5.0, 5.0]] * 17]], np.float32)  # (1,1,17,2)
    res = {"keypoint": kp, "img_shape": (16, 16)}
    out = GeneratePoseTarget(sigma=1.0, double=True)(res)
    assert out["imgs"].shape == (2, 16, 16, 17)


# ------------------------------------------------------- geometric / misc


def test_random_crop_translates_boxes():
    imgs = [np.ones((40, 60, 3), np.float32)] * 2
    res = {"imgs": imgs, "img_shape": (40, 60),
           "gt_bboxes": np.array([[10.0, 10.0, 30.0, 30.0]]),
           "proposals": np.array([[5.0, 5.0, 20.0, 20.0]])}
    out = RandomCrop(size=32, seed=0)(res)
    assert out["imgs"][0].shape == (32, 32, 3)
    x0, y0 = out["crop_bbox"][:2]
    assert (out["gt_bboxes"] >= 0).all()
    assert (out["gt_bboxes"][:, 0::2] <= 31).all()
    np.testing.assert_allclose(
        out["gt_bboxes"][0, 0], np.clip(10 - x0, 0, 31))
    assert out["img_shape"] == (32, 32)


def test_random_rescale_range():
    imgs = [rng.random((48, 64, 3)).astype(np.float32)]
    out = RandomRescale((56, 60), seed=1)({"imgs": imgs,
                                           "img_shape": (48, 64)})
    assert 56 <= out["short_edge"] <= 60
    assert out["img_shape"][0] == out["short_edge"]  # short side was h


def test_build_pseudo_clip():
    out = BuildPseudoClip(clip_len=4)(
        {"imgs": [np.zeros((8, 8, 3), np.float32)]})
    assert len(out["imgs"]) == 4 and out["clip_len"] == 4


def test_sample_ava_frames_centered():
    res = {"fps": 30, "timestamp": 902, "timestamp_start": 900,
           "shot_info": (0, 3000)}
    out = SampleAVAFrames(clip_len=8, frame_interval=2, test_mode=True)(res)
    inds = out["frame_inds"]
    assert inds.shape == (8,)
    center = 30 * 2 + 1
    assert inds[0] == center - 8 and inds[-1] == center + 6
    assert out["num_clips"] == 1


# ------------------------------------------------------- localization


def test_load_localization_feature(tmp_path):
    feat = rng.standard_normal((10, 4)).astype(np.float32)
    path = tmp_path / "v_x.csv"
    np.savetxt(path, feat, delimiter=",", header="f0,f1,f2,f3")
    out = LoadLocalizationFeature()(
        {"video_name": "v_x", "data_prefix": str(tmp_path)})
    assert out["raw_feature"].shape == (4, 10)
    np.testing.assert_allclose(out["raw_feature"], feat.T, rtol=1e-5)


def test_generate_localization_labels():
    res = {"duration_frame": 100, "duration_second": 10.0,
           "feature_frame": 80,
           "annotations": [{"segment": [2.0, 4.0]},
                           {"segment": [-1.0, 99.0]}]}
    out = GenerateLocalizationLabels()(res)
    np.testing.assert_allclose(out["gt_bbox"][0], [0.25, 0.5])
    np.testing.assert_allclose(out["gt_bbox"][1], [0.0, 1.0])


def test_load_proposals(tmp_path):
    props = np.zeros((5, 6), np.float32)
    props[:, 0] = np.arange(5) * 0.1        # tmin
    props[:, 1] = np.arange(5) * 0.1 + 0.2  # tmax
    props[:, 2] = 0.9                       # tmin_score
    props[:, 3] = 0.8                       # tmax_score
    props[:, 5] = 0.5                       # reference tIoU
    pdir, fdir = tmp_path / "p", tmp_path / "f"
    pdir.mkdir(), fdir.mkdir()
    np.savetxt(pdir / "v.csv", props, delimiter=",",
               header="tmin,tmax,tmin_score,tmax_score,score,match_iou")
    np.save(fdir / "v.npy", rng.standard_normal((5, 32)).astype(np.float32))
    out = LoadProposals(top_k=3, pgm_proposals_dir=str(pdir),
                        pgm_features_dir=str(fdir))({"video_name": "v"})
    assert out["bsp_feature"].shape == (3, 32)
    assert out["tmin"].shape == (3,)
    np.testing.assert_allclose(out["reference_temporal_iou"], [0.5] * 3)


def test_sample_proposal_frames_train_and_test():
    op = SampleProposalFrames(clip_len=1, body_segments=5,
                              aug_segments=(2, 2), aug_ratio=0.5,
                              mode="train", seed=0)
    res = {"total_frames": 100, "start_index": 0,
           "out_proposals": [((0, type("P", (), {"start_frame": 20,
                                                 "end_frame": 60})()),)]}
    out = op(res)
    assert out["frame_inds"].shape == (9,)      # (2+5+2) segments x 1 frame
    assert out["num_clips"] == 9
    assert out["num_proposals"] == 1
    assert (out["frame_inds"] < 100).all()

    test_op = SampleProposalFrames(clip_len=1, body_segments=5,
                                   aug_segments=(2, 2), aug_ratio=0.5,
                                   test_interval=10, mode="test")
    out = test_op({"total_frames": 100, "start_index": 0})
    np.testing.assert_array_equal(out["frame_inds"], np.arange(0, 99, 10))


def test_build_pipeline_resolves_extra_ops():
    pipe = build_pipeline([
        dict(type="PaddingWithLoop", clip_len=6),
        dict(type="PoseDecode"),
        dict(type="FormatGCNInput", input_format="NCTVM", num_person=2),
    ])
    kp = rng.standard_normal((1, 12, 17, 2)).astype(np.float32)
    out = pipe({"total_frames": 12, "keypoint": kp})
    assert out["keypoint"].shape == (2, 6, 17, 2)


# ------------------------------------------------- decode/formatting tail


def test_image_decode_and_pseudo_clip(tmp_path):
    import cv2
    from cross_modal_video_engine_tpu.data.pipelines_extra import ImageDecode
    img = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
    path = str(tmp_path / "i.png")
    cv2.imwrite(path, img[..., ::-1])  # write BGR so RGB read matches
    out = ImageDecode()({"filename": path})
    assert out["total_frames"] == 1
    np.testing.assert_array_equal(out["imgs"][0], img)
    out = BuildPseudoClip(clip_len=3)(out)
    assert len(out["imgs"]) == 3


def test_array_decode_rgb_and_flow():
    from cross_modal_video_engine_tpu.data.pipelines_extra import ArrayDecode
    arr = rng.standard_normal((6, 4, 4, 2)).astype(np.float32)
    out = ArrayDecode()({"array": arr, "frame_inds": np.array([1, 3]),
                         "modality": "Flow"})
    assert len(out["imgs"]) == 4  # 2 frames x 2 flow channels
    np.testing.assert_allclose(out["imgs"][0], arr[1, ..., 0])


def test_rename_transpose_collect():
    from cross_modal_video_engine_tpu.data.pipelines import build_pipeline
    pipe = build_pipeline([
        dict(type="Rename", mapping={"x": "imgs"}),
        dict(type="Transpose", keys=["imgs"], order=(2, 0, 1)),
        dict(type="Collect", keys=["imgs"], meta_keys=["name"]),
    ])
    out = pipe({"x": np.zeros((4, 5, 3)), "name": "v1", "junk": 1})
    assert out["imgs"].shape == (3, 4, 5)
    assert out["img_metas"] == {"name": "v1"}
    assert "junk" not in out
