"""LFB / FBO / ACRN heads (models/lfb.py) + detection integration:
bank build/sample/save-load semantics, FBO fusion shapes, ACRN
relation head, and tiny e2e train steps through cli/detection_train
for both the LFB and ACRN recipes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.lfb import (
    ACRNHead, ACRNHeadConfig, FBOHead, FBOHeadConfig, FBONonLocal,
    LFBBuilder, LongTermFeatureBank)

rng = np.random.default_rng(3)


def _bank(C=6, capacity=2):
    b = LFBBuilder(C, capacity=capacity)
    b.add("v1", 900, np.ones((1, C)))
    b.add("v1", 901, 2 * np.ones((3, C)))     # > capacity: sampled to 2
    b.add("v1", 905, 3 * np.ones((2, C)))
    b.add("v2", 900, 4 * np.ones((1, C)))
    return b.build(seed=0)


def test_lfb_window_layout():
    bank = _bank()
    # window of 4 centered at 901 -> start 899: seconds 899..902
    lt = np.asarray(bank.sample_window(bank.video_index["v1"], 901,
                                       window_size=4))
    assert lt.shape == (4 * bank.capacity, bank.channels)
    # 899 missing -> zeros; 900 has one row (slot 2 zero-padded);
    # 901 sampled down to capacity rows of 2s; 902 missing
    np.testing.assert_allclose(lt[0:2], 0.0)
    np.testing.assert_allclose(lt[2], 1.0)
    np.testing.assert_allclose(lt[3], 0.0)
    np.testing.assert_allclose(lt[4:6], 2.0)
    np.testing.assert_allclose(lt[6:8], 0.0)


def test_lfb_out_of_range_and_other_video():
    bank = _bank()
    lt = np.asarray(bank.sample_window(bank.video_index["v2"], 900,
                                       window_size=2))
    np.testing.assert_allclose(lt[2], 4.0)     # second 900 at offset 1
    # windows never leak across videos: v2 has nothing at 905
    lt905 = np.asarray(bank.sample_window(bank.video_index["v2"], 905,
                                          window_size=2))
    np.testing.assert_allclose(lt905, 0.0)


def test_lfb_save_load_roundtrip(tmp_path):
    bank = _bank()
    p = str(tmp_path / "lfb.npz")
    bank.save(p)
    loaded = LongTermFeatureBank.load(p)
    assert loaded.video_index == bank.video_index
    np.testing.assert_allclose(
        np.asarray(loaded.sample_window(0, 901, 4)),
        np.asarray(bank.sample_window(0, 901, 4)))


def test_lfb_sample_batch_vmaps():
    bank = _bank()
    lt = np.asarray(bank.sample_batch(np.array([0, 1]),
                                      np.array([901, 900]), 4))
    assert lt.shape == (2, 8, 6)
    np.testing.assert_allclose(
        lt[0], np.asarray(bank.sample_window(0, 901, 4)))


@pytest.mark.full    # full lane: shapes/grad probe; the LFB recipe e2e trains the same FBO default
def test_fbo_nonlocal_shapes_and_grad():
    m = FBONonLocal(latent_channels=8, num_non_local_layers=2)
    st = jnp.asarray(rng.normal(size=(3, 1, 16)), jnp.float32)
    lt = jnp.asarray(rng.normal(size=(3, 10, 16)), jnp.float32)
    vs = m.init(jax.random.key(0), st, lt)
    out = m.apply(vs, st, lt)
    assert out.shape == (3, 1, 8)
    g = jax.grad(lambda p: (m.apply({"params": p}, st, lt) ** 2).sum())(
        vs["params"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


@pytest.mark.parametrize("fbo_type,out_c", [("non_local", 16 + 8),
                                            ("avg", 16 + 16),
                                            ("max", 16 + 16)])
def test_fbo_head_concat_channels(fbo_type, out_c):
    cfg = FBOHeadConfig(fbo_type=fbo_type, latent_channels=8)
    m = FBOHead(cfg)
    roi = jnp.asarray(rng.normal(size=(4, 1, 2, 2, 16)), jnp.float32)
    lt = jnp.asarray(rng.normal(size=(4, 10, 16)), jnp.float32)
    vs = m.init(jax.random.key(0), roi, lt)
    out = m.apply(vs, roi, lt)
    assert out.shape == (4, 1, 1, 1, out_c)


def test_fbo_avg_max_match_pool_semantics():
    roi = jnp.zeros((2, 1, 1, 1, 4))
    lt = jnp.asarray(np.stack([np.arange(12).reshape(3, 4),
                               -np.arange(12).reshape(3, 4)]), jnp.float32)
    out_avg = FBOHead(FBOHeadConfig(fbo_type="avg")).apply(
        {"params": {}}, roi, lt)
    np.testing.assert_allclose(np.asarray(out_avg)[0, 0, 0, 0, 4:],
                               lt[0].mean(0))
    out_max = FBOHead(FBOHeadConfig(fbo_type="max")).apply(
        {"params": {}}, roi, lt)
    np.testing.assert_allclose(np.asarray(out_max)[1, 0, 0, 0, 4:],
                               np.asarray(lt[1]).max(0))


def test_acrn_head_shapes_and_context_gather():
    cfg = ACRNHeadConfig(out_channels=8)
    m = ACRNHead(cfg)
    roi = jnp.asarray(rng.normal(size=(3, 1, 2, 2, 6)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(2, 1, 4, 4, 6)), jnp.float32)
    rois = jnp.asarray([[0, 0, 0, 1, 1], [1, 0, 0, 1, 1],
                        [1, 0, 0, 0.5, 0.5]], jnp.float32)
    vs = m.init(jax.random.key(0), roi, feat, rois)
    out = m.apply(vs, roi, feat, rois,
                  mutable=["batch_stats"])[0]
    assert out.shape == (3, 1, 4, 4, 8)
    assert np.isfinite(np.asarray(out)).all()


def _detection_cfg(tmp_path, extra_model):
    from cross_modal_video_engine_tpu.io.video_decode import write_test_video
    vdir = tmp_path / "videos"
    vdir.mkdir()
    rows = []
    for i in range(2):
        action = 1 + (i % 2)
        frames = np.full((12, 32, 32, 3), 128, np.uint8)
        frames[:, 2:14, 2:14] = 230 if action == 1 else 20
        write_test_video(str(vdir / f"v{i}.mp4"), frames, fps=10)
        rows.append(f"v{i}.mp4,0.6,0.0625,0.0625,0.4375,0.4375,{action},0")
    ann = tmp_path / "ann.csv"
    ann.write_text("\n".join(rows))
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(
    backbone=dict(type='SlowOnly', stage_blocks=[1, 1, 1, 1],
                  base_channels=8, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3],
                  stage_spatial_strides=[1, 2, 2, 1]),
    roi_head=dict(num_classes=4, roi_size=2, sampling_ratio=1,
                  dropout=0.0),
    train_cfg=dict(pos_iou_thr=0.9, max_boxes=2),
    test_cfg=dict(action_thr=0.002),
    {extra_model})
data = dict(
    train=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    val=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    fps=10, timestamp_start=0,
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleAVAFrames', clip_len=2, frame_interval=2,
             test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=2)
optimizer = dict(optimizer='adamw', learning_rate=2e-3, grad_clip=1.0)
total_epochs = 2
eval_interval = 2
""")
    return str(cfg)


def test_lfb_recipe_trains_e2e(tmp_path):
    from cross_modal_video_engine_tpu.cli import detection_train
    lfb_path = str(tmp_path / "lfb.npz")
    cfg = _detection_cfg(
        tmp_path,
        "shared_head=dict(type='FBO', fbo_type='non_local', "
        "latent_channels=8, num_non_local_layers=1), "
        f"lfb=dict(path=r'{lfb_path}', window_size=4, capacity=2)")
    history = detection_train.main([cfg, "--work_dir",
                                    str(tmp_path / "w")])
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
    assert "mAP@0.5IOU" in history[-1]
    import os
    assert os.path.exists(lfb_path)     # bank was built and saved


@pytest.mark.full    # full lane: the LFB recipe e2e is the default shared-head train sentinel; ACRN head math stays default in test_acrn_head_shapes_and_context_gather
def test_acrn_recipe_trains_e2e(tmp_path):
    from cross_modal_video_engine_tpu.cli import detection_train
    cfg = _detection_cfg(
        tmp_path, "shared_head=dict(type='ACRN', out_channels=8)")
    history = detection_train.main([cfg, "--work_dir",
                                    str(tmp_path / "w")])
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
    assert "mAP@0.5IOU" in history[-1]
