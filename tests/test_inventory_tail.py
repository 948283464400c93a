"""Inventory-tail models: CSN, TPN neck, TRN head, AVA RoI head,
VideoCLIP — shape/behavior/gradient tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from cross_modal_video_engine_tpu.models import (
    AVAHeadConfig, AVARoIHead, ava_bbox_loss, roi_align,
    CSN, CSNConfig, TPN, TPNConfig, TRNHead,
    VideoCLIP, VideoCLIPConfig)

rng = np.random.default_rng(271)


@pytest.mark.full    # full lane: shape probe; the CSN importer parity test stays default
def test_csn_shapes_and_modes():
    videos = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    for mode in ("ir", "ip"):
        cfg = CSNConfig(stage_blocks=(1, 1), base_channels=8, mode=mode)
        model = CSN(cfg)
        variables = model.init(jax.random.key(0), videos)
        out = model.apply(variables, videos)
        assert out.shape == (2, 8 * 2 * 4)
        assert np.isfinite(np.asarray(out)).all()
        # depthwise conv2 kernel: in-feature dim 1 (channel separated)
        k = variables["params"]["layer1_0"]["conv2_depth"]["kernel"]
        assert k.shape == (3, 3, 3, 1, 8)
    # ip mode has the extra pointwise conv
    cfg = CSNConfig(stage_blocks=(1,), base_channels=8, mode="ip")
    variables = CSN(cfg).init(jax.random.key(0), videos)
    assert "conv2_point" in variables["params"]["layer1_0"]


@pytest.mark.full    # full lane: shape probe; the TPN recipe train e2e stays default
def test_tpn_neck_shapes_and_aux_loss():
    cfg = TPNConfig(in_channels=(16, 32), out_channels=16, mid_channels=16,
                    lf_out_channels=32, fusion_channels=32,
                    downsample_scales=(2, 2), groups=4,
                    aux_num_classes=5)
    tpn = TPN(cfg)
    stages = [
        jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 8, 4, 4, 32)), jnp.float32),
    ]
    target = jnp.asarray([1, 3], jnp.int32)
    variables = tpn.init(jax.random.key(0), stages, target=target)
    (feat, aux), _ = tpn.apply(variables, stages, target=target, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.key(1)})
    assert feat.shape == (2, 4, 4, 4, 32)      # T/2 pooled, coarsest spatial
    assert "loss_aux" in aux and float(aux["loss_aux"]) > 0
    # no target -> no aux loss
    feat2, aux2 = tpn.apply(variables, stages)
    assert aux2 == {} and feat2.shape == feat.shape
    # parallel flow runs too
    cfgp = TPNConfig(in_channels=(16, 32), out_channels=16, mid_channels=16,
                     lf_out_channels=32, fusion_channels=32,
                     downsample_scales=(2, 2), groups=4,
                     flow_type="parallel")
    tp = TPN(cfgp)
    v2 = tp.init(jax.random.key(0), stages)
    f, _ = tp.apply(v2, stages)
    assert f.shape == feat.shape


@pytest.mark.full    # full lane: shape probe; test_trn_recognizer trains the head default
def test_trn_head_shapes_and_scales():
    head = TRNHead(num_classes=7, num_segments=4, hidden_dim=16,
                   bottleneck_dim=8)
    x = jnp.asarray(rng.standard_normal((3, 4, 32)), jnp.float32)
    variables = head.init(jax.random.key(0), x)
    out = head.apply(variables, x)
    assert out.shape == (3, 7)
    # per-scale relation MLPs exist for scales 4..2
    for s in (4, 3, 2):
        assert f"fusion_s{s}_fc1" in variables["params"]
    # train-mode random tuple subsampling changes the output
    o1 = head.apply(variables, x, train=True,
                    rngs={"relation": jax.random.key(1),
                          "dropout": jax.random.key(2)})
    o2 = head.apply(variables, x, train=True,
                    rngs={"relation": jax.random.key(3),
                          "dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # single-scale TRN variant
    trn = TRNHead(num_classes=7, num_segments=4, hidden_dim=16,
                  relation_type="TRN")
    v = trn.init(jax.random.key(0), x)
    assert trn.apply(v, x).shape == (3, 7)


def test_roi_align_golden():
    # constant feature map -> every roi pools to the constant
    feat = jnp.full((8, 8, 2), 3.0)
    boxes = jnp.asarray([[1.0, 1.0, 5.0, 5.0], [0.0, 0.0, 8.0, 8.0]])
    out = roi_align(feat, boxes, out_size=4)
    assert out.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)

    # linear ramp in x: pooled value equals the bin's x-center
    xs = jnp.broadcast_to(jnp.arange(8, dtype=jnp.float32)[None, :, None],
                          (8, 8, 1))
    out = roi_align(xs, jnp.asarray([[2.0, 2.0, 6.0, 6.0]]), out_size=2,
                    sampling_ratio=2)
    # bins span x in [2,4] and [4,6]; samples at centers -> means 2.5, 4.5
    np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [2.5, 4.5],
                               rtol=1e-5)


@pytest.mark.full    # full lane: head-level train probe; the detection CLI e2e trains the same head default
def test_ava_roi_head_trains():
    cfg = AVAHeadConfig(num_classes=6, in_channels=8, roi_size=4)
    head = AVARoIHead(cfg)
    feats = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)), jnp.float32)
    rois = jnp.asarray([
        [0, 0.1, 0.1, 0.6, 0.6],
        [0, 0.4, 0.4, 0.9, 0.9],
        [1, 0.0, 0.0, 1.0, 1.0],
    ], jnp.float32)
    labels = np.zeros((3, 6), np.float32)
    labels[0, 2] = labels[1, 3] = labels[2, 1] = 1.0
    labels = jnp.asarray(labels)

    variables = head.init(jax.random.key(0), feats, rois)
    logits = head.apply(variables, feats, rois)
    assert logits.shape == (3, 6)

    tx = optax.adam(1e-2)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            lg = head.apply({"params": p}, feats, rois)
            return ava_bbox_loss(lg, labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::8]


@pytest.mark.full    # full lane: full-width contract probe; tiny-shape VideoCLIP forward runs default in test_shipped_configs
def test_videoclip_contract():
    cfg = VideoCLIPConfig(fps=2, s3d_channels=4, width=16, layers=1,
                          heads=2, vocab_size=50, max_text_len=8,
                          max_video_len=8)
    model = VideoCLIP(cfg)
    videos = jnp.asarray(rng.standard_normal((2, 6, 16, 16, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 50, (2, 8)), jnp.int32)
    variables = model.init(jax.random.key(0), videos, ids)
    li, lt = model.apply(variables, videos, ids)
    assert li.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)
    # backbone contract: forward == pooled video embedding
    pooled = model.apply(variables, videos, method="forward")
    assert pooled.shape == (2, 16)
    # text pooling ignores padding
    ids_pad = ids.at[:, 4:].set(0)
    t1 = model.apply(variables, ids_pad, method="encode_text")
    t2 = model.apply(variables, ids_pad[:, :4], method="encode_text")
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-4)
