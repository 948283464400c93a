"""Space-to-depth stem (ops/s2d_stem.py) vs the plain 7x7 stride-2
conv: exact math, identical param tree, same SlowFast outputs and
gradients on the SAME params."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from cross_modal_video_engine_tpu.ops.s2d_stem import (s2d_kernel,
                                                       s2d_kernel_2d,
                                                       s2d_stem_conv,
                                                       s2d_stem_conv_2d)
from cross_modal_video_engine_tpu.models.resnet3d import (
    ResNet3D, ResNet3DConfig, SlowFast, SlowFastConfig)
from cross_modal_video_engine_tpu.models.yolo import YoloConfig, YoloV5


@pytest.mark.parametrize("kt,stride_t,cin,cout,hw", [
    (5, 1, 3, 8, 32),      # SlowFast fast-pathway stem shape family
    (1, 1, 3, 64, 28),     # SlowOnly-style stem
    (5, 2, 3, 8, 24),      # temporal stride too
])
def test_s2d_conv_matches_plain_conv(kt, stride_t, cin, cout, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kt, 7, 7, cin, cout)) * 0.1,
                    jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride_t, 2, 2),
        padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d_stem_conv(x, w, stride_t=stride_t)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s2d_kernel_shape_and_quadrants():
    w = jnp.arange(5 * 7 * 7 * 3 * 8, dtype=jnp.float32).reshape(
        5, 7, 7, 3, 8)
    w9 = s2d_kernel(w)
    assert w9.shape == (5, 9, 9, 3, 32)
    # quadrant (dy, dx) lives at channel block 2*dy+dx, shifted by
    # (2*dy, 2*dx)
    np.testing.assert_array_equal(np.asarray(w9[:, 0:7, 0:7, :, 0:8]),
                                  np.asarray(w))
    np.testing.assert_array_equal(np.asarray(w9[:, 2:9, 2:9, :, 24:32]),
                                  np.asarray(w))
    assert np.all(np.asarray(w9[:, 7:9, :, :, 0:8]) == 0)


def test_s2d_gradient_matches():
    """The train step differentiates through the retiled conv — the
    weight gradient must match the plain conv's."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 7, 7, 3, 8)) * 0.1,
                    jnp.float32)

    def plain(w):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 2, 2),
            padding=((2, 2), (3, 3), (3, 3)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(jnp.sin(y))

    def s2d(w):
        return jnp.sum(jnp.sin(s2d_stem_conv(x, w)))

    # conv-reassociation noise: abs err ~4e-5 on a gradient of scale ~37
    np.testing.assert_allclose(np.asarray(jax.grad(s2d)(w)),
                               np.asarray(jax.grad(plain)(w)),
                               rtol=1e-4, atol=5e-4)


def test_resnet3d_s2d_param_tree_and_parity():
    cfg = ResNet3DConfig(stage_blocks=(1, 1, 1, 1), base_channels=32,
                         conv1_kernel_t=5, channel_ratio=8,
                         stage_temporal_kernels=(3, 3, 3, 3))
    cfg_s2d = dataclasses.replace(cfg, s2d_stem=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 8, 32, 32, 3)), jnp.float32)
    v = ResNet3D(cfg).init(jax.random.key(0), x)
    v2 = ResNet3D(cfg_s2d).init(jax.random.key(0), x)
    assert jax.tree.structure(v2) == jax.tree.structure(v)
    for a, b in zip(jax.tree.leaves(v2), jax.tree.leaves(v)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    want = ResNet3D(cfg).apply(v, x)
    got = ResNet3D(cfg_s2d).apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,hw", [
    (3, 32, 64),     # yolov5s stem shape family (640-side scaled down)
    (3, 16, 32),     # yolov5n width
])
def test_s2d_conv_2d_matches_plain_conv(cin, cout, hw):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 6, cin, cout)) * 0.1,
                    jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_stem_conv_2d(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s2d_kernel_2d_shape_and_quadrants():
    w = jnp.arange(6 * 6 * 3 * 8, dtype=jnp.float32).reshape(6, 6, 3, 8)
    w8 = s2d_kernel_2d(w)
    assert w8.shape == (8, 8, 3, 32)
    np.testing.assert_array_equal(np.asarray(w8[0:6, 0:6, :, 0:8]),
                                  np.asarray(w))
    np.testing.assert_array_equal(np.asarray(w8[2:8, 2:8, :, 24:32]),
                                  np.asarray(w))
    assert np.all(np.asarray(w8[6:8, :, :, 0:8]) == 0)


def test_s2d_2d_gradient_matches():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 6, 3, 16)) * 0.1, jnp.float32)

    def plain(w):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(y))

    def s2d(w):
        return jnp.sum(jnp.sin(s2d_stem_conv_2d(x, w)))

    np.testing.assert_allclose(np.asarray(jax.grad(s2d)(w)),
                               np.asarray(jax.grad(plain)(w)),
                               rtol=1e-4, atol=5e-4)


def test_yolo_s2d_param_tree_and_parity():
    cfg = YoloConfig(num_classes=4, img_size=64)
    cfg_s2d = dataclasses.replace(cfg, s2d_stem=True)
    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 64, 64, 3)) * 0.2 + 0.5, jnp.float32)
    v = YoloV5(cfg).init(jax.random.key(0), x)
    v2 = YoloV5(cfg_s2d).init(jax.random.key(0), x)
    assert jax.tree.structure(v2) == jax.tree.structure(v)
    for a, b in zip(jax.tree.leaves(v2), jax.tree.leaves(v)):
        assert a.shape == b.shape
    want = YoloV5(cfg).apply(v, x)
    got = YoloV5(cfg_s2d).apply(v, x)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-4, atol=1e-5)


def test_slowfast_fast_s2d_parity():
    cfg = SlowFastConfig(depth_blocks=(1, 1, 1, 1), base_channels=32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 8, 32, 32, 3)), jnp.float32)
    v = SlowFast(cfg).init(jax.random.key(0), x)
    want = SlowFast(cfg).apply(v, x)
    got = SlowFast(dataclasses.replace(cfg, fast_s2d_stem=True)).apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
