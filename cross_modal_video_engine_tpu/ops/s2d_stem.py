"""Space-to-depth stem conv: exact-math retiling of the thin-channel
7x7 stride-2 stem for the MXU.

docs/PERF.md's conv roofline attributes the single largest loss in the
SlowFast train step to the fast-pathway stem: a (kt, 7, 7) conv with
cout=8 tiles the MXU's 128-wide N dimension at 6% utilization and costs
~30% of the step's whole tiled-compute bound.  The classic fix (MLPerf
ResNet stems) is space-to-depth; here it is applied on the OUTPUT side,
which is what actually widens N:

    y[b,t,2Y+dy,2X+dx,c] = conv7x7_s2(x, w)[b,t,2Y+dy,2X+dx,c]
                         = conv9x9_s4(x, w9)[b,t,Y,X,(2dy+dx)*cout+c]

with w9[kt,ky,kx,i,(2dy+dx)*cout+c] = w[kt,ky-2dy,kx-2dx,i,c] (zero
outside).  The 2x2 output block's four receptive fields span 9x9 input
rows, so the stride-4 kernel is the stride-2 kernel shifted into the
four quadrant offsets — the SAME weights, so the math (and the
gradient, via autodiff through pad/concat) is bit-exact up to conv
reassociation.  Tile arithmetic at cout=8: old GEMM pads K 735->768 and
N 8->128 (6% useful); new pads K 1215->1280 and N 32->128 — 2.4x fewer
padded MACs for identical outputs.

Behind `ResNet3DConfig.s2d_stem` / `SlowFastConfig.fast_s2d_stem`
(param tree unchanged — importers unaffected); parity pinned by
tests/test_s2d_stem.py; flip the default only on a measured on-chip win
(the step may be HBM-bound, in which case this moves nothing — see the
PERF.md bracketing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(kt, 7, 7, cin, cout) stride-2 kernel -> the equivalent
    (kt, 9, 9, cin, 4*cout) stride-4 kernel (quadrant order row-major:
    (dy, dx) = (0,0),(0,1),(1,0),(1,1))."""
    assert w.shape[1] == 7 and w.shape[2] == 7, w.shape
    parts = [
        jnp.pad(w, ((0, 0), (2 * dy, 2 - 2 * dy), (2 * dx, 2 - 2 * dx),
                    (0, 0), (0, 0)))
        for dy in (0, 1) for dx in (0, 1)
    ]
    return jnp.concatenate(parts, axis=-1)


def s2d_kernel_2d(w: jnp.ndarray) -> jnp.ndarray:
    """(6, 6, cin, cout) stride-2 pad-2 kernel (the yolov5 stem,
    reference MCT/yolov5/models/common.py Conv(k=6, s=2, p=2)) -> the
    equivalent (8, 8, cin, 4*cout) stride-4 kernel (quadrant order
    row-major like :func:`s2d_kernel`)."""
    assert w.shape[0] == 6 and w.shape[1] == 6, w.shape
    parts = [
        jnp.pad(w, ((2 * dy, 2 - 2 * dy), (2 * dx, 2 - 2 * dx),
                    (0, 0), (0, 0)))
        for dy in (0, 1) for dx in (0, 1)
    ]
    return jnp.concatenate(parts, axis=-1)


def s2d_stem_conv_2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exactly nn.Conv(cout, (6, 6), strides=(2, 2),
    padding=((2, 2), (2, 2)), use_bias=False) — as one stride-4 8x8
    conv with 4x the output channels + depth-to-space.

    Same tile arithmetic as the 3D stem, for the YOLOv5s stem shape
    (cin=3, cout=32): the plain GEMM pads K 108->128 and N 32->128
    (21% useful); the retiled GEMM pads K 192->256 and N 128->128 —
    2.1x fewer padded MACs for identical outputs.

    x: (B, H, W, cin) with H, W multiples of 4 (the 640/224 production
    shapes; asserted).  w: the UNTRANSFORMED (6, 6, cin, cout) stem
    kernel — the same param the plain path trains."""
    cout = w.shape[-1]
    B, H, W, _ = x.shape
    assert H % 4 == 0 and W % 4 == 0, (H, W)
    dt = jnp.promote_types(x.dtype, w.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), s2d_kernel_2d(w).astype(dt),
        window_strides=(4, 4),
        # out col X covers input 4X-2 .. 4X+5, so (2, 2) pads exactly
        padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Ho, Wo = y.shape[1], y.shape[2]
    y = y.reshape(B, Ho, Wo, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, Ho * 2, Wo * 2, cout)


def s2d_stem_conv(x: jnp.ndarray, w: jnp.ndarray, *,
                  stride_t: int = 1) -> jnp.ndarray:
    """Exactly nn.Conv(cout, (kt,7,7), strides=(stride_t,2,2),
    padding=((kt//2,)*2, (3,3), (3,3)), use_bias=False) — as one
    stride-4 9x9 conv with 4x the output channels + depth-to-space.

    x: (B, T, H, W, cin) with H, W multiples of 4 (the 224/256-side
    production shapes; asserted).  w: the UNTRANSFORMED (kt,7,7,cin,
    cout) stem kernel — the same param the plain path trains."""
    kt = w.shape[0]
    cout = w.shape[-1]
    B, T, H, W, _ = x.shape
    assert H % 4 == 0 and W % 4 == 0, (H, W)
    dt = jnp.promote_types(x.dtype, w.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), s2d_kernel(w).astype(dt),
        window_strides=(stride_t, 4, 4),
        # spatial (3, 2): out col X covers input 4X-3 .. 4X+5; the
        # plain conv's (3, 3) after-pad has one never-read column
        padding=((kt // 2, kt // 2), (3, 2), (3, 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    To, Ho, Wo = y.shape[1], y.shape[2], y.shape[3]
    y = y.reshape(B, To, Ho, Wo, 2, 2, cout)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(B, To, Ho * 2, Wo * 2, cout)
