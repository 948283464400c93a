"""Analytic roofline (utils/roofline.py): exact FLOP counting, MXU tile
efficiency and step-time bounds derived from jaxpr shapes alone."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cross_modal_video_engine_tpu.utils.roofline import (
    op_costs, speed_of_light, worst_offenders, _tile_util)


def test_tile_util_padding_model():
    # perfect tile: no padding loss
    assert _tile_util(8, 128, 128) == 1.0
    assert _tile_util(1024, 256, 512) == 1.0
    # an 8-channel conv output pads N 8 -> 128: 16x MAC waste
    assert abs(_tile_util(1024, 128, 8) - 8 / 128) < 1e-9
    # M pads to the sublane depth only
    assert abs(_tile_util(4, 128, 128) - 0.5) < 1e-9


def test_dot_flops_exact():
    a = jnp.zeros((64, 32), jnp.float32)
    b = jnp.zeros((32, 48), jnp.float32)
    costs = [c for c in op_costs(lambda x, y: x @ y, a, b)
             if c.kind == "dot"]
    assert len(costs) == 1
    assert costs[0].flops == 2 * 64 * 32 * 48
    # bytes: both operands + result
    assert costs[0].bytes == 4 * (64 * 32 + 32 * 48 + 64 * 48)


def test_conv_flops_and_util():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), padding="SAME", use_bias=False)(x)

    m = M()
    x = jnp.zeros((2, 16, 16, 4), jnp.float32)
    v = m.init(jax.random.key(0), x)
    convs = [c for c in op_costs(m.apply, v, x) if c.kind == "conv"]
    assert len(convs) == 1
    # out (2,16,16,8); K = 4*9 = 36
    assert convs[0].flops == 2 * (2 * 16 * 16 * 8) * 36
    # N=8 pads to 128, K=36 pads to 128, M=512 pads cleanly
    assert abs(convs[0].mxu_util - (512 * 36 * 8) /
               (512 * 128 * 128)) < 1e-9


def test_scan_multiplies_inner_costs():
    w = jnp.zeros((16, 16), jnp.float32)

    def step(h, _):
        return jnp.tanh(h @ w), ()

    def fn(h):
        out, _ = jax.lax.scan(step, h, None, length=5)
        return out

    dots = [c for c in op_costs(fn, jnp.zeros((4, 16)))
            if c.kind == "dot"]
    assert len(dots) == 1 and dots[0].mult == 5
    assert dots[0].flops == 5 * 2 * 4 * 16 * 16


def test_cond_costs_max_branch_not_sum():
    """lax.cond: only one branch executes, so the analyzer must charge
    the most expensive branch, not every branch (r4 review fix)."""
    w = jnp.zeros((64, 64), jnp.float32)

    def fn(p, x):
        return jax.lax.cond(p, lambda v: (v @ w) @ w, lambda v: v,
                            x).sum()

    dots = [c for c in op_costs(fn, True, jnp.zeros((8, 64)))
            if c.kind == "dot"]
    # heavy branch has exactly 2 GEMMs; a sum-over-branches walker
    # would also have counted the identity branch's zero and doubled
    # nothing here, but the flop total pins the heavy branch choice
    assert sum(c.flops for c in dots) == 2 * (2 * 8 * 64 * 64)


def test_grad_step_counts_backward_flops():
    w = jnp.zeros((32, 32), jnp.float32)

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    x = jnp.zeros((8, 32))
    fwd = sum(c.flops for c in op_costs(loss, w, x))
    both = sum(c.flops for c in op_costs(jax.grad(loss), w, x))
    # grad-of-w adds the dw GEMM (x is not differentiated): 2x fwd
    assert both >= 1.9 * fwd


def test_speed_of_light_bounds():
    a = jnp.zeros((256, 256), jnp.bfloat16)
    costs = op_costs(lambda x: jnp.maximum(x @ x, 0), a)
    sol = speed_of_light(costs, peak_tflops=197.0, hbm_gbps=819.0)
    assert sol["flops"] == 2 * 256 ** 3
    assert sol["t_compute_tiled_s"] >= sol["t_compute_ideal_s"]
    assert sol["t_mem_unfused_s"] >= sol["t_mem_fused_s"] > 0
    assert 0 < sol["mfu_ceiling"] <= 1.0
    rows = worst_offenders(costs, 197.0, 819.0, top=3)
    assert rows and rows[0][1] >= rows[-1][1]


def test_narrow_channel_ceiling_demonstrated():
    """The SlowFast-fast-pathway shape class: C=8 convs structurally
    forfeit >90% of the MXU -> the analytic ceiling must say so."""
    class Narrow(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(3):
                x = nn.relu(nn.Conv(8, (3, 3), use_bias=False)(x))
            return x.mean()

    m = Narrow()
    x = jnp.zeros((4, 56, 56, 8), jnp.bfloat16)
    v = m.init(jax.random.key(0), x)
    costs = op_costs(m.apply, v, x)
    sol = speed_of_light(costs, peak_tflops=197.0, hbm_gbps=819.0)
    assert sol["tile_efficiency"] < 0.10      # >90% forfeited by shape
    assert sol["mfu_ceiling"] < 0.10
