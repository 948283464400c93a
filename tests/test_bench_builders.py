"""The bench builders must measure the PRODUCTION mixed-precision step.

flax ``Dense(dtype=None)`` promotes bf16 activations with f32 kernels
back to f32 — a builder that forgets the master-param cast silently
benchmarks an f32 program under a bf16 label, and the residual stream
carries f32 into every later block (caught r4 on
bench_extra.build_timesformer_train; build_slowfast_train always had the
cast).  These tests trace each shared builder's step — the exact program
bench_extra times and bench_roofline costs — and assert the step's MXU
FLOPs are overwhelmingly on bf16 operands.  Trace-only: no compute.

Tolerated non-bf16 remainder (<2% of MXU FLOPs): the classifier head
(pooled feature deliberately cast f32 for loss stability) and the
attention backward dots where the f32 cotangent of a
``preferred_element_type=f32`` matmul meets a bf16 operand."""

import jax
import jax.numpy as jnp

import bench_extra
from cross_modal_video_engine_tpu.utils.roofline import op_costs


def _bf16_flop_fraction(step, *args):
    costs = [c for c in op_costs(step, *args) if c.flops]
    total = sum(c.flops for c in costs)
    bf16 = sum(c.flops for c in costs if c.dtypes == ("bfloat16",))
    assert total > 0
    return bf16 / total, costs


def test_timesformer_builder_is_bf16():
    model, tx, step = bench_extra.build_timesformer_train()
    clips = jax.ShapeDtypeStruct((1, 8, 224, 224, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct((1,), jnp.int32)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros(clips.shape, clips.dtype)),
        jax.random.key(0))
    opt_state = jax.eval_shape(tx.init, variables["params"])
    frac, costs = _bf16_flop_fraction(step, variables["params"], opt_state,
                                      clips, labels)
    offenders = sorted((c for c in costs if c.dtypes != ("bfloat16",)),
                       key=lambda c: -c.flops)[:5]
    assert frac >= 0.98, (frac, [(c.label, c.dtypes) for c in offenders])
    # 12 blocks x (2 attention + ffn), fwd + bwd
    assert len(costs) > 100


def test_slowfast_builder_is_bf16():
    model, tx, step = bench_extra.build_slowfast_train()
    clips = jax.ShapeDtypeStruct((1, 32, 224, 224, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct((1,), jnp.int32)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros(clips.shape, clips.dtype)),
        jax.random.key(0))
    opt_state = jax.eval_shape(tx.init, variables["params"])
    stats = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype),
        variables.get("batch_stats", {}))
    frac, costs = _bf16_flop_fraction(step, variables["params"], stats,
                                      opt_state, clips, labels)
    offenders = sorted((c for c in costs if c.dtypes != ("bfloat16",)),
                       key=lambda c: -c.flops)[:5]
    assert frac >= 0.98, (frac, [(c.label, c.dtypes) for c in offenders])
    assert len(costs) > 100
