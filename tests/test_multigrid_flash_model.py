import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.train.multigrid import (
    GridBucket, MultigridSchedule)


def test_multigrid_schedule():
    sched = MultigridSchedule(long_cycle_epochs=1, final_epochs=2)
    total = 10
    seq = [sched.bucket_for(e, total) for e in range(total)]
    # final epochs pin the full-shape bucket
    assert seq[-1] == sched.buckets[-1] and seq[-2] == sched.buckets[-1]
    # earlier epochs rotate through buckets
    assert seq[0] == sched.buckets[0] and seq[1] == sched.buckets[1]
    # only len(buckets) distinct compiled shapes
    assert len(set(sched.compiled_shapes())) == len(sched.buckets)
    # LR scales with batch
    assert sched.lr_for(GridBucket(64, 4, 112)) == sched.base_lr * 8
    # multigrid keeps per-step cost roughly constant while the effective
    # batch (samples per step) shrinks toward the fine bucket
    costs = [b.cost for b in sched.buckets]
    assert max(costs) <= 4 * min(costs)
    batches = [b.batch_size for b in sched.buckets]
    assert batches == sorted(batches, reverse=True)


def test_multigrid_short_cycle():
    sched = MultigridSchedule(long_cycle_epochs=1, short_cycle_period=2,
                              final_epochs=1)
    # at stage 1, even steps drop one bucket coarser
    b_even = sched.bucket_for(1, 10, step=0)
    b_odd = sched.bucket_for(1, 10, step=1)
    assert b_even == sched.buckets[0] and b_odd == sched.buckets[1]


def test_timesformer_flash_matches_xla(monkeypatch):
    """Joint attention with use_flash_attention reproduces the XLA path
    (flash kernel in interpret mode on CPU)."""
    import jax.experimental.pallas as pl
    import cross_modal_video_engine_tpu.ops.flash_attention as fa
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", patched)

    from cross_modal_video_engine_tpu.models.timesformer import (
        TimeSformer, TimeSformerConfig)
    rng = np.random.default_rng(571)
    kw = dict(num_frames=2, img_size=16, patch_size=8, embed_dims=16,
              num_heads=2, num_layers=1, attention_type="joint_space_time",
              drop_path_max=0.0)
    m_x = TimeSformer(TimeSformerConfig(**kw))
    m_f = TimeSformer(TimeSformerConfig(**kw, use_flash_attention=True))
    v = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)), jnp.float32)
    variables = m_x.init(jax.random.key(0), v)
    out_x = np.asarray(m_x.apply(variables, v))
    out_f = np.asarray(m_f.apply(variables, v))
    np.testing.assert_allclose(out_f, out_x, rtol=2e-4, atol=2e-5)
