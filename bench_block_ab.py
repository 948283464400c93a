"""Whole-block fusion A/B + fused_mlp-on-compact re-A/B (r4 verdict #5).

Two questions, both at the SHIPPED headline geometry (ViT-B/32 vision
tower: 1024 sequences x L=50 x D=768, H=12, bf16, compact flat layout,
g=8 -> 400-row chunks):

1. `fused_mlp` on the compact program: the r4 A/B read 1924 (attn-only)
   vs 1932 (both) — inside the 1957-2016 run spread.  Settle it with N
   interleaved repeats of the FULL shipped embed program per arm.

2. Whole-block fusion (attn + MLP in ONE kernel,
   ops/attention_sublayer.fused_block_sublayer_compact): saves the
   per-layer HBM round-trip of x (~0.6 ms/step per the r4 trace), costs
   14.2 MB of VMEM-resident weights (vs ~16 MB/core).  Measured at
   every feasible g (8 -> 1), falling back as Mosaic rejects the VMEM
   budget; op-level 12-layer stack vs the two-kernel chain.

Usage: python bench_block_ab.py [--repeats 5] [--out FILE]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _emit(row, out):
    print(json.dumps(row))
    if out is not None:
        out.append(row)


def bench_model_level(repeats, out):
    """Arm A/B of the full shipped bench.py program: fused_attn+fused_mlp
    vs fused_attn-only, interleaved repeats."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.models.clip import (CLIPConfig,
                                                          CLIPModel)
    rng = np.random.default_rng(0)
    B, F = 128, 8
    frames = jnp.asarray(rng.standard_normal((B, F, 224, 224, 3)),
                         jnp.bfloat16)

    def build(fused_mlp):
        cfg = CLIPConfig(
            embed_dim=512, image_resolution=224, vision_width=768,
            vision_layers=12, vision_heads=12, patch_size=32,
            context_length=77, vocab_size=49408, text_width=512,
            text_heads=8, text_layers=12, dtype="bfloat16",
            fused_attn=True, fused_mlp=fused_mlp)
        model = CLIPModel(cfg)
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 224, 224, 3),
                                              jnp.float32),
                                 jnp.zeros((1, 77), jnp.int32)),
            jax.random.key(0))
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape).astype(np.float32) * 0.02,
                s.dtype), shapes)
        STEPS = 20

        @jax.jit
        def embed_loop(variables, frames):
            def body(i, carry):
                f = jnp.where(jnp.isfinite(carry), frames,
                              jnp.zeros_like(frames))
                high, _ = model.apply(variables, f, method="encode_video")
                return jnp.mean(high).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, STEPS, body, jnp.bfloat16(0.0))

        np.asarray(embed_loop(variables, frames))   # compile + warm
        return embed_loop, variables, STEPS

    import time
    arms = {"attn+mlp": build(True), "attn_only": build(False)}
    times = {k: [] for k in arms}
    for _ in range(repeats):                    # interleaved: drift-fair
        for k, (loop, v, steps) in arms.items():
            t0 = time.perf_counter()
            np.asarray(loop(v, frames))
            times[k].append(steps * B / (time.perf_counter() - t0))
    for k, ts in times.items():
        _emit({"metric": f"headline_compact_{k}",
               "value": round(float(np.median(ts)), 1),
               "unit": "videos/s", "runs": [round(t, 1) for t in ts],
               "vs_baseline": round(float(np.median(ts)) / 350.0, 2)},
              out)
    med = {k: float(np.median(v)) for k, v in times.items()}
    _emit({"metric": "fused_mlp_on_compact_verdict",
           "value": round(med["attn+mlp"] / med["attn_only"], 4),
           "unit": "speedup_attn+mlp_over_attn_only",
           "vs_baseline": 1.0}, out)


def bench_op_level(repeats, out):
    """12-layer stack: two-kernel chain vs whole-block kernel at every
    feasible g."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.ops.attention_sublayer import (
        fused_attention_sublayer_compact, fused_block_sublayer_compact,
        fused_mlp_sublayer)
    from cross_modal_video_engine_tpu.utils.profiling import device_time

    rng = np.random.default_rng(1)
    NSEQ, L, D, H, LAYERS = 1024, 50, 768, 12, 12
    x = jnp.asarray(rng.standard_normal((NSEQ * L, D)) * 0.1,
                    jnp.bfloat16)

    def w(shape, s=0.03):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    layers = []
    for _ in range(LAYERS):
        layers.append(dict(
            a=(w((D,), 0.1) + 1, w((D,), 0.1), w((D, D)), w((D,), 0.01),
               w((D, D)), w((D,), 0.01), w((D, D)), w((D,), 0.01),
               w((D, D)), w((D,), 0.01)),
            m=(w((D,), 0.1) + 1, w((D,), 0.1), w((D, 4 * D)),
               w((4 * D,), 0.01), w((4 * D, D)), w((D,), 0.01))))
    aw = [l["a"] for l in layers]
    mw = [l["m"] for l in layers]

    def stack_two(x, aw, mw):
        for a, m in zip(aw, mw):
            x = fused_attention_sublayer_compact(
                x, *a, heads=H, seq_len=L, g=8)
            x = fused_mlp_sublayer(x, *m)
        return x

    t2 = device_time(stack_two, x, aw, mw, steps=10,
                     perturb_argnums=(0,))
    _emit({"metric": "stack12_two_kernels_g8", "value": round(t2 * 1e3, 3),
           "unit": "ms", "vs_baseline": 1.0}, out)

    for g in (8, 4, 2, 1):
        def stack_block(x, aw, mw, g=g):
            for a, m in zip(aw, mw):
                x = fused_block_sublayer_compact(
                    x, *a, *m, heads=H, seq_len=L, g=g)
            return x
        try:
            tb = device_time(stack_block, x, aw, mw, steps=10,
                             perturb_argnums=(0,))
            _emit({"metric": f"stack12_whole_block_g{g}",
                   "value": round(tb * 1e3, 3), "unit": "ms",
                   "speedup_vs_two_kernels": round(t2 / tb, 3),
                   "vs_baseline": 1.0}, out)
        except Exception as exc:
            _emit({"metric": f"stack12_whole_block_g{g}", "value": None,
                   "unit": "ms", "error": str(exc)[:300],
                   "vs_baseline": 0.0}, out)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--skip-model", action="store_true")
    ap.add_argument("--skip-op", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    rows = []
    if not args.skip_op:
        bench_op_level(args.repeats, rows)
    if not args.skip_model:
        bench_model_level(args.repeats, rows)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
