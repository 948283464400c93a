"""Analytic step-time roofline for the train benchmarks — no device.

Shape-only tracing (jax.make_jaxpr over ShapeDtypeStructs) of the SAME
train steps bench_extra measures, costed by utils/roofline: per-GEMM
MXU tile efficiency (the narrow-channel padding tax) and the
fused/unfused HBM byte bounds.  This demonstrates — from the shapes
alone — how much MFU the conv families structurally forfeit, the half
of the VERDICT-r3 profiling ask that does not need the chip
(bench_profile.py covers the measured half when the tunnel is up).

Run anywhere: `python bench_roofline.py` (forces CPU; tracing only).
Prints one JSON line per model plus the top bound-time offenders.
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np

# v5e-class chip: bf16 peak and HBM bandwidth used across docs/PERF.md
PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def _structs(tree):
    import jax
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), tree)


def _report(name, costs, batch, measured_vps=None):
    from cross_modal_video_engine_tpu.utils.roofline import (
        speed_of_light, worst_offenders)
    sol = speed_of_light(costs, PEAK_TFLOPS, HBM_GBPS)
    row = {
        "metric": f"roofline_{name}",
        "value": round(sol["mfu_ceiling"], 4),
        "unit": "structural_mfu_ceiling",
        "tile_efficiency": round(sol["tile_efficiency"], 4),
        "tflops_per_step": round(sol["flops"] / 1e12, 3),
        "t_compute_tiled_ms": round(sol["t_compute_tiled_s"] * 1e3, 2),
        "t_mem_fused_ms": round(sol["t_mem_fused_s"] * 1e3, 2),
        "t_mem_unfused_ms": round(sol["t_mem_unfused_s"] * 1e3, 2),
        "sol_videos_per_sec": round(
            batch / max(sol["t_compute_tiled_s"], sol["t_mem_fused_s"]), 1),
    }
    if measured_vps:
        row["measured_videos_per_sec"] = measured_vps
        row["pct_of_sol"] = round(
            measured_vps / row["sol_videos_per_sec"], 3)
    print(json.dumps(row))
    for label, t, util in worst_offenders(costs, PEAK_TFLOPS, HBM_GBPS, 8):
        print(json.dumps({"metric": f"roofline_{name}_offender",
                          "value": round(t * 1e3, 3), "unit": "ms_bound",
                          "op": label, "mxu_util": round(util, 3)}))
    return row


def roofline_slowfast(batch=32, frames=32, measured_vps=95.3):
    """bench_extra.bench_train_step_slowfast's exact step (shared
    builder — the traced program IS the measured one), traced."""
    import jax
    import jax.numpy as jnp
    from bench_extra import build_slowfast_train
    from cross_modal_video_engine_tpu.utils.roofline import op_costs

    model, tx, step = build_slowfast_train()
    clips = jax.ShapeDtypeStruct((batch, frames, 224, 224, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct((batch,), jnp.int32)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros(clips.shape, clips.dtype)),
        jax.random.key(0))
    opt_state = jax.eval_shape(tx.init, variables["params"])
    stats0 = variables.get("batch_stats", {})

    costs = op_costs(step, variables["params"], _structs(stats0),
                     opt_state, clips, labels)
    return _report(f"slowfast_bf16_b{batch}", costs, batch, measured_vps)


def roofline_yolov5s(batch=16, img=640, max_targets=32, measured_ips=446.0):
    """bench_extra.bench_train_step_yolov5's exact step, traced."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.losses.yolo import YoloHyp
    from cross_modal_video_engine_tpu.models.yolo import YoloConfig, YoloV5
    from cross_modal_video_engine_tpu.train.yolo_trainer import (
        YoloOptHyp, init_yolo_train_state, make_yolo_train_step,
        scaled_weight_decay)
    from cross_modal_video_engine_tpu.utils.roofline import op_costs

    model = YoloV5(YoloConfig(depth_multiple=0.33, width_multiple=0.50,
                              img_size=img))
    opt = YoloOptHyp()
    state = jax.eval_shape(
        lambda k: init_yolo_train_state(model, k, img, batch_size=2),
        jax.random.key(0))
    step = make_yolo_train_step(model, YoloHyp(), opt,
                                scaled_weight_decay(opt, batch), bf16=True)
    images = jax.ShapeDtypeStruct((batch, img, img, 3), jnp.float32)
    targets = jax.ShapeDtypeStruct((batch, max_targets, 5), jnp.float32)
    valid = jax.ShapeDtypeStruct((batch, max_targets), jnp.bool_)
    lr = jax.ShapeDtypeStruct((), jnp.float32)

    costs = op_costs(lambda s, i, t, v, l: step(s, i, t, v, l, l,
                                                jnp.float32(0.937)),
                     state, images, targets, valid, lr)
    return _report(f"yolov5s_640_bf16_b{batch}", costs, batch, measured_ips)


def roofline_timesformer(batch=4, measured_vps=58.1):
    """bench_extra.bench_train_step_timesformer's exact step (shared
    builder), traced — the transformer calibration point (measured
    ~35-43% MFU band)."""
    import jax
    import jax.numpy as jnp
    from bench_extra import build_timesformer_train
    from cross_modal_video_engine_tpu.utils.roofline import op_costs

    model, tx, step = build_timesformer_train()
    clips = jax.ShapeDtypeStruct((batch, 8, 224, 224, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct((batch,), jnp.int32)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros(clips.shape, clips.dtype)),
        jax.random.key(0))
    opt_state = jax.eval_shape(tx.init, variables["params"])

    costs = op_costs(step, variables["params"], opt_state, clips, labels)
    return _report(f"timesformer_divst_8x224_b{batch}", costs, batch,
                   measured_vps)


def roofline_vit_flagship(batch=32, frames=8, measured_vps=1213.9):
    """The headline bench.py program (CLIP ViT-B/32 vision tower, bf16,
    B=32 x 8 frames): the '~43% MFU is structural at L=50' claim from
    docs/PERF.md, derived analytically.  Traces ONE encode_video call
    (bench.py loops the same program STEPS times device-side)."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.models.clip import (CLIPConfig,
                                                          CLIPModel)
    from cross_modal_video_engine_tpu.utils.roofline import op_costs

    cfg = CLIPConfig(
        embed_dim=512, image_resolution=224, vision_width=768,
        vision_layers=12, vision_heads=12, patch_size=32,
        context_length=77, vocab_size=49408, text_width=512,
        text_heads=8, text_layers=12, dtype="bfloat16")
    model = CLIPModel(cfg)
    frames_s = jax.ShapeDtypeStruct((batch, frames, 224, 224, 3),
                                    jnp.bfloat16)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3), jnp.float32),
                             jnp.zeros((1, 77), jnp.int32)),
        jax.random.key(0))

    def embed(v, f):
        high, _ = model.apply(v, f, method="encode_video")
        return high

    costs = op_costs(embed, variables, frames_s)
    return _report(f"vitb32_embed_bf16_b{batch}x{frames}f", costs, batch,
                   measured_vps)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    roofline_vit_flagship()
    roofline_timesformer()
    roofline_slowfast()
    roofline_yolov5s()


if __name__ == "__main__":
    sys.exit(main())
