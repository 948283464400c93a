"""Conv-family training residual attribution (VERDICT r3 weak #4).

Answers, with measurements rather than assertions, where the non-MXU
time goes in the SlowFast and YOLOv5 train steps (single-digit MFU in
docs/PERF.md).  Three instruments:

1. `jax.profiler.trace` (if the axon relay supports device profiling —
   falls back gracefully if the trace comes back empty);
2. phase splits: fwd vs fwd+bwd vs full step (optimizer tax), train-BN
   vs frozen-BN forward (BN stat-update tax);
3. width A/Bs: the narrow-channel hypothesis predicts MFU rises with
   channel width at fixed FLOP utilization overheads — measured by
   widening the fast pathway (beta_inv) and the YOLO width multiple.

Prints one JSON line per measurement; summarize into docs/PERF.md.
Run on the real chip: `python bench_profile.py [--quick]`.
"""

import argparse
import json
import os

import numpy as np


def _flops(jitted, *args):
    """bench_extra's cost-analysis helper, normalized to 0.0 (the MFU
    rows here divide-guard on falsy) instead of its None."""
    from bench_extra import _flops_per_step
    return _flops_per_step(jitted, *args) or 0.0


def _row(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def profile_slowfast(batch=32, frames=32, steps=8, quick=False):
    import jax
    import jax.numpy as jnp
    import optax
    from cross_modal_video_engine_tpu.models.recognizer import (
        BackboneClassifier)
    from cross_modal_video_engine_tpu.models.resnet3d import (SlowFast,
                                                              SlowFastConfig)
    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        RecTrainState, _cast_tree, make_cls_train_step_stats)
    from cross_modal_video_engine_tpu.utils.profiling import device_time

    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal(
        (batch, frames, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 400, (batch,)), jnp.int32)

    def build(beta_inv):
        # 4x16x1 recipe: alpha=8 (bench_extra parity); params via
        # eval_shape + random fill (no init compile on the relay)
        model = BackboneClassifier(
            SlowFast(SlowFastConfig(alpha=8, beta_inv=beta_inv)),
            num_classes=400)
        shapes = jax.eval_shape(lambda k: model.init(k, clips),
                                jax.random.key(0))
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape).astype(np.float32) * 0.02,
                s.dtype), shapes)
        return model, variables

    model, variables = build(8)
    tx = optax.sgd(0.01, momentum=0.9)
    state = RecTrainState(variables["params"],
                          tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    stats = variables["batch_stats"]
    step = make_cls_train_step_stats(model, tx, bf16=True)

    # -- phase splits --------------------------------------------------
    # params cast to bf16 INSIDE each fn, exactly as the real bf16 step
    # does (loss_fn's _cast_tree) — with f32 params the activations stay
    # f32 and the B=32 forward alone exceeds the 16 GB HBM.
    def fwd_train(p, s, x):
        out, _ = model.apply(
            {"params": _cast_tree(p, jnp.bfloat16), "batch_stats": s},
            x.astype(jnp.bfloat16),
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)})
        return out

    def fwd_frozen(p, s, x):
        return model.apply(
            {"params": _cast_tree(p, jnp.bfloat16), "batch_stats": s},
            x.astype(jnp.bfloat16), train=False)

    def fwd_bwd(p, s, x, y):
        def loss(p):
            out, _ = model.apply(
                {"params": _cast_tree(p, jnp.bfloat16), "batch_stats": s},
                x.astype(jnp.bfloat16),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)})
            import optax as _o
            return _o.softmax_cross_entropy_with_integer_labels(
                out.astype(jnp.float32), y).mean()
        return jax.grad(loss)(p)

    t_fwd = device_time(fwd_train, state.params, stats, clips,
                        steps=steps, perturb_argnums=(2,))
    t_frozen = device_time(fwd_frozen, state.params, stats, clips,
                           steps=steps, perturb_argnums=(2,))
    t_fwdbwd = device_time(fwd_bwd, state.params, stats, clips, labels,
                           steps=max(2, steps // 2), perturb_argnums=(2,))
    t_step = device_time(
        lambda st, s, x, y: step(st, s, x, y, jax.random.key(0))[0].params,
        state, stats, clips, labels, steps=max(2, steps // 2),
        perturb_argnums=(2,))
    _row("slowfast_fwd_train_bf16_B32", t_fwd * 1e3, "ms")
    _row("slowfast_fwd_frozenBN_bf16_B32", t_frozen * 1e3, "ms",
         bn_stat_tax_ms=round((t_fwd - t_frozen) * 1e3, 2))
    _row("slowfast_fwd_bwd_bf16_B32", t_fwdbwd * 1e3, "ms",
         bwd_over_fwd=round(t_fwdbwd / t_fwd, 2))
    _row("slowfast_full_step_bf16_B32", t_step * 1e3, "ms",
         videos_per_s=round(batch / t_step, 1),
         opt_tax_ms=round((t_step - t_fwdbwd) * 1e3, 2))

    # -- width A/B: fast pathway 2x/4x wider ---------------------------
    # At B=32 the 2x-wide arm needs 16.9G of the 15.75G HBM, so the
    # sweep runs at B=16 with its own same-batch baseline arm (MFU vs
    # width is the question; it does not need the headline batch).
    if not quick:
        wb = batch // 2
        clips16, labels16 = clips[:wb], labels[:wb]
        for beta_inv in (8, 4, 2):
            m2, v2 = build(beta_inv)
            st2 = RecTrainState(v2["params"], tx.init(v2["params"]),
                                jnp.zeros((), jnp.int32))
            step2 = make_cls_train_step_stats(m2, tx, bf16=True)
            jstep2 = lambda st, s, x, y: step2(  # noqa: E731
                st, s, x, y, jax.random.key(0))[0].params
            try:
                t2 = device_time(jstep2, st2, v2["batch_stats"], clips16,
                                 labels16, steps=max(2, steps // 2),
                                 perturb_argnums=(2,))
            except Exception as exc:
                print(json.dumps({
                    "metric": f"slowfast_step_beta_inv{beta_inv}_bf16_B{wb}",
                    "value": None, "unit": "ms", "note": str(exc)[:120]}))
                continue
            fl = _flops(jax.jit(jstep2), st2, v2["batch_stats"], clips16,
                        labels16)
            _row(f"slowfast_step_beta_inv{beta_inv}_bf16_B{wb}",
                 t2 * 1e3, "ms", videos_per_s=round(wb / t2, 1),
                 tflops=round(fl / t2 / 1e12, 1) if fl else None)

    # -- s2d stem A/B: exact-math retiling of the roofline's top op ----
    # (ops/s2d_stem.py; param tree identical, so the SAME state/stats
    # feed both arms — only the program changes)
    if not quick:
        m3 = BackboneClassifier(
            SlowFast(SlowFastConfig(alpha=8, fast_s2d_stem=True)),
            num_classes=400)
        step3 = make_cls_train_step_stats(m3, tx, bf16=True)
        jstep3 = lambda st, s, x, y: step3(  # noqa: E731
            st, s, x, y, jax.random.key(0))[0].params
        try:
            t3 = device_time(jstep3, state, stats, clips, labels,
                             steps=max(2, steps // 2), perturb_argnums=(2,))
            _row("slowfast_step_s2d_stem_bf16_B32", t3 * 1e3, "ms",
                 videos_per_s=round(batch / t3, 1),
                 speedup_vs_base=round(t_step / t3, 3))
        except Exception as exc:
            print(json.dumps({"metric": "slowfast_step_s2d_stem_bf16_B32",
                              "value": None, "unit": "ms",
                              "note": str(exc)[:120]}))


def profile_slowfast_trace(batch=32, frames=32, steps=2,
                           out_dir="/tmp/cmve_trace_slowfast"):
    """Trace-mined per-op attribution of the SHIPPED SlowFast train
    step (bf16, s2d fast stem) — names the ops behind the phase-split
    attribution (BN stat reductions, conv fusions, transposes)."""
    import jax
    import jax.numpy as jnp
    import optax
    from cross_modal_video_engine_tpu.models.recognizer import (
        BackboneClassifier)
    from cross_modal_video_engine_tpu.models.resnet3d import (
        SlowFast, SlowFastConfig)
    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        RecTrainState, make_cls_train_step_stats)
    from cross_modal_video_engine_tpu.utils.trace_mine import (
        device_op_table, format_table)

    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal(
        (batch, frames, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 400, (batch,)), jnp.int32)
    model = BackboneClassifier(
        SlowFast(SlowFastConfig(alpha=8, fast_s2d_stem=True)),
        num_classes=400)
    shapes = jax.eval_shape(lambda k: model.init(k, clips),
                            jax.random.key(0))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02,
            s.dtype), shapes)
    tx = optax.sgd(0.01, momentum=0.9)
    state = RecTrainState(variables["params"],
                          tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    stats = variables["batch_stats"]
    step = make_cls_train_step_stats(model, tx, bf16=True)

    @jax.jit
    def loop(state, stats, clips, labels):
        def body(i, carry):
            st, s = carry
            st2, s2, _ = step(st, s, clips, labels, jax.random.key(0))
            return (st2, s2)
        return jax.lax.fori_loop(0, steps, body, (state, stats))

    out = loop(state, stats, clips, labels)
    np.asarray(jax.tree_util.tree_leaves(out)[0])       # sync
    os.makedirs(out_dir, exist_ok=True)
    try:
        with jax.profiler.trace(out_dir):
            out = loop(state, stats, clips, labels)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        rows = device_op_table(out_dir, steps=steps)
    except Exception as exc:
        _row("slowfast_trace_attribution", 0.0, "bool",
             error=str(exc)[:200])
        return
    print(format_table(rows, top=16))
    for r in rows[:8]:
        if r["pct"] is not None:
            _row(f"slowfast_optime_{r['name'][:40]}", r["ms_per_step"],
                 "ms/step", pct_of_device=r["pct"], count=r["count"])


def profile_yolo(batch=16, img=640, max_targets=32, steps=6, quick=False):
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.losses.yolo import YoloHyp
    from cross_modal_video_engine_tpu.models.yolo import YoloConfig, YoloV5
    from cross_modal_video_engine_tpu.train.yolo_trainer import (
        YoloOptHyp, init_yolo_train_state, make_yolo_train_step,
        scaled_weight_decay)
    from cross_modal_video_engine_tpu.utils.profiling import device_time

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    cxy = rng.random((batch, max_targets, 2)) * 0.8 + 0.1
    wh = rng.random((batch, max_targets, 2)) * 0.2 + 0.02
    cls = rng.integers(0, 80, (batch, max_targets, 1))
    targets = jnp.asarray(np.concatenate([cls, cxy, wh], -1).astype(
        np.float32))
    valid = jnp.asarray(np.ones((batch, max_targets), bool))
    lr, mom = jnp.float32(0.01), jnp.float32(0.937)

    def run(wm, tag, s2d=False):
        cfg = YoloConfig(num_classes=80, width_multiple=wm,
                         depth_multiple=0.33, img_size=img,
                         s2d_stem=s2d)
        model = YoloV5(cfg)
        opt = YoloOptHyp()
        state = init_yolo_train_state(model, jax.random.key(0), img,
                                      batch_size=2)
        step = make_yolo_train_step(model, YoloHyp(), opt,
                                    scaled_weight_decay(opt, batch),
                                    bf16=True)

        def jstep(st, x, t, v):
            new, metrics = step(st, x, t, v, lr, lr, mom)
            return new, metrics["loss"]
        t = device_time(jstep, state, images, targets, valid,
                        steps=steps, perturb_argnums=(1,))
        fl = _flops(jax.jit(jstep), state, images, targets, valid)
        _row(f"yolov5_step_{tag}_bf16_B{batch}", t * 1e3, "ms",
             imgs_per_s=round(batch / t, 1),
             tflops=round(fl / t / 1e12, 1) if fl else None)

        def fwd(p, s, x):
            from cross_modal_video_engine_tpu.train.recognition_trainer \
                import _cast_tree
            out = model.apply(
                {"params": _cast_tree(p, jnp.bfloat16), "batch_stats": s},
                x.astype(jnp.bfloat16), train=False)
            return out[0] if isinstance(out, tuple) else out
        t_fwd = device_time(fwd, state.params, state.batch_stats, images,
                            steps=steps, perturb_argnums=(2,))
        _row(f"yolov5_fwd_{tag}_bf16_B{batch}", t_fwd * 1e3, "ms",
             step_over_fwd=round(t / t_fwd, 2))

    run(0.5, "s")                     # yolov5s
    if not quick:
        for wm, tag, s2d in ((0.5, "s_s2d_stem", True),
                             (1.0, "l_width", False)):
            try:
                run(wm, tag, s2d=s2d)
            except Exception as exc:
                print(json.dumps({
                    "metric": f"yolov5_step_{tag}_bf16_B{batch}",
                    "value": None, "unit": "ms", "note": str(exc)[:120]}))


def profile_yolo_trace(batch=16, img=640, max_targets=32, steps=2,
                       out_dir="/tmp/cmve_trace_yolo"):
    """Trace-mined per-op attribution of the YOLOv5s train step
    (companion to profile_slowfast_trace)."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.losses.yolo import YoloHyp
    from cross_modal_video_engine_tpu.models.yolo import (YoloConfig,
                                                          YoloV5)
    from cross_modal_video_engine_tpu.train.yolo_trainer import (
        YoloOptHyp, init_yolo_train_state, make_yolo_train_step,
        scaled_weight_decay)
    from cross_modal_video_engine_tpu.utils.trace_mine import (
        device_op_table, format_table)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    cxy = rng.random((batch, max_targets, 2)) * 0.8 + 0.1
    wh = rng.random((batch, max_targets, 2)) * 0.2 + 0.02
    cls = rng.integers(0, 80, (batch, max_targets, 1))
    targets = jnp.asarray(np.concatenate([cls, cxy, wh], -1).astype(
        np.float32))
    valid = jnp.asarray(np.ones((batch, max_targets), bool))
    lr, mom = jnp.float32(0.01), jnp.float32(0.937)
    cfg = YoloConfig(num_classes=80, width_multiple=0.5,
                     depth_multiple=0.33, img_size=img)
    model = YoloV5(cfg)
    opt = YoloOptHyp()
    state = init_yolo_train_state(model, jax.random.key(0), img,
                                  batch_size=2)
    step = make_yolo_train_step(model, YoloHyp(), opt,
                                scaled_weight_decay(opt, batch),
                                bf16=True)

    @jax.jit
    def loop(state, images, targets, valid):
        def body(i, st):
            new, _ = step(st, images, targets, valid, lr, lr, mom)
            return new
        return jax.lax.fori_loop(0, steps, body, state)

    out = loop(state, images, targets, valid)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    os.makedirs(out_dir, exist_ok=True)
    try:
        with jax.profiler.trace(out_dir):
            out = loop(state, images, targets, valid)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        rows = device_op_table(out_dir, steps=steps)
    except Exception as exc:
        _row("yolo_trace_attribution", 0.0, "bool", error=str(exc)[:200])
        return
    print(format_table(rows, top=16))
    for r in rows[:8]:
        if r["pct"] is not None:
            _row(f"yolo_optime_{r['name'][:40]}", r["ms_per_step"],
                 "ms/step", pct_of_device=r["pct"], count=r["count"])


def try_profiler_trace(out_dir="/tmp/cmve_trace"):
    """Attempt a real device trace (works on local TPU; the axon relay
    may not export profiler endpoints — report which)."""
    import jax
    import jax.numpy as jnp
    os.makedirs(out_dir, exist_ok=True)
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    np.asarray(f(x))
    try:
        with jax.profiler.trace(out_dir):
            np.asarray(f(x))
        files = [os.path.join(dp, fn) for dp, _, fns in os.walk(out_dir)
                 for fn in fns]
        ok = any(fn.endswith((".pb", ".json.gz", ".xplane.pb"))
                 for fn in files)
        _row("profiler_trace_available", 1.0 if ok else 0.0, "bool",
             dir=out_dir, n_files=len(files))
    except Exception as exc:
        _row("profiler_trace_available", 0.0, "bool", error=str(exc)[:200])


def profile_headline(steps=5, out_dir="/tmp/cmve_trace_headline"):
    """Trace the compact fused-sublayer headline embed and print the
    mined per-op device attribution (utils/trace_mine.py) — the
    instrument that found the L=50->64 pad tax (docs/PERF.md compact-
    layout section)."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.models.clip import (CLIPConfig,
                                                          CLIPModel)
    from cross_modal_video_engine_tpu.utils.trace_mine import (
        device_op_table, format_table)

    cfg = CLIPConfig(dtype="bfloat16", fused_attn=True, fused_mlp=True)
    model = CLIPModel(cfg)
    rng = np.random.default_rng(0)
    B, F = 32, 8
    frames = jnp.asarray(rng.standard_normal((B, F, 224, 224, 3)),
                         jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3), jnp.float32),
                             jnp.zeros((1, 77), jnp.int32)),
        jax.random.key(0))
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02,
            s.dtype), shapes)

    @jax.jit
    def loop(variables, frames):
        def body(i, carry):
            f = jnp.where(jnp.isfinite(carry), frames,
                          jnp.zeros_like(frames))
            high, _ = model.apply(variables, f, method="encode_video")
            return jnp.mean(high).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, steps, body, jnp.bfloat16(0.0))

    np.asarray(loop(variables, frames))            # compile + warmup
    os.makedirs(out_dir, exist_ok=True)
    try:
        with jax.profiler.trace(out_dir):
            np.asarray(loop(variables, frames))
        rows = device_op_table(out_dir, steps=steps)
    except Exception as exc:
        _row("headline_trace_attribution", 0.0, "bool",
             error=str(exc)[:200])
        return
    print(format_table(rows))
    for r in rows[:6]:
        if r["pct"] is not None:
            _row(f"headline_optime_{r['name']}", r["ms_per_step"],
                 "ms/step", pct_of_device=r["pct"])


def profile_bn_ab(batch=32, frames=32, ybatch=16, img=640, steps=6,
                  smoke=False):
    """Act on the r4-measured BN lines (SlowFast: BN apply/stat = 26% of
    device; YOLO: 36%).  Two exact-math attempts per family, keep/reject
    by measurement:

    * eval-path conv+BN fold bracket: time the frozen-BN eval forward
      with BN applies REMOVED entirely (identity `_bn`).  This brackets
      the most ANY conv+BN weight-fold (the reference yolov5's
      `model.fuse()`, MCT/yolov5/models/yolo.py) could save under XLA —
      if the delta is ~0, XLA already epilogue-fuses frozen BN into the
      convs and a fold has nothing left to win on TPU.
    * one-pass BN statistics in the train step: swap nn.BatchNorm for
      ops/one_pass_bn.OnePassBatchNorm (both sums in ONE variadic
      lax.reduce; parity-pinned) via the models' `_bn` factories, vs
      flax's two-jnp.mean formulation that leaves the single-pass merge
      to XLA's multi-output fusion.

    `smoke=True` runs tiny shapes (CPU CI path, tests/test_bench_stages).
    """
    import jax
    import jax.numpy as jnp
    import optax
    from cross_modal_video_engine_tpu.models import resnet3d as r3d
    from cross_modal_video_engine_tpu.models import yolo as yolomod
    from cross_modal_video_engine_tpu.models.recognizer import (
        BackboneClassifier)
    from cross_modal_video_engine_tpu.models.resnet3d import (SlowFast,
                                                              SlowFastConfig)
    from cross_modal_video_engine_tpu.models.yolo import YoloConfig, YoloV5
    from cross_modal_video_engine_tpu.ops.one_pass_bn import OnePassBatchNorm
    from cross_modal_video_engine_tpu.losses.yolo import YoloHyp
    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        RecTrainState, _cast_tree, make_cls_train_step_stats)
    from cross_modal_video_engine_tpu.train.yolo_trainer import (
        YoloOptHyp, init_yolo_train_state, make_yolo_train_step,
        scaled_weight_decay)
    from cross_modal_video_engine_tpu.utils.profiling import device_time

    if smoke:
        batch, frames, ybatch, img, steps = 2, 4, 2, 64, 2

    def identity_bn(train, name="bn"):
        return lambda x: x

    def one_pass_bn_like(orig_factory):
        # clone the stock factory's hyperparams (momentum/eps differ per
        # family) onto the one-pass module; probe OUTSIDE any module
        # scope (constructing a module inside a live parent registers
        # its name and the real submodule would then clash)
        probe = orig_factory(True, "probe")

        def factory(train, name="bn"):
            return OnePassBatchNorm(
                use_running_average=not train,
                momentum=probe.momentum, epsilon=probe.epsilon, name=name)
        return factory

    rng = np.random.default_rng(0)

    # ---- SlowFast ----------------------------------------------------
    clips = jnp.asarray(rng.standard_normal(
        (batch, frames, img if smoke else 224, img if smoke else 224, 3)
    ).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 400, (batch,)), jnp.int32)
    model = BackboneClassifier(SlowFast(SlowFastConfig(alpha=8)),
                               num_classes=400)
    shapes = jax.eval_shape(lambda k: model.init(k, clips),
                            jax.random.key(0))
    variables = jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape).astype(
            np.float32) * 0.02, s.dtype), shapes)
    stats = variables["batch_stats"]
    tx = optax.sgd(0.01, momentum=0.9)
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))

    def fwd_frozen(p, s, x):
        return model.apply(
            {"params": _cast_tree(p, jnp.bfloat16), "batch_stats": s},
            x.astype(jnp.bfloat16), train=False)

    def timed_step(st, s, x, y):
        step = make_cls_train_step_stats(model, tx, bf16=True)
        return device_time(
            lambda st_, s_, x_, y_: step(st_, s_, x_, y_,
                                         jax.random.key(0))[0].params,
            st, s, x, y, steps=steps, perturb_argnums=(2,))

    t_eval = device_time(fwd_frozen, state.params, stats, clips,
                         steps=steps, perturb_argnums=(2,))
    t_step = timed_step(state, stats, clips, labels)
    orig = r3d._bn
    try:
        r3d._bn = identity_bn
        t_eval_nobn = device_time(fwd_frozen, state.params, stats, clips,
                                  steps=steps, perturb_argnums=(2,))
        r3d._bn = one_pass_bn_like(orig)
        t_step_1p = timed_step(state, stats, clips, labels)
    finally:
        r3d._bn = orig
    _row(f"slowfast_evalfwd_bf16_B{batch}", t_eval * 1e3, "ms")
    _row(f"slowfast_evalfwd_bnREMOVED_B{batch}", t_eval_nobn * 1e3, "ms",
         fold_bracket_ms=round((t_eval - t_eval_nobn) * 1e3, 2),
         fold_bracket_pct=round(100 * (1 - t_eval_nobn / t_eval), 1))
    _row(f"slowfast_step_onepassBN_bf16_B{batch}", t_step_1p * 1e3, "ms",
         base_step_ms=round(t_step * 1e3, 2),
         speedup_vs_base=round(t_step / t_step_1p, 3))

    # ---- YOLOv5s -----------------------------------------------------
    images = jnp.asarray(rng.random((ybatch, img, img, 3), np.float32))
    cxy = rng.random((ybatch, 8, 2)) * 0.8 + 0.1
    wh = rng.random((ybatch, 8, 2)) * 0.2 + 0.02
    cls = rng.integers(0, 80, (ybatch, 8, 1))
    targets = jnp.asarray(np.concatenate([cls, cxy, wh], -1).astype(
        np.float32))
    valid = jnp.asarray(np.ones((ybatch, 8), bool))
    lr, mom = jnp.float32(0.01), jnp.float32(0.937)
    ycfg = YoloConfig(num_classes=80, width_multiple=0.5,
                      depth_multiple=0.33, img_size=img)
    ymodel = YoloV5(ycfg)
    ystate = init_yolo_train_state(ymodel, jax.random.key(0), img,
                                   batch_size=2)

    def yfwd(p, s, x):
        out = ymodel.apply(
            {"params": _cast_tree(p, jnp.bfloat16), "batch_stats": s},
            x.astype(jnp.bfloat16), train=False)
        return out[0] if isinstance(out, tuple) else out

    def ytimed_step(st, x, t, v):
        step = make_yolo_train_step(ymodel, YoloHyp(), YoloOptHyp(),
                                    scaled_weight_decay(YoloOptHyp(),
                                                        ybatch),
                                    bf16=True)
        return device_time(
            lambda st_, x_, t_, v_: step(st_, x_, t_, v_, lr, lr,
                                         mom)[1]["loss"],
            st, x, t, v, steps=steps, perturb_argnums=(1,))

    ty_eval = device_time(yfwd, ystate.params, ystate.batch_stats, images,
                          steps=steps, perturb_argnums=(2,))
    ty_step = ytimed_step(ystate, images, targets, valid)
    yorig = yolomod._bn
    try:
        yolomod._bn = identity_bn
        ty_eval_nobn = device_time(yfwd, ystate.params, ystate.batch_stats,
                                   images, steps=steps, perturb_argnums=(2,))
        yolomod._bn = one_pass_bn_like(yorig)
        ty_step_1p = ytimed_step(ystate, images, targets, valid)
    finally:
        yolomod._bn = yorig
    _row(f"yolov5s_evalfwd_bf16_B{ybatch}", ty_eval * 1e3, "ms")
    _row(f"yolov5s_evalfwd_bnREMOVED_B{ybatch}", ty_eval_nobn * 1e3, "ms",
         fold_bracket_ms=round((ty_eval - ty_eval_nobn) * 1e3, 2),
         fold_bracket_pct=round(100 * (1 - ty_eval_nobn / ty_eval), 1))
    _row(f"yolov5s_step_onepassBN_bf16_B{ybatch}", ty_step_1p * 1e3, "ms",
         base_step_ms=round(ty_step * 1e3, 2),
         speedup_vs_base=round(ty_step / ty_step_1p, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-trace", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run one stage by name (e.g. bn_ab)")
    args = ap.parse_args()
    if args.only:
        {"bn_ab": profile_bn_ab,
         "slowfast": profile_slowfast,
         "yolo": profile_yolo,
         "headline": profile_headline,
         "slowfast_trace": profile_slowfast_trace,
         "yolo_trace": profile_yolo_trace}[args.only]()
        return
    if not args.skip_trace:
        try_profiler_trace()
        profile_headline()
        profile_slowfast_trace()
        profile_yolo_trace()
    profile_slowfast(quick=args.quick)
    profile_yolo(quick=args.quick)
    profile_bn_ab()


if __name__ == "__main__":
    main()
