"""Recognition / caption training (MCT apis/train.py equivalent).

One jitted step per model family:
  * classification (Recognizer3D): CE over class scores, SGD-momentum with
    weight decay like the mmaction TimeSformer recipe, or AdamW;
  * label-sequence (Recognizer3DRelseq): SeqMLL loss with teacher forcing.

Epoch runner semantics follow the mmcv EpochBasedRunner + EvalHook: train N
epochs, validate every `eval_interval`, keep `save_best` by the chosen
metric, checkpoint every epoch (configs/_base_/default_runtime.py:1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..metrics.accuracy import mean_class_accuracy, top_k_accuracy


@dataclasses.dataclass(frozen=True)
class RecognitionTrainConfig:
    optimizer: str = "sgd"           # | 'adamw'
    learning_rate: float = 0.005
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip: float = 40.0          # mmaction grad_clip=dict(max_norm=40)
    num_epochs: int = 15
    eval_interval: int = 1
    warmup_steps: int = 0
    # mixed precision (mmcv Fp16OptimizerHook analogue): bf16 forward/
    # backward with f32 master params — 2.1x SlowFast train throughput
    bf16: bool = False


class RecTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_rec_optimizer(cfg: RecognitionTrainConfig, total_steps: int = 10000):
    if cfg.warmup_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, total_steps)
    else:
        sched = cfg.learning_rate
    if cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum))
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def _train_rngs(rng):
    """Per-step rng streams: dropout everywhere, plus 'relation' for
    TRNHead's random tuple subsampling (heads.py TRNMultiScale — without
    this stream the head silently falls back to fixed evenly-spaced
    tuples every step).  Flax ignores streams a model doesn't use.
    fold_in (not split) keeps the dropout stream bit-identical to the
    pre-'relation' trainers, so existing seeds reproduce."""
    return {"dropout": rng, "relation": jax.random.fold_in(rng, 1)}


def make_cls_train_step(model, tx, blending=None, bf16: bool = False):
    """`blending` (optional): a data/blending.make_blending callable — the
    mmaction `train_cfg=dict(blending=...)` path.  Blended batches train
    against soft labels; accuracy still reports vs the hard labels.

    ``bf16=True`` is the mmcv Fp16OptimizerHook analogue
    (apis/train.py:151-158) done the TPU way: the forward/backward runs
    in bfloat16 (f32 master params cast inside loss_fn, grads cast back)
    — no loss scaling needed on bf16's e8 exponent.  A/B on SlowFast
    4x16 B=16: 78.7 vs 37.9 videos/s/chip (docs/PERF.md)."""

    def loss_fn(params, videos, labels, rng):
        if bf16:
            params = _cast_tree(params, jnp.bfloat16)
            videos = videos.astype(jnp.bfloat16)
        if blending is not None:
            rng, brng = jax.random.split(rng)
            videos, soft = blending(brng, videos, labels)
        scores = model.apply({"params": params}, videos, train=True,
                             rngs=_train_rngs(rng))
        scores = scores.astype(jnp.float32)
        if blending is not None:
            loss = optax.softmax_cross_entropy(scores, soft).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(
                scores, labels).mean()
        acc = (scores.argmax(-1) == labels).mean()
        return loss, acc

    def step(state: RecTrainState, videos, labels, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, videos, labels, rng)
        if bf16:
            grads = _cast_tree(grads, jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1),
                {"loss": loss, "top1_acc": acc})

    return jax.jit(step)


def make_cls_train_step_stats(model, tx, blending=None, bf16: bool = False):
    """make_cls_train_step for BatchNorm backbones: threads the
    batch_stats collection (mutable in train) alongside the params.
    ``bf16`` as in make_cls_train_step (batch_stats stay f32)."""

    def loss_fn(params, stats, videos, labels, rng):
        if bf16:
            params = _cast_tree(params, jnp.bfloat16)
            videos = videos.astype(jnp.bfloat16)
        if blending is not None:
            rng, brng = jax.random.split(rng)
            videos, soft = blending(brng, videos, labels)
        scores, new = model.apply(
            {"params": params, "batch_stats": stats}, videos, train=True,
            rngs=_train_rngs(rng), mutable=["batch_stats"])
        scores = scores.astype(jnp.float32)
        if blending is not None:
            loss = optax.softmax_cross_entropy(scores, soft).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(
                scores, labels).mean()
        acc = (scores.argmax(-1) == labels).mean()
        new_stats = (_cast_tree(new["batch_stats"], jnp.float32)
                     if bf16 else new["batch_stats"])
        return loss, (acc, new_stats)

    def step(state: RecTrainState, stats, videos, labels, rng):
        (loss, (acc, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, stats, videos, labels, rng)
        if bf16:
            grads = _cast_tree(grads, jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1), stats,
                {"loss": loss, "top1_acc": acc})

    return jax.jit(step)


def make_seq_train_step(model, tx):
    def loss_fn(params, videos, targets_emb, mask, rng):
        return model.apply({"params": params}, videos, targets_emb, mask,
                           method="forward_train", rngs=_train_rngs(rng))

    def step(state: RecTrainState, videos, targets_emb, mask, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, videos, targets_emb, mask, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1),
                {"loss": loss})

    return jax.jit(step)


def make_seq_train_step_stats(model, tx):
    """make_seq_train_step for BatchNorm backbones (the conv members of
    the seq_generate family): threads batch_stats."""

    def loss_fn(params, stats, videos, targets_emb, mask, rng):
        loss, new = model.apply(
            {"params": params, "batch_stats": stats}, videos, targets_emb,
            mask, method="forward_train", rngs=_train_rngs(rng),
            mutable=["batch_stats"])
        return loss, new["batch_stats"]

    def step(state: RecTrainState, stats, videos, targets_emb, mask, rng):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, stats, videos, targets_emb, mask, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1), stats,
                {"loss": loss})

    return jax.jit(step)


# ---------------------------------------------------------------------------
# multigrid training (train/multigrid.py schedule, integrated)
# ---------------------------------------------------------------------------

def adapt_clips_to_bucket(clips, bucket):
    """(B, T, H, W, C) -> (B, bucket.num_frames, res, res, C): uniform
    temporal subsampling + bilinear spatial resize.  Host/device-agnostic;
    the per-bucket output shape is static so each bucket compiles once."""
    clips = jnp.asarray(clips)
    B, T, H, W, C = clips.shape
    if T != bucket.num_frames:
        idx = np.round(np.linspace(0, T - 1, bucket.num_frames)).astype(int)
        clips = clips[:, idx]
    r = bucket.resolution
    if (H, W) != (r, r):
        clips = jax.image.resize(
            clips, (B, bucket.num_frames, r, r, C), "linear")
    return clips


def bucketize_batches(batches, bucket):
    """Regroup an iterable of (clips, labels) into bucket-shaped batches:
    clips adapted to the bucket's (frames, resolution), batch re-chunked to
    bucket.batch_size (tail dropped — multigrid epochs are long)."""
    buf_c, buf_l = [], []
    for clips, labels in batches:
        buf_c.append(np.asarray(adapt_clips_to_bucket(clips, bucket)))
        buf_l.append(np.asarray(labels))
        have = sum(c.shape[0] for c in buf_c)
        while have >= bucket.batch_size:
            cat_c = np.concatenate(buf_c)
            cat_l = np.concatenate(buf_l)
            yield (jnp.asarray(cat_c[: bucket.batch_size]),
                   jnp.asarray(cat_l[: bucket.batch_size]))
            buf_c = [cat_c[bucket.batch_size:]]
            buf_l = [cat_l[bucket.batch_size:]]
            have = buf_c[0].shape[0]


class _RawChunker:
    """Draw exactly-n-sample chunks from an iterable of raw full-shape
    (clips, labels) batches (tail dropped, like bucketize_batches).
    Used by the short-cycle multigrid path, where consecutive steps
    need DIFFERENT batch sizes — pre-chunking at one bucket and slicing
    would silently discard the rest of every mismatched chunk."""

    def __init__(self, batches):
        self._it = iter(batches)
        self._c, self._l = [], []
        self._have = 0

    def take(self, n: int):
        while self._have < n:
            try:
                c, l = next(self._it)
            except StopIteration:
                return None
            c = np.asarray(c)
            self._c.append(c)
            self._l.append(np.asarray(l))
            self._have += c.shape[0]
        cat_c, cat_l = np.concatenate(self._c), np.concatenate(self._l)
        self._c, self._l = [cat_c[n:]], [cat_l[n:]]
        self._have = cat_c.shape[0] - n
        return cat_c[:n], cat_l[:n]


def make_multigrid_train_step(model, tx, lr_scale: float,
                              has_batch_stats: bool):
    """One compiled classification step with the bucket's LR scale and
    (for conv backbones) BatchNorm running-stat updates."""

    def loss_fn(params, stats, videos, labels, rng):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = stats
            scores, new_vars = model.apply(
                variables, videos, train=True, mutable=["batch_stats"],
                rngs=_train_rngs(rng))
            new_stats = new_vars["batch_stats"]
        else:
            scores = model.apply(variables, videos, train=True,
                                 rngs=_train_rngs(rng))
            new_stats = stats
        loss = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        acc = (scores.argmax(-1) == labels).mean()
        return loss, (new_stats, acc)

    @jax.jit
    def step(params, stats, opt_state, videos, labels, rng):
        (loss, (stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, videos, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, stats, opt_state, {"loss": loss, "top1_acc": acc}

    return step


def train_multigrid(model, variables, tcfg: RecognitionTrainConfig,
                    schedule, epoch_batches: Callable[[int], Any],
                    total_epochs: int, rng=None,
                    precise_bn_batches: int = 0,
                    total_steps: Optional[int] = None):
    """Multigrid training loop: each epoch runs at the schedule's bucket
    (coarse -> fine long cycle, optional short cycle per step, final
    epochs at the finest bucket), with per-bucket compiled steps and LR
    scaled by the bucket's effective batch (multigrid.py lr_for).

    epoch_batches(epoch) yields full-shape (clips, labels); bucket
    adaptation + re-chunking happens here.  Returns ((variables, opt
    state), history) — history rows carry the bucket so callers can
    verify the schedule actually switched shapes.

    precise_bn_batches > 0 recalibrates BatchNorm running stats at the
    finest bucket after training — the reference's multigrid +
    SubBN-aggregation/PreciseBN pairing (apis/train.py:170-200), since
    coarse-bucket epochs pollute the EMA with other-shape statistics.
    """
    rng = jax.random.key(0) if rng is None else rng
    # total_steps sizes a configured warmup-cosine schedule to the run
    # (the 10k default would decay lr to 0 mid-run on real datasets)
    tx = (make_rec_optimizer(tcfg, total_steps=total_steps)
          if total_steps else make_rec_optimizer(tcfg))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    has_stats = bool(stats)
    opt_state = tx.init(params)
    steps = {}

    def get_step(bucket):
        if bucket not in steps:
            scale = bucket.batch_size / schedule.base_batch
            steps[bucket] = make_multigrid_train_step(model, tx, scale,
                                                      has_stats)
        return steps[bucket]

    history = []
    for epoch in range(total_epochs):
        bucket = schedule.bucket_for(epoch, total_epochs)
        losses, accs, n_steps = [], [], 0
        if schedule.short_cycle_period:
            # per-step chunking: consecutive steps use different bucket
            # batch sizes, so each step draws exactly its bucket's
            # samples from the raw stream (pre-chunking at one bucket
            # and slicing would drop the rest of mismatched chunks)
            chunker = _RawChunker(epoch_batches(epoch))
            while True:
                b_step = schedule.bucket_for(epoch, total_epochs, n_steps)
                chunk = chunker.take(b_step.batch_size)
                if chunk is None:
                    break
                clips = adapt_clips_to_bucket(jnp.asarray(chunk[0]), b_step)
                labels = jnp.asarray(chunk[1])
                rng, sub = jax.random.split(rng)
                params, stats, opt_state, logs = get_step(b_step)(
                    params, stats, opt_state, clips, labels, sub)
                losses.append(float(logs["loss"]))
                accs.append(float(logs["top1_acc"]))
                n_steps += 1
        else:
            step = get_step(bucket)
            for clips, labels in bucketize_batches(epoch_batches(epoch),
                                                   bucket):
                rng, sub = jax.random.split(rng)
                params, stats, opt_state, logs = step(
                    params, stats, opt_state, clips, labels, sub)
                losses.append(float(logs["loss"]))
                accs.append(float(logs["top1_acc"]))
                n_steps += 1
        history.append({
            "epoch": epoch, "bucket": (bucket.batch_size, bucket.num_frames,
                                       bucket.resolution),
            "lr_scale": bucket.batch_size / schedule.base_batch,
            "loss": float(np.mean(losses)), "top1_acc": float(np.mean(accs)),
            "steps": n_steps,
        })
    out = {"params": params}
    if has_stats:
        out["batch_stats"] = stats
        if precise_bn_batches > 0:
            from .precise_bn import update_bn_stats
            fine = schedule.buckets[-1]

            def apply_fn(variables, batch):
                clips, _ = batch
                return model.apply(variables, clips, train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.key(0)})

            out = update_bn_stats(
                apply_fn, out,
                bucketize_batches(epoch_batches(total_epochs), fine),
                num_iters=precise_bn_batches)
    return (out, opt_state), history


# ---------------------------------------------------------------------------
# OmniSource training (reference core/runner/omnisource_runner.py:42-100,
# wired by apis/train.py:98-140)
# ---------------------------------------------------------------------------

def _cycle(make_iter):
    while True:
        it = make_iter()
        empty = True
        for x in it:
            empty = False
            yield x
        if empty:
            return


def train_omnisource(model, variables, tcfg: RecognitionTrainConfig,
                     main_batches: Callable[[int], Any],
                     aux_batches: Sequence[Callable[[], Any]],
                     train_ratio: Sequence[int], total_epochs: int,
                     rng=None, total_steps: Optional[int] = None,
                     start_epoch: int = 0, init_opt_state=None,
                     init_it: int = 0, epoch_callback=None):
    """Alternating-source training: the main source drives the epoch;
    every `train_ratio[0]` main steps, `train_ratio[1+i]` batches are
    drawn from each (endlessly cycled) auxiliary source and stepped with
    the SAME model/optimizer.  Per-source losses are logged with the
    reference's '/auxN' suffixes.

    main_batches(epoch) -> iterable of (clips, labels);
    aux_batches[i]() -> a fresh iterable of (clips, labels) (re-created
    when exhausted — the runner's itertools.cycle).
    Returns (trained variables, per-epoch history).

    NOTE: `total_steps` sizes the LR schedule and must count the aux
    steps too (each aux batch is an optimizer step) — see
    cli/recognition_train._omnisource_total_steps.
    Resume: pass start_epoch/init_opt_state/init_it saved by
    `epoch_callback(epoch, state_dict)`, which fires after every epoch
    with {"params", "batch_stats", "opt_state", "it"}.
    """
    rng = jax.random.key(0) if rng is None else rng
    tx = (make_rec_optimizer(tcfg, total_steps=total_steps)
          if total_steps else make_rec_optimizer(tcfg))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt_state = (init_opt_state if init_opt_state is not None
                 else tx.init(params))
    step_fn = make_multigrid_train_step(model, tx, lr_scale=1.0,
                                        has_batch_stats=bool(stats))
    use_aux_per_niter = train_ratio[0]
    aux_times = list(train_ratio[1:])
    assert len(aux_times) == len(aux_batches)
    aux_iters = [_cycle(fn) for fn in aux_batches]

    history = []
    it = init_it
    for epoch in range(start_epoch, total_epochs):
        logs_sum: dict = {}
        counts: dict = {}

        def record(logs, source):
            for k, v in logs.items():
                key = k + source
                logs_sum[key] = logs_sum.get(key, 0.0) + float(v)
                counts[key] = counts.get(key, 0) + 1

        for clips, labels in main_batches(epoch):
            rng, sub = jax.random.split(rng)
            params, stats, opt_state, logs = step_fn(
                params, stats, opt_state, jnp.asarray(clips),
                jnp.asarray(labels), sub)
            record(logs, "")
            if it % use_aux_per_niter == 0:
                for idx, n_times in enumerate(aux_times):
                    for _ in range(n_times):
                        try:
                            aclips, alabels = next(aux_iters[idx])
                        except StopIteration:
                            break
                        rng, sub = jax.random.split(rng)
                        params, stats, opt_state, logs = step_fn(
                            params, stats, opt_state, jnp.asarray(aclips),
                            jnp.asarray(alabels), sub)
                        record(logs, f"/aux{idx}")
            it += 1
        history.append({"epoch": epoch,
                        **{k: v / counts[k] for k, v in logs_sum.items()}})
        if epoch_callback is not None:
            epoch_callback(epoch, {"params": params, "batch_stats": stats,
                                   "opt_state": opt_state, "it": it})
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, history


def evaluate_classification(model, params, batches, stats=None) -> dict:
    """batches: iterable of (videos, labels, n_valid). Returns mmaction-style
    metrics (top_k_accuracy, mean_class_accuracy).  `stats`: batch_stats
    for BatchNorm backbones."""
    if stats is not None:
        jfn = jax.jit(lambda p, st, v: model.apply(
            {"params": p, "batch_stats": st}, v))
        fn = lambda p, v: jfn(p, stats, v)
    else:
        fn = jax.jit(lambda p, v: model.apply({"params": p}, v))
    scores, labels = [], []
    for videos, lab, n in batches:
        s = np.asarray(fn(params, videos))[:n]
        scores.extend(list(s))
        labels.extend(list(np.asarray(lab)[:n]))
    top1, top5 = top_k_accuracy(scores, labels, (1, min(5, scores[0].shape[0])))
    return {"top1_acc": top1, "top5_acc": top5,
            "mean_class_accuracy": mean_class_accuracy(scores, labels)}


def make_tpn_train_step_stats(model, tx, bf16: bool = False):
    """Train step for TPNRecognizer: the neck's auxiliary CE
    (loss_aux, weight cfg.aux_loss_weight) joins the classifier CE like
    the reference's losses dict (necks/tpn.py AuxHead)."""

    def loss_fn(params, stats, videos, labels, rng):
        if bf16:
            params = _cast_tree(params, jnp.bfloat16)
            videos = videos.astype(jnp.bfloat16)
        (scores, aux), new = model.apply(
            {"params": params, "batch_stats": stats}, videos, train=True,
            target=labels, rngs=_train_rngs(rng), mutable=["batch_stats"])
        scores = scores.astype(jnp.float32)
        loss_cls = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        loss = loss_cls + aux.get("loss_aux", 0.0)
        acc = (scores.argmax(-1) == labels).mean()
        new_stats = (_cast_tree(new["batch_stats"], jnp.float32)
                     if bf16 else new["batch_stats"])
        return loss, (acc, loss_cls, new_stats)

    def step(state: RecTrainState, stats, videos, labels, rng):
        (loss, (acc, loss_cls, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, stats, videos, labels, rng)
        if bf16:
            grads = _cast_tree(grads, jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1), stats,
                {"loss": loss, "loss_cls": loss_cls, "top1_acc": acc})

    return jax.jit(step)
