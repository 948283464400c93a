"""LINAS dual-encoder training: distillation + triplet, pjit data-parallel.

Re-implements the reference training semantics (LINAS-engine/model.py:916-
1004 `train_emb`, trainer.py:270-419) as one compiled XLA step:

* loss mix per style/student_model:
    - de+map / map:   alpha * distill(student_cap, stop_grad(cap))
                      [+ triplet(student_cap, vid or stop_grad(vid))]
    - text+video:     alpha * distill_text [+ video_alpha * distill_video]
                      + triplet(student) + beta * similarity_distill
    - GT:             triplet(cap, vid)
* torch-parity optimizer: Adam/RMSprop + global-norm grad clip (=2);
* epoch-level LR schedule: *0.99 each epoch, *0.5 after 3 non-improving
  epochs, early stop after 6 (trainer.py:298-315) — driven host-side via
  optax.inject_hyperparams;
* BatchNorm running stats carried in `batch_stats`.

The whole step runs under jit with the batch sharded over the mesh 'data'
axis; gradient reduction is the psum GSPMD inserts (the reference's DDP
allreduce).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.distill import (adaptive_similarity_loss, kl_distill,
                              mse_distill, similarity_distill)
from ..losses.triplet import TripletLossConfig, triplet_loss
from ..models.dual_encoding import DualEncoding, TextBatch, VideoBatch


@dataclasses.dataclass(frozen=True)
class LinasTrainConfig:
    learning_rate: float = 1e-4
    lr_decay_rate: float = 0.99
    grad_clip: float = 2.0
    optimizer: str = "adam"           # | 'rmsprop'
    # loss mix (reference trainer defaults)
    loss_fun: str = "mrl"
    margin: float = 0.2
    direction: str = "all"
    max_violation: bool = False
    cost_style: str = "sum"
    measure: str = "cosine"
    alpha: float = 0.2
    beta: float = 1.0
    video_alpha: float = 1.0
    distill_type: str = "mse"         # 'mse' | 'kl' | 'mse+kl' | 'cross'
    distill_loss: str = "text"        # 'text' | 'video' | 'text+video'
    distill_with_triplet: bool = True
    distill_with_similarity: bool = False
    similarity_type: Optional[str] = None
    with_detach: bool = True
    finetune_vid: bool = False
    # schedule
    num_epochs: int = 50
    lr_halve_patience: int = 3
    early_stop_patience: int = 6


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: LinasTrainConfig):
    def base(learning_rate):
        opt = (optax.rmsprop(learning_rate) if cfg.optimizer == "rmsprop"
               else optax.adam(learning_rate))
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)

    return optax.inject_hyperparams(base)(learning_rate=cfg.learning_rate)


def _distill(cfg: LinasTrainConfig, student, teacher):
    red = cfg.cost_style  # 'sum' | 'mean' like the torch size_average flag
    if cfg.distill_type == "mse":
        return mse_distill(student, teacher, red)
    if cfg.distill_type == "kl":
        return kl_distill(student, teacher, red)
    if cfg.distill_type == "mse+kl":
        return (mse_distill(student, teacher, red)
                + kl_distill(student, teacher, red))
    # 'cross' spans both towers and is handled at the call site
    # (MSE on text + KL on video, model.py:926-927)
    raise ValueError(f"per-tensor distill got type {cfg.distill_type!r}")


def make_train_step(model: DualEncoding, cfg: LinasTrainConfig, tx,
                    mesh=None):
    """mesh: optional jax.sharding.Mesh — batches shard over the 'data'
    axis, params/optimizer replicate; GSPMD inserts the gradient psum
    (the DDP-allreduce equivalent).  None = single-device jit."""
    mcfg = model.cfg
    tl_cfg = TripletLossConfig(cfg.margin, cfg.measure, cfg.max_violation,
                               cfg.cost_style, cfg.direction)

    def loss_fn(params, batch_stats, videos, text, support, rng,
                adapt_mask):
        variables = {"params": params, "batch_stats": batch_stats}
        # with_detach also detaches the teacher FEATURE inside the
        # forward (model.py:685-687 student_text_mapping(cap_enc
        # .detach())) so the student path can't backprop into the
        # teacher text encoder — the loss-level stop_gradient on the
        # teacher targets alone would not stop that path
        out, mutated = model.apply(
            variables, videos, text, support, train=True,
            detach_teacher_feature=cfg.with_detach,
            mutable=["batch_stats"], rngs={"dropout": rng})
        logs = {}
        sg = jax.lax.stop_gradient
        if mcfg.style == "GT":
            loss = triplet_loss(out["cap_emb"], out["vid_emb"], tl_cfg)
            logs["triplet"] = loss
        elif mcfg.student_model == "text+video":
            cap_t = sg(out["cap_emb"])
            vid_t = sg(out["vid_emb"])
            if cfg.distill_loss == "text+video":
                if cfg.distill_type == "cross":
                    # 'cross' = MSE on the text tower + KL on the video
                    # tower, unweighted (model.py:926-927)
                    loss1 = (mse_distill(out["student_cap_emb"], cap_t,
                                         cfg.cost_style)
                             + kl_distill(out["student_vid_emb"], vid_t,
                                          cfg.cost_style))
                else:
                    loss1 = (_distill(cfg, out["student_cap_emb"], cap_t)
                             + cfg.video_alpha *
                             _distill(cfg, out["student_vid_emb"], vid_t))
            elif cfg.distill_loss == "video":
                loss1 = _distill(cfg, out["student_vid_emb"], vid_t)
            else:
                loss1 = _distill(cfg, out["student_cap_emb"], cap_t)
            loss = cfg.alpha * loss1
            logs["distill"] = loss1
            if cfg.distill_with_triplet:
                loss2 = triplet_loss(out["student_cap_emb"],
                                     out["student_vid_emb"], tl_cfg)
                loss = loss + loss2
                logs["triplet"] = loss2
            if cfg.distill_with_similarity:
                # 'adapt': the learned mask weights the huber terms but is
                # itself detached here (model.py:862-866); it trains in
                # the separate lr x10 step (make_mask_train_step)
                loss3 = similarity_distill(
                    vid_t, cap_t, out["student_vid_emb"],
                    out["student_cap_emb"], cfg.similarity_type,
                    adapt_weight=(None if adapt_mask is None
                                  else sg(adapt_mask)),
                    reduction=cfg.cost_style)
                loss = loss + cfg.beta * loss3
                logs["similarity"] = loss3
        else:  # 'map' / 'de+map'
            cap_t = sg(out["cap_emb"]) if cfg.with_detach else out["cap_emb"]
            loss2 = _distill(cfg, out["student_cap_emb"], cap_t)
            loss = cfg.alpha * loss2
            logs["distill"] = loss2
            if cfg.distill_with_triplet:
                vid = (sg(out["vid_emb"])
                       if cfg.with_detach and not cfg.finetune_vid
                       else out["vid_emb"])
                loss3 = triplet_loss(out["student_cap_emb"], vid, tl_cfg)
                loss = loss + loss3
                logs["triplet"] = loss3
        logs["loss"] = loss
        return loss, (mutated["batch_stats"], logs)

    def train_step(state: TrainState, videos: VideoBatch, text: TextBatch,
                   support: Optional[TextBatch], rng, adapt_mask=None):
        (loss, (new_bs, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   videos, text, support, rng, adapt_mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_bs, opt_state), logs

    if mesh is None:
        return jax.jit(train_step)

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def shard_batch_tree(tree):
        return jax.tree.map(
            lambda x: batch_sh if getattr(x, "ndim", 0) >= 1 else repl, tree)

    # build the sharded jit lazily once per batch structure
    cache = {}

    def step(state, videos, text, support, rng, adapt_mask=None):
        key = (support is None, adapt_mask is None)
        if key not in cache:
            in_sh = (jax.tree.map(lambda _: repl, state),
                     shard_batch_tree(videos), shard_batch_tree(text),
                     None if support is None else shard_batch_tree(support),
                     repl, None if adapt_mask is None else repl)
            cache[key] = jax.jit(train_step, in_shardings=in_sh)
        return cache[key](state, videos, text, support, rng, adapt_mask)

    return step


# ---------------------------------------------------------------------------
# 'adapt' similarity mask: pa1*I + pa2*(1-I) trained at lr x10
# (model.py:584-598 second optimizer, :896-912 train_mask)
# ---------------------------------------------------------------------------

class MaskState(NamedTuple):
    pa: jnp.ndarray          # (2,) = [pa1 (diagonal), pa2 (off-diagonal)]
    opt_state: Any


def mask_matrix(pa: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    eye = jnp.eye(batch_size, dtype=pa.dtype)
    return pa[0] * eye + pa[1] * (1.0 - eye)


def make_mask_optimizer(cfg: LinasTrainConfig):
    """Adam at 10x the model LR over (pa1, pa2) — reference optimizer2."""
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                       optax.adam(10.0 * cfg.learning_rate))


def init_mask_state(tx2) -> MaskState:
    pa = jnp.ones((2,), jnp.float32)       # reference init: both 1
    return MaskState(pa, tx2.init(pa))


def make_mask_train_step(model: DualEncoding, tx2):
    """One compiled train_mask step: embeddings computed without gradient
    (the reference runs forward_emb under no_grad), the adaptive
    similarity loss backprops only into (pa1, pa2)."""

    @jax.jit
    def step(pa, opt_state, params, batch_stats, videos, text, support):
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(variables, videos, text, support, train=False)
        embs = jax.lax.stop_gradient(
            (out["vid_emb"], out["cap_emb"], out["student_vid_emb"],
             out["student_cap_emb"]))

        def loss_fn(pa):
            mask = mask_matrix(pa, embs[0].shape[0])
            return adaptive_similarity_loss(*embs, mask)

        loss, grads = jax.value_and_grad(loss_fn)(pa)
        updates, opt_state = tx2.update(grads, opt_state, pa)
        return optax.apply_updates(pa, updates), opt_state, loss

    def train_mask(mask_state: MaskState, state: TrainState, videos, text,
                   support):
        pa, opt_state, loss = step(mask_state.pa, mask_state.opt_state,
                                   state.params, state.batch_stats, videos,
                                   text, support)
        return MaskState(pa, opt_state), float(loss)

    return train_mask


def init_train_state(model: DualEncoding, tx, videos, text, support,
                     seed: int = 0) -> TrainState:
    variables = model.init(jax.random.key(seed), videos, text, support)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return TrainState(state.params, state.batch_stats, opt_state)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


class EpochScheduler:
    """Host-side LR decay + early stop (trainer.py:298-315)."""

    def __init__(self, cfg: LinasTrainConfig):
        self.cfg = cfg
        self.best = -np.inf
        self.no_impr = 0
        self.since_halve = 0      # reference lr_counter: epochs since
                                  # the LAST halve, not consecutive bads

    def on_epoch_end(self, state: TrainState, score: float
                     ) -> Tuple[TrainState, bool, bool]:
        """Returns (state, is_best, should_stop).  Reference semantics
        (trainer.py:298-307): halve on ANY non-improving epoch, but use
        each learning rate for at least `lr_halve_patience` epochs."""
        lr = get_learning_rate(state) * self.cfg.lr_decay_rate
        self.since_halve += 1
        is_best = score > self.best
        if is_best:
            self.best = score
            self.no_impr = 0
        else:
            self.no_impr += 1
            if self.since_halve >= self.cfg.lr_halve_patience:
                lr *= 0.5
                self.since_halve = 0
        state = set_learning_rate(state, lr)
        stop = self.no_impr >= self.cfg.early_stop_patience
        return state, is_best, stop
