"""LINAS dual-encoder training CLI.

Parity surface for LINAS-engine/trainer.py:109-449: epoch loop with
per-epoch validation (rsum selection metric), best-checkpoint keeping,
LR decay x0.99/epoch + x0.5 after 3 non-improving epochs, early stop after
6, and a final tester pass (the reference shells out to tester.py,
trainer.py:324-328 — here it is a function call).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from ..models.dual_encoding import DualEncoding, DualEncodingConfig
from ..train.checkpoint import best_checkpoint_manager, save_checkpoint
from ..train.linas_trainer import (EpochScheduler, LinasTrainConfig,
                                   TrainState, get_learning_rate,
                                   init_mask_state, init_train_state,
                                   make_mask_optimizer, make_mask_train_step,
                                   make_optimizer, make_train_step,
                                   mask_matrix)
from .common import load_dataset
from .retrieval_tester import evaluate


def train(model_cfg: DualEncodingConfig, train_cfg: LinasTrainConfig,
          train_set, val_set, out_dir: str, batch_size: int = 128,
          seed: int = 0, log_every: int = 10, num_epochs: int | None = None,
          resume: str | None = None, checkpoint_interval: int = 0):
    from ..train.resume import load_train_state, save_train_state

    model = DualEncoding(model_cfg)
    tx = make_optimizer(train_cfg)

    first = next(train_set.train_batches(batch_size, seed))
    videos0, text0, support0, _ = first
    state = init_train_state(model, tx, videos0, text0, support0, seed)
    step_fn = make_train_step(model, train_cfg, tx)
    # 'adapt' similarity distill: the learned (pa1, pa2) mask trains in a
    # second lr x10 step (reference model.py:584-598 optimizer2 +
    # train_mask :896-912)
    use_adapt = (train_cfg.distill_with_similarity
                 and train_cfg.similarity_type == "adapt")
    if use_adapt:
        tx2 = make_mask_optimizer(train_cfg)
        mask_state = init_mask_state(tx2)
        mask_step = make_mask_train_step(model, tx2)
    scheduler = EpochScheduler(train_cfg)
    save_best = best_checkpoint_manager(out_dir)
    rng = jax.random.key(seed + 1)

    start_epoch = 0
    if resume:
        payload, loop = load_train_state(
            resume, {"state": state} | ({"mask": tuple(mask_state)}
                                        if use_adapt else {}))
        state = payload["state"]
        if use_adapt and "mask" in payload:
            # the learned adapt mask (pa + its Adam state) resumes too —
            # resetting it to init would train with a wrong similarity
            # mask after resume
            mask_state = type(mask_state)(*payload["mask"])
        start_epoch = int(loop.get("epoch", -1)) + 1
        scheduler.best = float(loop.get("best", -np.inf))
        scheduler.no_impr = int(loop.get("no_impr", 0))
        scheduler.since_halve = int(loop.get("since_halve", 0))
        print(f"resumed from {resume}: epoch {start_epoch}, "
              f"best={scheduler.best:.2f}")

    history = []
    epochs = num_epochs or train_cfg.num_epochs
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for i, (videos, text, support, n) in enumerate(
                train_set.train_batches(batch_size, seed + epoch)):
            rng, sub = jax.random.split(rng)
            if use_adapt:
                adapt = mask_matrix(mask_state.pa, videos.frames.shape[0])
                state, logs = step_fn(state, videos, text, support, sub,
                                      adapt)
                mask_state, _mask_loss = mask_step(mask_state, state,
                                                   videos, text, support)
            else:
                state, logs = step_fn(state, videos, text, support, sub)
            losses.append(float(logs["loss"]))
            if log_every and i % log_every == 0:
                print(f"epoch {epoch} step {i}: loss={losses[-1]:.3f} "
                      f"lr={get_learning_rate(state):.2e}")

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, report = evaluate(model, variables, val_set, batch_size)
        rsum = report["rsum"]
        state, is_best, stop = scheduler.on_epoch_end(state, rsum)
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "rsum": rsum, "lr": get_learning_rate(state),
                        "time": time.time() - t0})
        print(f"epoch {epoch}: mean_loss={history[-1]['loss']:.3f} "
              f"rsum={rsum:.2f} best={scheduler.best:.2f}"
              f"{' *' if is_best else ''}")
        if is_best:
            save_best(variables, model_cfg, rsum, {"epoch": epoch})
        with open(os.path.join(out_dir, "val_metric_hist.txt"), "a") as f:
            f.write(f"{epoch} {rsum:.4f}\n")
        if checkpoint_interval and (epoch + 1) % checkpoint_interval == 0:
            payload = {"state": state}
            if use_adapt:
                payload["mask"] = tuple(mask_state)
            save_train_state(
                os.path.join(out_dir, f"epoch_{epoch}"), payload,
                {"epoch": epoch, "best": scheduler.best,
                 "no_impr": scheduler.no_impr,
                 "since_halve": scheduler.since_halve})
        if stop:
            print(f"early stop at epoch {epoch}")
            break

    return state, history, os.path.join(out_dir, "model_best")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--rootpath", required=True)
    parser.add_argument("--trainCollection", required=True)
    parser.add_argument("--valCollection", required=True)
    parser.add_argument("--visual_feature", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_epochs", type=int, default=50)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--support_set_number", type=int, default=8)
    parser.add_argument("--style", default="distill_from_best_model")
    parser.add_argument("--student_model", default="de+map")
    parser.add_argument("--visual_feat_dim", type=int, default=2048)
    parser.add_argument("--config_json", default=None,
                        help="JSON dict of DualEncodingConfig overrides")
    parser.add_argument("--resume", default=None,
                        help="epoch_N train-state dir to resume from")
    parser.add_argument("--checkpoint_interval", type=int, default=0,
                        help="save full train state every N epochs")
    args = parser.parse_args(argv)

    train_set = load_dataset(args.rootpath, args.trainCollection,
                             args.visual_feature,
                             support_set_number=args.support_set_number)
    val_set = load_dataset(args.rootpath, args.valCollection,
                           args.visual_feature)
    overrides = json.loads(args.config_json) if args.config_json else {}
    for key in ("visual_kernel_sizes", "text_kernel_sizes"):
        if key in overrides:
            overrides[key] = tuple(overrides[key])
    model_cfg = DualEncodingConfig(
        visual_feat_dim=args.visual_feat_dim,
        vocab_size=len(train_set.vocab),
        bow_vocab_size=train_set.bow2vec.ndims,
        style=args.style, student_model=args.student_model, **overrides)
    train_cfg = LinasTrainConfig(learning_rate=args.learning_rate,
                                 num_epochs=args.num_epochs)
    os.makedirs(args.out_dir, exist_ok=True)
    state, history, best = train(model_cfg, train_cfg, train_set, val_set,
                                 args.out_dir, args.batch_size,
                                 resume=args.resume,
                                 checkpoint_interval=args.checkpoint_interval)
    # a resume with no epochs left legitimately yields an empty history
    print(json.dumps(history[-1] if history else {"resumed_complete": True}))
    return history


if __name__ == "__main__":
    main()
