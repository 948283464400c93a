"""Full training-state checkpointing and resume.

The reference's recovery story is restart-with-resume (LINAS trainer.py
--resume restores model+optimizer+epoch+best_rsum :247-261; mmcv
runner.resume does the same, apis/train.py:225-228).  Here the complete
TrainState (params, batch_stats, optimizer state) plus host-side loop
state (epoch, best score, rng seed) round-trips through one msgpack blob.

Orbax is available in the image; this module uses flax serialization
directly so the blob is dependency-light and diffable — swap in
orbax.checkpoint.CheckpointManager for async multi-host snapshots when
training at pod scale.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_train_state(path: str, state: Any, loop_state: Optional[Dict] = None
                     ) -> None:
    """state: any pytree (e.g. linas_trainer.TrainState)."""
    os.makedirs(path, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state)
    with open(os.path.join(path, "train_state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host))
    with open(os.path.join(path, "loop_state.json"), "w") as f:
        json.dump(loop_state or {}, f)


def load_train_state(path: str, template: Any) -> Tuple[Any, Dict]:
    """template: a TrainState with the same structure (e.g. freshly
    initialized) — dtypes/shapes are restored onto it."""
    with open(os.path.join(path, "train_state.msgpack"), "rb") as f:
        state = serialization.from_bytes(template, f.read())
    loop_state = {}
    p = os.path.join(path, "loop_state.json")
    if os.path.exists(p):
        with open(p) as f:
            loop_state = json.load(f)
    return state, loop_state


def latest_checkpoint(root: str, prefix: str = "epoch_") -> Optional[str]:
    """Find the newest `{prefix}{n}` dir under root (mmcv latest.pth
    analogue)."""
    if not os.path.isdir(root):
        return None
    best = None
    best_n = -1
    for d in os.listdir(root):
        if d.startswith(prefix):
            try:
                n = int(d[len(prefix):])
            except ValueError:
                continue
            if n > best_n:
                best_n, best = n, os.path.join(root, d)
    return best
