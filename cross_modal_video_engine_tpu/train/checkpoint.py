"""Checkpoint save/load.

Keeps the reference's semantics (LINAS trainer.py:287-295, 413-419):
  * the full model config ("opt") is embedded in the checkpoint, so
    inference tools can rebuild the model from the checkpoint alone;
  * `best_checkpoint_manager` mirrors save-if-best + delete-old-best.

Format: a directory with `config.json` (dataclass fields + metadata) and
`params.msgpack` (flax serialization of the variables pytree).  This is
the simple synchronous path every CLI uses; pod-scale training snapshots
sharded state asynchronously via train/orbax_ckpt.ShardedCheckpointer.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, (list, tuple)):
        return list(obj)
    return obj


def save_checkpoint(path: str, variables: Any, config: Any = None,
                    meta: Optional[Dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    host_vars = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), variables)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host_vars))
    blob = {"meta": meta or {}}
    if config is not None:
        blob["config"] = _to_jsonable(config)
        blob["config_class"] = type(config).__name__
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(blob, f, indent=1, default=str)


def load_checkpoint(path: str, template: Any = None
                    ) -> Tuple[Any, Dict, Dict]:
    """Returns (variables, config_dict, meta). If `template` (a matching
    variables pytree) is given, structure/dtypes are restored onto it;
    otherwise the raw msgpack state dict is returned."""
    with open(os.path.join(path, "config.json")) as f:
        blob = json.load(f)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        data = f.read()
    if template is not None:
        variables = serialization.from_bytes(template, data)
    else:
        variables = serialization.msgpack_restore(bytearray(data))
    return variables, blob.get("config", {}), blob.get("meta", {})


def best_checkpoint_manager(root: str):
    """Returns save_best(variables, config, score, meta) that keeps only the
    best checkpoint, like trainer.py:413-419."""
    state = {"best": -np.inf, "path": None}

    def save_best(variables, config, score, meta=None) -> bool:
        if score <= state["best"]:
            return False
        new_path = os.path.join(root, f"model_best_{score:.4f}")
        save_checkpoint(new_path, variables, config,
                        dict(meta or {}, score=float(score)))
        link = os.path.join(root, "model_best")
        if os.path.islink(link) or os.path.exists(link):
            if os.path.islink(link):
                os.unlink(link)
            else:
                shutil.rmtree(link)
        os.symlink(os.path.abspath(new_path), link)
        # guard the same-name case: a new best whose score formats to
        # the same 4-decimal string overwrote the directory in place —
        # deleting the "old" path would delete the fresh checkpoint
        if (state["path"] and state["path"] != new_path
                and os.path.exists(state["path"])):
            shutil.rmtree(state["path"])
        state["best"], state["path"] = score, new_path
        return True

    return save_best
