"""Pod-scale checkpointing: orbax CheckpointManager over sharded state.

The msgpack path (train/checkpoint.py, train/resume.py) is the simple
single-host format every CLI uses.  This module is the multi-host/async
tier for training at pod scale: orbax writes each shard from the host
that owns it, keeps `max_to_keep` rolling steps, and restores directly
onto the target shardings (no host-side gather of a multi-GB state).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax


class ShardedCheckpointer:
    """Rolling sharded checkpoints for a training-state pytree."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=async_save)
        self.manager = ocp.CheckpointManager(
            os.path.abspath(directory), options=options)

    def save(self, step: int, state: Any,
             loop_state: Optional[Dict] = None) -> None:
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(state),
            **({"loop": self._ocp.args.JsonSave(loop_state)}
               if loop_state is not None else {}))
        self.manager.save(step, args=args)

    def restore(self, template: Any, step: Optional[int] = None
                ) -> Tuple[Any, Dict, int]:
        """template: a pytree of like-structured (possibly sharded) arrays
        — the restored leaves adopt its shardings.  Returns
        (state, loop_state, step)."""
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        target = jax.tree.map(
            lambda x: self._ocp.utils.to_shape_dtype_struct(x)
            if hasattr(self._ocp.utils, "to_shape_dtype_struct") else x,
            template)
        # only request items the checkpoint actually contains — asking
        # for 'loop' on a save(step, state) checkpoint (loop_state=None)
        # raises KeyError inside orbax
        try:
            present = set(self.manager.item_metadata(step).keys())
        except Exception:
            present = {"state", "loop"}
        items = {"state": self._ocp.args.StandardRestore(target)}
        if "loop" in present:
            items["loop"] = self._ocp.args.JsonRestore()
        restored = self.manager.restore(
            step, args=self._ocp.args.Composite(**items))
        loop = restored.get("loop") or {}
        return restored["state"], loop, step

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        """Block until pending async saves land (call before exit)."""
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
