"""Multigrid training schedule (fixed-shape bucketed variant).

The reference's multigrid hooks (MCT/mmaction/utils/multigrid/
longshortcyclehook.py) vary batch size and resolution continuously —
hostile to XLA, which compiles per shape.  This variant keeps the
multigrid idea (train most steps at cheap shapes, finish at full shape)
with a SMALL FIXED SET of (batch, frames, resolution) buckets, so the
whole run compiles exactly len(buckets) programs.

Long cycle: epochs rotate through the buckets coarse->fine; short cycle:
within an epoch, steps rotate with a period.  LR scales linearly with the
effective batch like the reference hook.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class GridBucket:
    batch_size: int
    num_frames: int
    resolution: int

    @property
    def cost(self) -> float:
        return self.batch_size * self.num_frames * self.resolution ** 2


@dataclasses.dataclass(frozen=True)
class MultigridSchedule:
    buckets: Tuple[GridBucket, ...] = (
        GridBucket(64, 4, 112),
        GridBucket(32, 8, 112),
        GridBucket(16, 8, 224),
        GridBucket(8, 8, 224),
    )
    long_cycle_epochs: int = 2       # epochs per long-cycle stage
    short_cycle_period: int = 0      # 0 = long cycle only
    base_batch: int = 8
    base_lr: float = 0.1
    final_epochs: int = 2            # last epochs always use the last bucket

    def bucket_for(self, epoch: int, total_epochs: int,
                   step: int = 0) -> GridBucket:
        if epoch >= total_epochs - self.final_epochs:
            return self.buckets[-1]
        stage = (epoch // self.long_cycle_epochs) % len(self.buckets)
        if self.short_cycle_period:
            # short cycle alternates the long-cycle bucket with a coarser one
            if step % self.short_cycle_period == 0 and stage > 0:
                stage -= 1
        return self.buckets[stage]

    def lr_for(self, bucket: GridBucket) -> float:
        return self.base_lr * bucket.batch_size / self.base_batch

    def compiled_shapes(self) -> List[Tuple[int, int, int]]:
        return [(b.batch_size, b.num_frames, b.resolution)
                for b in self.buckets]
