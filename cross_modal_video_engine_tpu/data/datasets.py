"""Recognition datasets (mmaction datasets family).

Rebuilds of MCT/mmaction/datasets:

* `VideoDataset` — `filename label` annotation lines, decode+pipeline per
  sample (video_dataset.py);
* `RawframeDataset` — `frame_dir total_frames label` lines, frames read as
  `img_{idx:05d}.jpg` (rawframe_dataset.py);
* `VideoDatasetRelseq` — `filename a,b->c->d` label-sequence annotations
  expanded to a (max_len, num_classes) multi-hot matrix + mask
  (video_dataset_relseq.py:17-79);
* `ShardedSampler` — deterministic per-epoch shard split, the
  jax.process-level replacement for DistributedSampler
  (samplers/distributed_sampler.py:11-53): same seeded shuffle on every
  host, each host takes its contiguous stride slice.

Batches come out dense and fixed-shape (tail padded, `n_valid` reported).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .pipelines import Compose


class BaseVideoDataset:
    def __init__(self, ann_file: str, pipeline: Compose,
                 data_prefix: Optional[str] = None, start_index: int = 0):
        self.ann_file = ann_file
        self.pipeline = pipeline
        self.data_prefix = data_prefix
        self.start_index = start_index
        self.video_infos = self.load_annotations()

    def load_annotations(self) -> List[Dict]:
        raise NotImplementedError

    def __len__(self) -> int:
        return len(self.video_infos)

    def __getitem__(self, idx: int) -> Dict:
        results = dict(self.video_infos[idx])
        results.setdefault("start_index", self.start_index)
        return self.pipeline(results)

    def batches(self, batch_size: int, order: Optional[Sequence[int]] = None
                ) -> Iterator[Tuple[np.ndarray, List[Dict], int]]:
        order = list(order if order is not None else range(len(self)))
        for i in range(0, len(order), batch_size):
            sel = order[i:i + batch_size]
            n = len(sel)
            while len(sel) < batch_size:
                sel.append(sel[0])
            items = [self[j] for j in sel]
            imgs = np.stack([it["imgs"] for it in items])
            yield imgs, items, n


class VideoDataset(BaseVideoDataset):
    def load_annotations(self) -> List[Dict]:
        infos = []
        with open(self.ann_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                filename, label = parts[0], int(parts[1])
                if self.data_prefix:
                    filename = os.path.join(self.data_prefix, filename)
                infos.append(dict(filename=filename, label=label))
        return infos


class RawframeDataset(BaseVideoDataset):
    filename_tmpl = "img_{:05d}.jpg"

    def __init__(self, *args, **kwargs):
        # mmaction rawframe convention: frames are 1-based on disk and
        # start_index defaults to 1 (rawframe_dataset.py); frame_inds
        # then index the template DIRECTLY (RawFrameDecode adds no
        # offset, so start_index=1 configs port 1:1)
        kwargs.setdefault("start_index", 1)
        super().__init__(*args, **kwargs)

    def load_annotations(self) -> List[Dict]:
        infos = []
        with open(self.ann_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                frame_dir, total, label = parts[0], int(parts[1]), int(parts[2])
                if self.data_prefix:
                    frame_dir = os.path.join(self.data_prefix, frame_dir)
                infos.append(dict(frame_dir=frame_dir, total_frames=total,
                                  label=label,
                                  filename_tmpl=self.filename_tmpl))
        return infos


class VideoDatasetRelseq(BaseVideoDataset):
    """Label-sequence dataset for the caption head."""

    def __init__(self, ann_file: str, pipeline: Compose, num_classes: int,
                 max_len: int = 5, **kwargs):
        self.num_classes = num_classes
        self.max_len = max_len
        super().__init__(ann_file, pipeline, **kwargs)

    def load_annotations(self) -> List[Dict]:
        infos = []
        with open(self.ann_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                filename, label = parts[0], parts[1]
                steps = label.split("->")
                mat = np.zeros((self.max_len, self.num_classes), np.float32)
                mask = np.zeros((self.max_len,), np.float32)
                for t, step in enumerate(steps[: self.max_len]):
                    for rel in step.split(","):
                        if rel != "":
                            mat[t, int(rel)] = 1.0
                    mask[t] = 1.0
                if self.data_prefix:
                    filename = os.path.join(self.data_prefix, filename)
                infos.append(dict(filename=filename, label=mat, mask=mask))
        return infos


class ShardedSampler:
    """Deterministic shuffled shard per (epoch, host) — the DistributedSampler
    equivalent for multi-process JAX: every host computes the same
    permutation, takes rank::world_size, pads to equal length."""

    def __init__(self, n: int, world_size: int = 1, rank: int = 0,
                 shuffle: bool = True, seed: int = 0):
        self.n = n
        self.world_size = world_size
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed

    def indices(self, epoch: int) -> List[int]:
        order = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        per = int(np.ceil(self.n / self.world_size))
        # np.resize tiles cyclically, so even n < world_size fills every
        # rank (a slice-pad would leave short ranks with fewer steps and
        # hang multi-host lockstep collectives)
        padded = np.resize(order, per * self.world_size)
        return list(padded[self.rank::self.world_size])


class ClassSpecificSampler(ShardedSampler):
    """Per-class probability sampler — ClassSpecificDistributedSampler
    equivalent (reference samplers/distributed_sampler.py:54-140).

    `class_prob` maps label -> sampling weight.  dynamic_length=True
    oversamples/subsamples each class (prob//1 full copies + a random
    remainder subset, so the epoch length changes); dynamic_length=False
    keeps the original length and draws a weighted multinomial with
    replacement.  Sharding/padding semantics follow ShardedSampler.
    """

    def __init__(self, labels: Sequence[int], class_prob: Dict[int, float],
                 world_size: int = 1, rank: int = 0, shuffle: bool = True,
                 seed: int = 0, dynamic_length: bool = True):
        super().__init__(len(labels), world_size, rank, shuffle, seed)
        self.labels = list(labels)
        self.class_prob = dict(class_prob)
        self.dynamic_length = dynamic_length

    def indices(self, epoch: int) -> List[int]:
        rng = np.random.default_rng(self.seed + epoch)
        class_indices: Dict[int, List[int]] = {}
        for i, lb in enumerate(self.labels):
            class_indices.setdefault(lb, []).append(i)

        if self.dynamic_length:
            chosen: List[int] = []
            for k, prob in self.class_prob.items():
                members = class_indices.get(k, [])
                if not members:
                    continue
                chosen.extend(members * int(prob // 1))
                rem = int((prob % 1) * len(members))
                if rem:
                    pick = rng.permutation(len(members))[:rem]
                    chosen.extend(members[j] for j in pick)
            order = np.asarray(chosen)
            if self.shuffle:
                rng.shuffle(order)
        else:
            probs = np.asarray([
                self.class_prob.get(lb, 0.0) / len(class_indices[lb])
                for lb in self.labels], np.float64)
            probs = probs / probs.sum()
            order = rng.choice(len(self.labels), size=len(self.labels),
                               replace=True, p=probs)

        n = len(order)
        per = int(np.ceil(n / self.world_size))
        padded = np.resize(order, per * self.world_size)  # cyclic pad
        return list(padded[self.rank::self.world_size])


class AudioDataset(BaseVideoDataset):
    """`audio_path total_frames label` lines (audio_dataset.py:13-67); paths
    get `suffix` appended unless already present."""

    def __init__(self, ann_file: str, pipeline: Compose,
                 suffix: str = ".wav", **kwargs):
        self.suffix = suffix
        super().__init__(ann_file, pipeline, **kwargs)

    def load_annotations(self) -> List[Dict]:
        infos = []
        with open(self.ann_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                path, total, label = parts[0], int(parts[1]), int(parts[2])
                if not path.endswith(self.suffix):
                    path = path + self.suffix
                if self.data_prefix:
                    path = os.path.join(self.data_prefix, path)
                infos.append(dict(audio_path=path, total_frames=total,
                                  label=label))
        return infos


class AudioFeatureDataset(AudioDataset):
    """Offline spectrogram features, same annotation grammar with `.npy`
    paths (audio_feature_dataset.py:11-67)."""

    def __init__(self, ann_file: str, pipeline: Compose,
                 suffix: str = ".npy", **kwargs):
        super().__init__(ann_file, pipeline, suffix=suffix, **kwargs)


class AudioVisualDataset(RawframeDataset):
    """Rawframe annotations with parallel audio (and optional video) paths
    derived per row (audio_visual_dataset.py:9-77)."""

    def __init__(self, ann_file: str, pipeline: Compose, audio_prefix: str,
                 video_prefix: Optional[str] = None, **kwargs):
        self.audio_prefix = audio_prefix
        self.video_prefix = video_prefix
        super().__init__(ann_file, pipeline, **kwargs)

    def load_annotations(self) -> List[Dict]:
        infos = super().load_annotations()
        for info in infos:
            stem = os.path.basename(info["frame_dir"])
            info["audio_path"] = os.path.join(self.audio_prefix,
                                              stem + ".npy")
            if self.video_prefix:
                info["filename"] = os.path.join(self.video_prefix,
                                                stem + ".mp4")
        return infos


class RepeatDataset:
    """Repeat a dataset `times` times to cut epoch-boundary overhead
    (dataset_wrappers.py:8-36)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self) -> int:
        return self.times * len(self.dataset)

    def __getitem__(self, idx: int):
        return self.dataset[idx % len(self.dataset)]

    def batches(self, batch_size: int,
                order: Optional[Sequence[int]] = None):
        order = list(order if order is not None else range(len(self)))
        return BaseVideoDataset.batches(self, batch_size, order)  # type: ignore[arg-type]


class ConcatDataset:
    """Concatenate datasets end to end (dataset_wrappers.py:39-71)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        k = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        return self.datasets[k][idx - int(self._offsets[k])]

    def batches(self, batch_size: int,
                order: Optional[Sequence[int]] = None):
        order = list(order if order is not None else range(len(self)))
        return BaseVideoDataset.batches(self, batch_size, order)  # type: ignore[arg-type]


class ImageDataset(VideoDataset):
    """`image_path label[s]` lines — the OmniSource image branch
    (image_dataset.py:7-45); pipelines pair ImageDecode with
    BuildPseudoClip to make a pseudo video clip."""

    def __init__(self, ann_file: str, pipeline: Compose,
                 num_classes: Optional[int] = None, **kwargs):
        self.num_classes = num_classes
        super().__init__(ann_file, pipeline, **kwargs)

    def load_annotations(self) -> List[Dict]:
        infos = []
        with open(self.ann_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                filename, labels = parts[0], [int(x) for x in parts[1:]]
                if self.data_prefix:
                    filename = os.path.join(self.data_prefix, filename)
                # one-hot ALL rows when the dataset is multi-label
                # (num_classes given) — mixing per-row int and one-hot
                # labels would make batch collation ragged
                if self.num_classes:
                    onehot = np.zeros((self.num_classes,), np.float32)
                    onehot[labels] = 1.0
                    infos.append(dict(filename=filename, label=onehot))
                else:
                    assert len(labels) == 1, \
                        "multi-label rows need num_classes"
                    infos.append(dict(filename=filename, label=labels[0]))
        return infos


class RawVideoDataset(BaseVideoDataset):
    """`video_dir label num_clips positive_clip_inds...` lines
    (rawvideo_dataset.py:77-99) — untrimmed videos pre-cut into clip
    files, with the positive clip indices marked."""

    def load_annotations(self) -> List[Dict]:
        infos = []
        with open(self.ann_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                video_dir = parts[0]
                if self.data_prefix:
                    video_dir = os.path.join(self.data_prefix, video_dir)
                infos.append(dict(
                    video_dir=video_dir, label=int(parts[1]),
                    num_clips=int(parts[2]),
                    positive_clip_inds=[int(x) for x in parts[3:]]))
        return infos
