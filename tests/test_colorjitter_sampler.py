"""ColorJitter pipeline op + ClassSpecificSampler behavior tests."""

import numpy as np

from cross_modal_video_engine_tpu.data.datasets import (ClassSpecificSampler,
                                                        ShardedSampler)
from cross_modal_video_engine_tpu.data.pipelines import (ColorJitter,
                                                         build_pipeline)

rng = np.random.default_rng(97)


def test_colorjitter_component_math():
    img = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    # contrast blends toward the grayscale MEAN (augmentations.py:1541-1543)
    gray_mean = (0.2989 * img[..., 0] + 0.587 * img[..., 1]
                 + 0.114 * img[..., 2]).mean()
    got = ColorJitter.adjust_contrast(img, 0.3)
    np.testing.assert_allclose(got, 0.3 * img + 0.7 * gray_mean, rtol=1e-5)
    # saturation blends toward per-pixel grayscale (:1546-1548)
    gray = np.stack([0.2989 * img[..., 0] + 0.587 * img[..., 1]
                     + 0.114 * img[..., 2]] * 3, -1)
    got = ColorJitter.adjust_saturation(img, 0.5)
    np.testing.assert_allclose(got, 0.5 * img + 0.5 * gray, rtol=1e-5)
    # hue: factor 0 is identity; any factor preserves value (max channel)
    np.testing.assert_allclose(ColorJitter.adjust_hue(img, 0.0), img,
                               atol=1e-3)
    rot = ColorJitter.adjust_hue(img, 0.25)
    np.testing.assert_allclose(rot.max(-1), img.max(-1), atol=1e-3)
    # full cycle returns the original
    np.testing.assert_allclose(ColorJitter.adjust_hue(img, 1.0), img,
                               atol=1e-3)


def test_colorjitter_pipeline_op():
    op = ColorJitter(seed=3)
    imgs = [rng.uniform(0, 255, (6, 6, 3)).astype(np.float32)
            for _ in range(4)]
    out = op({"imgs": [im.copy() for im in imgs]})
    assert len(out["imgs"]) == 4
    changed = any(not np.allclose(a, b) for a, b in zip(out["imgs"], imgs))
    assert changed
    assert all(im.min() >= 0 and im.max() <= 255 for im in out["imgs"])
    # zero-jitter config is an exact no-op
    noop = ColorJitter(brightness=0, contrast=0, saturation=0, hue=0,
                       seed=0)
    out = noop({"imgs": [im.copy() for im in imgs]})
    for a, b in zip(out["imgs"], imgs):
        np.testing.assert_allclose(a, b)
    # registry-built
    pipe = build_pipeline([dict(type="ColorJitter", brightness=0.2,
                                contrast=0.2, saturation=0.2, hue=0.05,
                                seed=1)])
    out = pipe({"imgs": [im.copy() for im in imgs]})
    assert len(out["imgs"]) == 4


def test_class_specific_sampler_dynamic():
    labels = [0] * 8 + [1] * 4
    s = ClassSpecificSampler(labels, {0: 0.5, 1: 2.0}, seed=5)
    idx = s.indices(0)
    counts = np.bincount([labels[i] for i in idx], minlength=2)
    # class 0 subsampled to ~4, class 1 oversampled to 8
    assert counts[0] == 4 and counts[1] == 8
    # deterministic per (seed, epoch), different across epochs
    assert idx == s.indices(0)
    assert idx != s.indices(1)


def test_class_specific_sampler_fixed_length_and_sharding():
    labels = [0] * 9 + [1] * 3
    s = ClassSpecificSampler(labels, {0: 1.0, 1: 3.0}, dynamic_length=False,
                             seed=2)
    idx = s.indices(0)
    assert len(idx) == len(labels)
    counts = np.bincount([labels[i] for i in idx], minlength=2)
    # weighted multinomial: class 1 drawn ~50% despite being 25% of data
    assert counts[1] >= len(labels) * 0.25

    # sharding partitions the epoch across ranks with equal lengths
    shards = [ClassSpecificSampler(labels, {0: 1.0, 1: 1.0}, world_size=3,
                                   rank=r, seed=0).indices(0)
              for r in range(3)]
    assert len({len(s_) for s_ in shards}) == 1
    assert len(sum(shards, [])) >= len(labels)


def test_external_adapter_registered():
    from cross_modal_video_engine_tpu.utils.registry import PIPELINES
    for name in ("TorchvisionTrans", "ImgaugTrans", "PytorchVideoTrans"):
        assert PIPELINES.get(name) is not None
