"""composed_validate flow + GT-style LINAS training coverage."""

import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from fixtures import make_collection, tiny_config

from cross_modal_video_engine_tpu.cli.common import load_dataset
from cross_modal_video_engine_tpu.cli.composed_validate import validate
from cross_modal_video_engine_tpu.data.composed_dataset import (
    ComposedVideoDataset, FeatureStore, save_video_features)
from cross_modal_video_engine_tpu.models.combiner import (
    Combiner, CombinerConfig)
from cross_modal_video_engine_tpu.models.dual_encoding import DualEncoding
from cross_modal_video_engine_tpu.train.linas_trainer import (
    LinasTrainConfig, init_train_state, make_optimizer, make_train_step)

rng = np.random.default_rng(271)


def test_composed_validate_flow(tmp_path):
    D = 10
    feat_dir = str(tmp_path / "feats")
    os.makedirs(feat_dir)
    for i in range(5):
        for prefix in ("a", "b"):
            x = rng.standard_normal((6, D)).astype(np.float32)
            save_video_features(os.path.join(feat_dir, f"{prefix}{i}.npz"),
                                x, np.repeat(x[:, None], 4, 1))
    tsv = str(tmp_path / "t.tsv")
    with open(tsv, "w") as f:
        for i in range(5):
            f.write(f"a{i}\tb{i}\tmod {i}\tmain\tc\n")
    ds = ComposedVideoDataset(tsv, FeatureStore({"main": feat_dir}),
                              frames=4, tokens=4)
    comb = Combiner(CombinerConfig(clip_feature_dim=D, projection_dim=8,
                                   hidden_dim=12, n_heads=2))
    b = next(ds.batches(5))
    text = jnp.asarray(rng.standard_normal((5, D)), jnp.float32)
    variables = comb.init(jax.random.key(0),
                          (jnp.asarray(b["ref_high"]),
                           jnp.asarray(b["ref_middle"])), text,
                          (jnp.asarray(b["target_high"]),
                           jnp.asarray(b["target_middle"])))

    def text_fn(captions):
        return jnp.asarray(rng.standard_normal((len(captions), D)),
                           jnp.float32)

    order, report = validate(comb, variables, ds, text_fn, batch_size=5)
    assert report["n_queries"] == 5
    assert order.shape == (5, 10)
    # the masked reference video is never ranked first
    assert not np.any(order[:, 0] == np.asarray(b["ref_rows"]))
    assert 0 <= report["recall_at1"] <= 100
    assert report["recall_at10"] == 100.0       # 10 candidates total


@pytest.mark.full    # full lane: GT-replica trainer parity; test_composed_validate_flow keeps the eval default
def test_gt_style_training(tmp_path):
    """style='GT': plain triplet training (trainer GT branch)."""
    info = make_collection(str(tmp_path), n_videos=6, caps_per_video=2)
    ds = load_dataset(str(tmp_path), info["collection"], info["feature"],
                      support_set_number=2)
    cfg = tiny_config(info, style="GT")
    tcfg = LinasTrainConfig(learning_rate=5e-3, cost_style="mean")
    model = DualEncoding(cfg)
    tx = make_optimizer(tcfg)
    videos, text, support, _ = next(ds.train_batches(6, 0))
    state = init_train_state(model, tx, videos, text, support)
    step = make_train_step(model, tcfg, tx)
    k = jax.random.key(0)
    losses = []
    for i in range(10):
        k, sub = jax.random.split(k)
        state, logs = step(state, videos, text, support, sub)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0]
    assert "triplet" in logs
