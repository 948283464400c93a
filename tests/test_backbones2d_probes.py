"""TSM/C3D/R2+1D backbones, interventions, precise BN, concept tags."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.backbones2d import (
    C3D, R2Plus1D, R2Plus1DConfig, TSMConfig, TSMResNet, temporal_shift)
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.explain.interventions import (
    temporal_shuffle_contrast, zero_out_tokens)
from cross_modal_video_engine_tpu.train.precise_bn import update_bn_stats
from cross_modal_video_engine_tpu.utils.concept_tags import (
    build_tag_vocab, video_tag_scores, write_tag_file)

rng = np.random.default_rng(231)


def test_temporal_shift_semantics():
    x = jnp.asarray(np.arange(2 * 3 * 1 * 1 * 8, dtype=np.float32)
                    .reshape(2, 3, 1, 1, 8))
    y = np.asarray(temporal_shift(x, shift_div=8))
    # first channel: shifted from t+1 (left shift), zero at last step
    np.testing.assert_array_equal(y[:, :2, 0, 0, 0],
                                  np.asarray(x)[:, 1:, 0, 0, 0])
    assert (y[:, 2, 0, 0, 0] == 0).all()
    # second channel: from t-1 (right shift), zero at first step
    np.testing.assert_array_equal(y[:, 1:, 0, 0, 1],
                                  np.asarray(x)[:, :2, 0, 0, 1])
    assert (y[:, 0, 0, 0, 1] == 0).all()
    # remaining channels untouched
    np.testing.assert_array_equal(y[..., 2:], np.asarray(x)[..., 2:])


@pytest.mark.full    # full lane: shape probes; the TSM/C3D/R2+1D importers + caption/recognition consumers stay default
def test_tsm_c3d_r2plus1d_shapes():
    v = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    tsm = TSMResNet(TSMConfig(stage_blocks=(1, 1), base_channels=8))
    out = tsm.apply(tsm.init(jax.random.key(0), v), v)
    assert out.shape == (1, 4, 8 * 2 * 4)

    c3d = C3D(fc_dim=32)
    v8 = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 3)), jnp.float32)
    variables = c3d.init(jax.random.key(0), v8)
    out = c3d.apply(variables, v8)
    assert out.shape == (1, 32)

    r21 = R2Plus1D(R2Plus1DConfig(stage_blocks=(1, 1), base_channels=8))
    variables = r21.init(jax.random.key(0), v)
    out = r21.apply(variables, v)
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_out_intervention():
    ts = TimeSformerConfig(num_frames=2, img_size=16, patch_size=8,
                           embed_dims=16, num_heads=2, num_layers=2,
                           drop_path_max=0.0)
    model = Recognizer3D(ts, num_classes=4)
    v = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), v)
    out = zero_out_tokens(model, variables, v, layer=0,
                          token_indices=range(1, 5))
    assert out["delta"].shape == (1, 4)
    assert np.abs(out["delta"]).sum() > 0          # intervention has effect
    # zeroing nothing changes nothing
    out0 = zero_out_tokens(model, variables, v, layer=0, token_indices=[])
    np.testing.assert_allclose(out0["delta"], 0.0, atol=1e-5)


def test_temporal_shuffle_contrast():
    # order-sensitive embedding: weighted frame sum
    T, D = 6, 4
    weights = np.arange(1, T + 1, dtype=np.float32)[:, None]

    def embed(stack):
        flat = stack.reshape(stack.shape[0], T, -1)[..., :D]
        return (flat * weights).sum(axis=1)

    frames = rng.standard_normal((T, 2, 2, 3)).astype(np.float32)
    out = temporal_shuffle_contrast(embed, frames, n_shuffles=6)
    assert 0 < out["temporal_sensitivity"] < 2
    # order-INSENSITIVE embedding: plain mean -> similarity 1
    out2 = temporal_shuffle_contrast(
        lambda s: s.reshape(s.shape[0], T, -1)[..., :D].mean(1), frames)
    assert out2["mean_similarity"] > 0.999


def test_precise_bn():
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=False, momentum=0.9,
                                name="bn")(x)

    m = M()
    x0 = jnp.asarray(rng.standard_normal((64, 4)) * 3 + 1, jnp.float32)
    variables = m.init(jax.random.key(0), x0)

    def apply_fn(vs, batch):
        return m.apply(vs, batch, mutable=["batch_stats"])

    batches = [x0 for _ in range(10)]
    out = update_bn_stats(apply_fn, variables, batches, num_iters=10)
    got_mean = np.asarray(out["batch_stats"]["bn"]["mean"])
    np.testing.assert_allclose(got_mean, np.asarray(x0).mean(0), rtol=1e-3,
                               atol=1e-3)


def test_concept_tags(tmp_path):
    caps = {
        "v0": ["a dog runs in the park", "dogs running fast"],
        "v1": ["a cat sleeps", "the cat is sleeping on a bed"],
    }
    vocab = build_tag_vocab([c for cl in caps.values() for c in cl],
                            vocab_size=10)
    assert "dog" in vocab and "cat" in vocab
    scores = video_tag_scores(caps, vocab)
    dog_score = dict(scores["v0"]).get("dog", 0)
    assert dog_score == 1.0                        # in both captions
    cat_in_v0 = dict(scores["v0"]).get("cat", 0)
    assert cat_in_v0 == 0
    p = str(tmp_path / "tags.txt")
    write_tag_file(p, scores)
    lines = open(p).read().splitlines()
    assert any(l.startswith("v0\t") and "dog:1.0000" in l for l in lines)
