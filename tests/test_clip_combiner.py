"""CLIP tower, BPE tokenizer, and Combiner tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel
from cross_modal_video_engine_tpu.models.combiner import Combiner, CombinerConfig
from cross_modal_video_engine_tpu.utils.bpe import BPETokenizer, write_toy_merges
from cross_modal_video_engine_tpu.losses import clip_contrastive_loss

rng = np.random.default_rng(5)

TINY = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=24,
                  vision_layers=2, vision_heads=2, patch_size=8,
                  context_length=16, vocab_size=600, text_width=20,
                  text_heads=2, text_layers=2)


@pytest.fixture(scope="module")
def clip_state():
    model = CLIPModel(TINY)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)
    variables = model.init(jax.random.key(0), imgs, ids)
    return model, variables


def test_encode_image_shapes(clip_state):
    model, variables = clip_state
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    high, middle = model.apply(variables, imgs, method="encode_image")
    assert high.shape == (3, 16)
    assert middle.shape == (3, 16, 24)   # grid 4x4=16 tokens, width 24


def test_encode_video_folds_frames(clip_state):
    model, variables = clip_state
    frames = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    high, middle = model.apply(variables, frames, method="encode_video")
    assert high.shape == (2, 4, 16)
    assert middle.shape == (2, 4, 16, 24)
    # folding must equal per-frame encoding
    h0, _ = model.apply(variables, frames[:, 0], method="encode_image")
    np.testing.assert_allclose(np.asarray(high[:, 0]), np.asarray(h0),
                               rtol=2e-4, atol=2e-5)


def test_text_eot_pooling(clip_state):
    model, variables = clip_state
    # same prefix, eot at different positions -> embeddings must differ from
    # padding beyond eot changes? padding zeros after eot shouldn't matter
    ids1 = np.zeros((1, 16), np.int32)
    ids1[0, :4] = [598, 5, 7, 599]     # sot, tokens, eot(=max id)
    ids2 = ids1.copy()
    ids2[0, 10] = 0                     # padding unchanged
    e1 = model.apply(variables, jnp.asarray(ids1), method="encode_text")
    e2 = model.apply(variables, jnp.asarray(ids2), method="encode_text")
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_clip_forward_logits(clip_state):
    model, variables = clip_state
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)
    li, lt = model.apply(variables, imgs, ids)
    assert li.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)
    assert np.isfinite(float(clip_contrastive_loss(li)))


def test_bf16_tower():
    cfg = CLIPConfig(**{**TINY.__dict__, "dtype": "bfloat16"})
    model = CLIPModel(cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)
    variables = model.init(jax.random.key(0), imgs, ids)
    high, middle = model.apply(variables, imgs, method="encode_image")
    assert high.dtype == jnp.float32       # projected back to f32
    assert middle.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(high, np.float32)).all()


# ---- BPE ----------------------------------------------------------------

CORPUS = ["a man riding a horse on the beach",
          "the dog runs in the park", "a red car on the road",
          "riding riding rider beach dog dogs"] * 3


def test_bpe_roundtrip(tmp_path):
    p = str(tmp_path / "merges.txt")
    write_toy_merges(p, CORPUS, n_merges=64)
    tok = BPETokenizer(p)
    ids = tok.encode("a man riding a horse")
    assert len(ids) > 0
    assert tok.decode(ids).strip() == "a man riding a horse"
    # merges actually shrink sequences
    chars = len("amanridingahorse")
    assert len(ids) < chars


def test_bpe_tokenize_framing(tmp_path):
    p = str(tmp_path / "merges.txt")
    write_toy_merges(p, CORPUS, n_merges=32)
    tok = BPETokenizer(p)
    out = tok.tokenize(["the dog", "a red car on the road and more words"],
                       context_length=8)
    assert out.shape == (2, 8)
    assert out[0, 0] == tok.sot
    row0 = list(out[0])
    assert tok.eot in row0
    assert out[1, -1] == tok.eot          # truncated keeps eot last
    # eot id is the max id -> argmax pooling in TextTower finds it
    assert tok.eot == tok.vocab_size - 1


def test_bpe_unknown_unicode(tmp_path):
    p = str(tmp_path / "merges.txt")
    write_toy_merges(p, CORPUS, n_merges=16)
    tok = BPETokenizer(p)
    ids = tok.encode("café \U0001f600")   # accents + emoji fall back to bytes
    assert all(0 <= i < tok.vocab_size for i in ids)


# ---- Combiner -------------------------------------------------------------

def test_combiner_shapes_and_logits():
    cfg = CombinerConfig(clip_feature_dim=32, projection_dim=24,
                         hidden_dim=48, n_heads=4)
    model = Combiner(cfg)
    B, F, L, D = 3, 4, 16, 32
    high = jnp.asarray(rng.standard_normal((B, F, D)), jnp.float32)
    middle = jnp.asarray(rng.standard_normal((B, F, L, D)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    variables = model.init(jax.random.key(0), (high, middle), text,
                           (high, middle))
    logits = model.apply(variables, (high, middle), text, (high, middle))
    assert logits.shape == (B, B)
    pred = model.apply(variables, (high, middle), text,
                       method="combine_features")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pred), axis=1), 1.0,
                               rtol=1e-5)
    # logit scale applied
    target = np.asarray(high.mean(axis=1))
    target = target / np.linalg.norm(target, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(logits),
                               100.0 * np.asarray(pred) @ target.T,
                               rtol=1e-4, atol=1e-4)


def test_combiner_train_mode_dropout():
    cfg = CombinerConfig(clip_feature_dim=16, projection_dim=8,
                         hidden_dim=16, n_heads=2)
    model = Combiner(cfg)
    B, F, L, D = 2, 2, 4, 16
    high = jnp.asarray(rng.standard_normal((B, F, D)), jnp.float32)
    middle = jnp.asarray(rng.standard_normal((B, F, L, D)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    variables = model.init(jax.random.key(0), (high, middle), text,
                           (high, middle))
    out1 = model.apply(variables, (high, middle), text, (high, middle),
                       train=True, rngs={"dropout": jax.random.key(1)})
    out2 = model.apply(variables, (high, middle), text, (high, middle),
                       train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
