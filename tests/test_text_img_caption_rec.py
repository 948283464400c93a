"""Compositional text-img encoding + caption recognizer."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel
from cross_modal_video_engine_tpu.models.caption_transformer import CaptionConfig
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3DCaption
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig

rng = np.random.default_rng(331)

TINY = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=24,
                  vision_layers=1, vision_heads=2, patch_size=8,
                  context_length=12, vocab_size=600, text_width=20,
                  text_heads=2, text_layers=1)


def test_encode_text_img_retrieval():
    model = CLIPModel(TINY)
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(5, 500, (1, 12)), jnp.int32)
    variables = model.init(jax.random.key(0), imgs, ids)

    # text with a placeholder token (id 4) at position 2, eot (599) at 5
    text = np.full((1, 12), 0, np.int32)
    text[0, :6] = [598, 10, 4, 20, 30, 599]
    img_tok = jnp.asarray(rng.standard_normal((3, 20)), jnp.float32)
    out = model.apply(variables, jnp.asarray(text), img_tok,
                      method="encode_text_img_retrieval")
    assert out.shape == (3, 16)       # broadcast over the image batch
    # different image tokens -> different embeddings
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # without a placeholder the image tokens have no effect
    text2 = text.copy()
    text2[0, 2] = 11
    o1 = model.apply(variables, jnp.asarray(text2), img_tok,
                     method="encode_text_img_retrieval")
    o2 = model.apply(variables, jnp.asarray(np.repeat(text2, 3, 0)),
                     method="encode_text")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_recognizer3d_caption():
    ts = TimeSformerConfig(num_frames=2, img_size=16, patch_size=8,
                           embed_dims=16, num_heads=2, num_layers=1,
                           drop_path_max=0.0)
    ccfg = CaptionConfig(vocab_size=30, d_model=16, heads=2, layers=1,
                         max_len=5, enc_dim=16)
    model = Recognizer3DCaption(ts, ccfg)
    v = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 30, (2, 5)), jnp.int32)
    variables = model.init(jax.random.key(0), v, ids)
    logits = model.apply(variables, v, ids)
    assert logits.shape == (2, 5, 30)
    out_ids, scores = model.apply(variables, v, method="generate",
                                  mode="beam", beam_width=3)
    assert out_ids.shape == (2, 5)
    assert np.isfinite(np.asarray(scores)).all()
