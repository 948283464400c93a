"""uint8 ingest path: fused dequant+normalize+patchify tokens feed the
same patch-embed param as the conv (ops/pallas_preprocess.py +
models/clip.py PatchEmbed tokens= path)."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel
from cross_modal_video_engine_tpu.ops.pallas_preprocess import (
    channel_affine, u8_to_patches)
from cross_modal_video_engine_tpu.ops.preprocess import (
    CLIP_MEAN, CLIP_STD, patchify)

rng = np.random.default_rng(3)


def _cfg():
    return CLIPConfig(
        embed_dim=16, image_resolution=64, vision_width=32, vision_layers=2,
        vision_heads=2, patch_size=32, context_length=8, vocab_size=64,
        text_width=16, text_heads=2, text_layers=1)


def test_u8_to_patches_matches_normalize_then_patchify():
    f = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    got = np.asarray(u8_to_patches(jnp.asarray(f), 32,
                                   out_dtype=jnp.float32))
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    want = np.asarray(patchify(
        jnp.asarray((f / 255.0 - mean) / std, jnp.float32), 32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_channel_affine_layout():
    scale, shift = channel_affine(patch=2, channels=3)
    assert scale.shape == (2 * 2 * 3,)
    # channel pattern repeats every 3 columns
    np.testing.assert_allclose(scale[:3], scale[3:6])
    np.testing.assert_allclose(shift[0], -CLIP_MEAN[0] / CLIP_STD[0])


def test_token_path_equals_conv_path():
    cfg = _cfg()
    model = CLIPModel(cfg)
    f_u8 = rng.integers(0, 256, (2, 3, 64, 64, 3), dtype=np.uint8)
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    f_norm = jnp.asarray((f_u8 / 255.0 - mean) / std, jnp.float32)

    variables = model.init(jax.random.key(0), f_norm[:, 0],
                           jnp.zeros((2, 8), jnp.int32))
    high_a, mid_a = model.apply(variables, f_norm, method="encode_video")
    high_b, mid_b = model.apply(variables, jnp.asarray(f_u8),
                                method="encode_video_u8")
    np.testing.assert_allclose(np.asarray(high_a), np.asarray(high_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mid_a), np.asarray(mid_b),
                               rtol=2e-4, atol=2e-4)


def test_param_tree_unchanged():
    cfg = _cfg()
    model = CLIPModel(cfg)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.zeros((1, 8), jnp.int32))
    conv1 = variables["params"]["visual"]["conv1"]
    assert set(conv1) == {"kernel"}
    assert conv1["kernel"].shape == (32, 32, 3, cfg.vision_width)
