"""CLIP-style dual tower (vision transformer + text transformer).

TPU-native rebuild of the MultiFusion vendored CLIP
(MultiFusion/src/model/model.py):

* `VisionTower` mirrors VisualTransformer.forward (model.py:282-301):
  returns (high, low, middle) where `low` is the patch tokens before the
  transformer, `middle` the post-transformer tokens without CLS, and
  `high` the projected CLS feature.  `encode_image` on the `CLIPModel`
  returns (high, middle) like the reference CLIP.encode_image.
* `TextTower` is the causal text transformer with EOT pooling
  (model.py:343-360 equivalent).
* Attention/MLP use fused qkv projections sized to MXU tiles; all compute
  can run bf16 (`dtype=jnp.bfloat16`) with fp32 LayerNorm, matching the
  reference's fp16-with-fp32-LN trick (model.py:290-295).

Video encoding folds frames into the batch axis — (B, F, H, W, C) ->
(B*F, ...) — so the MXU sees one large batch instead of a per-frame python
loop (the reference encodes frame-by-frame, src/utils.py:22-29).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    patch_size: int = 32
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    dtype: str = "float32"    # 'bfloat16' for TPU production
    # run per-token ops (LN/MLP/residual) on (B*L, D) instead of
    # (B, L, D): bf16 tiles are (16, 128) over the last two dims, so a
    # rank-3 L=50 layout pads every elementwise op and its stored bytes
    # to L=64 (+28% traffic on a tower bench_roofline shows is
    # fusion/bandwidth-limited).  Exact math — attention reshapes from
    # flat cost the same moves as from rank-3.  Off by default pending
    # the on-chip A/B (docs/PERF.md).
    flatten_tokens: bool = False
    # route each block's attention half through the Pallas fused
    # sublayer (ops/attention_sublayer.py): LN -> qkv -> attention ->
    # proj -> residual in one VMEM-resident pass, eliminating the
    # per-layer HBM materialization the roofline identifies as the
    # flagship's bottleneck.  Identical param tree; sequences pad to
    # the 16-row tile with pad keys masked.  Off by default pending the
    # on-chip A/B; mutually exclusive with flatten_tokens.
    fused_attn: bool = False
    # same treatment for the MLP half (ln_2 -> c_fc -> gelu -> c_proj
    # -> residual, one HBM round-trip — the 4x-wide hidden never leaves
    # VMEM).  Purely per-token, so it composes with any of the layout
    # modes above.  Off by default pending the on-chip A/B.
    fused_mlp: bool = False

    @property
    def grid(self) -> int:
        return self.image_resolution // self.patch_size

    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def enable_fused_inference(cfg: CLIPConfig,
                           enable: Optional[bool] = None) -> CLIPConfig:
    """Turn on the fused Pallas sublayers for inference-time serving.

    Exact math and an identical param tree (tests/test_clip_fused_attn
    .py), so checkpoint configs saved without the flags still load —
    this is how the serving/inference CLIs get the headline-default
    program (docs/PERF.md layout A/B) without re-exporting checkpoints.
    enable=None auto-selects: on for a real TPU backend, off elsewhere
    (the Pallas interpreter would be slower than plain XLA on CPU).

    Geometry guard: the fused MLP kernel keeps both (D, 4D) weight
    mats VMEM-resident (~16·D² bytes bf16), so widths past ~768 blow
    the ~16 MB/core budget (ViT-L/14's D=1024 alone needs 16.8 MB) —
    auto-enable stays off there rather than shipping a program that
    fails to compile."""
    if enable is None:
        enable = (jax.default_backend() in ("tpu", "axon")
                  and max(cfg.vision_width, cfg.text_width) <= 768)
    if not enable:
        return cfg
    # The fused compact layout supersedes flatten_tokens (Transformer
    # asserts the two are mutually exclusive) — clear it so checkpoints
    # saved with flatten_tokens=True still load fused instead of
    # crashing at apply time.
    return dataclasses.replace(cfg, fused_attn=True, fused_mlp=True,
                               flatten_tokens=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm with fp32 statistics regardless of activation dtype.

    flax's LayerNorm already reduces mean/var in float32
    (force_float32_reductions), so the normalization math is as stable as
    the reference's fp32-LN trick (model.py:290-295) WITHOUT round-
    tripping the whole activation through f32 — the scale/bias apply in
    the compute dtype, which halves the LN's HBM traffic in bf16 runs.
    """

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="ln")(x)


class MHA(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    # route self-attention through the Pallas flash kernel — worth it for
    # long token streams (S >= ~1024, see ops/flash_attention.py); only
    # valid when there is no additive mask and kv is None
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 kv: Optional[jnp.ndarray] = None,
                 tokens: Optional[Tuple[int, int]] = None):
        """x: (B, L, D) queries; kv: optional (B, S, D) keys/values for
        cross attention. mask: (L, S) additive (-inf) mask.
        tokens: static (B, L) when x arrives FLATTENED as (B*L, D)
        (self-attention only) — the CLIPConfig.flatten_tokens layout."""
        D, H = self.width, self.heads
        hd = D // H
        is_self = kv is None
        assert tokens is None or (is_self and x.ndim == 2), \
            "flattened MHA supports self-attention only"
        kv = x if kv is None else kv
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(kv)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(kv)
        if tokens is not None:
            B, L = tokens
            S = L
        else:
            B, L = q.shape[0], q.shape[1]
            S = k.shape[1]
        q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        scale = 1.0 / np.sqrt(hd)
        if self.use_flash and is_self and mask is None:
            from ..ops.flash_attention import flash_attention
            out = flash_attention(q, k, v, scale)
            out = out.transpose(0, 2, 1, 3).astype(self.dtype)
            out = out.reshape(B * L, D) if tokens is not None \
                else out.reshape(B, L, D)
            return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
        # einsum_f32acc = f32-accumulated einsum with autocast backward
        # (cotangents cast to the operand dtype so the grad dots stay on
        # the MXU bf16 path — ops/mixed_precision.py)
        from ..ops.mixed_precision import einsum_f32acc
        logits = einsum_f32acc("bhld,bhsd->bhls", q, k) * scale
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = einsum_f32acc("bhls,bhsd->bhld", w, v).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3)
        out = out.reshape(B * L, D) if tokens is not None \
            else out.reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class _DenseParams(nn.Module):
    """nn.Dense's params (kernel lecun_normal + bias zeros) without a
    forward pass — lets the fused-attention branch own the SAME param
    tree as the unfused MHA (attn/{q,k,v,out}_proj/{kernel,bias})."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))


class _MHAParams(nn.Module):
    width: int

    def setup(self):
        self.q_proj = _DenseParams(self.width, self.width)
        self.k_proj = _DenseParams(self.width, self.width)
        self.v_proj = _DenseParams(self.width, self.width)
        self.out_proj = _DenseParams(self.width, self.width)


class _LNParamsInner(nn.Module):
    dim: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))


class _LNParams(nn.Module):
    """LayerNormF32's param tree (<name>/ln/{scale,bias}) sans forward."""

    dim: int

    def setup(self):
        self.ln = _LNParamsInner(self.dim)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    fused_attn: bool = False
    fused_mlp: bool = False

    @nn.compact
    def __call__(self, x, mask=None, tokens=None, valid_len=None,
                 causal=False, compact_g=None):
        if self.fused_attn:
            from ..ops.attention_sublayer import (
                fused_attention_sublayer, fused_attention_sublayer_compact)
            ln = _LNParams(self.width, name="ln_1")
            at = _MHAParams(self.width, name="attn")
            wargs = (ln.ln.scale, ln.ln.bias,
                     at.q_proj.kernel, at.q_proj.bias,
                     at.k_proj.kernel, at.k_proj.bias,
                     at.v_proj.kernel, at.v_proj.bias,
                     at.out_proj.kernel, at.out_proj.bias)
            if x.ndim == 2:
                # compact flat layout (B*L, D): no pad rows anywhere —
                # compact_g was validated by the Transformer
                x = fused_attention_sublayer_compact(
                    x, *wargs, heads=self.heads, seq_len=valid_len,
                    g=compact_g, causal=causal)
            else:
                x = fused_attention_sublayer(
                    x, *wargs, heads=self.heads, valid_len=valid_len,
                    causal=causal)
        else:
            x = x + MHA(self.width, self.heads, self.dtype, name="attn")(
                LayerNormF32(name="ln_1")(x), mask, tokens=tokens)
        if self.fused_mlp:
            from ..ops.attention_sublayer import fused_mlp_sublayer
            ln2 = _LNParams(self.width, name="ln_2")
            fc = _DenseParams(self.width, self.width * 4, name="c_fc")
            pj = _DenseParams(self.width * 4, self.width, name="c_proj")
            return fused_mlp_sublayer(x, ln2.ln.scale, ln2.ln.bias,
                                      fc.kernel, fc.bias,
                                      pj.kernel, pj.bias)
        h = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, flatten: bool = False,
                 fused_attn: bool = False, fused_mlp: bool = False,
                 causal: bool = False):
        """flatten=True runs the per-token ops on (B*L, D) so the bf16
        (16, 128) tile never pads the token dim (L=50 -> 64 on the
        rank-3 layout); attention reshapes from flat at the same cost.
        fused_attn=True routes each block's attention half through the
        Pallas VMEM-resident sublayer (sequences pad to the 16-row
        tile; `causal` replaces the additive `mask`, which must then be
        the standard triangular one).  fused_mlp=True does the same for
        the MLP half and composes with any layout.  Param tree is
        identical in every mode."""
        if fused_attn:
            # the fused branch builds its own padding/causal masks: a
            # flatten request or a non-causal additive mask would be
            # silently dropped — refuse instead
            assert not flatten, \
                "fused_attn is mutually exclusive with flatten_tokens"
            assert mask is None or causal, \
                "fused_attn supports only the causal triangular mask"
            from ..ops.attention_sublayer import (_compact_chunk,
                                                  pad_tokens)
            B, L, D = x.shape
            # compact flat layout when the token count would pad (the
            # bf16 16-row tile: L=50 -> 64 is +28% MACs/bytes on EVERY
            # GEMM) and a block-diagonal chunking exists; otherwise the
            # padded rank-3 kernel (e.g. text L=77 -> 80, a 4% tax the
            # block-diagonal softmax waste would not repay)
            g = _compact_chunk(B, L) if L % 16 else None
            if g is not None:
                x = x.reshape(B * L, D)
                for i in range(self.layers):
                    x = ResidualAttentionBlock(
                        self.width, self.heads, self.dtype,
                        fused_attn=True, fused_mlp=fused_mlp,
                        name=f"resblock_{i}")(
                        x, valid_len=L, causal=causal, compact_g=g)
                return x.reshape(B, L, D)
            x, L = pad_tokens(x)
            for i in range(self.layers):
                x = ResidualAttentionBlock(self.width, self.heads,
                                           self.dtype, fused_attn=True,
                                           fused_mlp=fused_mlp,
                                           name=f"resblock_{i}")(
                    x, valid_len=L, causal=causal)
            return x[:, :L]
        if not flatten:
            for i in range(self.layers):
                x = ResidualAttentionBlock(self.width, self.heads,
                                           self.dtype,
                                           fused_mlp=fused_mlp,
                                           name=f"resblock_{i}")(x, mask)
            return x
        B, L, D = x.shape
        x = x.reshape(B * L, D)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, self.dtype,
                                       fused_mlp=fused_mlp,
                                       name=f"resblock_{i}")(
                x, mask, tokens=(B, L))
        return x.reshape(B, L, D)


class PatchEmbed(nn.Module):
    """The patch-embedding conv, also applicable to pre-patchified tokens:
    `tokens @ kernel.reshape(-1, width)` == the strided conv, so the uint8
    ingest path (ops/pallas_preprocess.u8_to_patches) feeds the same param.
    Param tree matches nn.Conv ('kernel', (p, p, C, width), lecun_normal)
    so checkpoint importers are unaffected."""

    width: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: Optional[jnp.ndarray] = None,
                 tokens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.patch, self.patch, 3, self.width))
        if tokens is not None:                       # (B, L, p*p*3)
            w = kernel.reshape(-1, self.width).astype(self.dtype)
            return jnp.dot(tokens.astype(self.dtype), w)
        out = jax.lax.conv_general_dilated(
            images.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(out.shape[0], -1, self.width)


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images: Optional[jnp.ndarray] = None, *,
                 tokens: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) (or pre-patchified `tokens`
        (B, G^2, p*p*3)) -> (high (B, E), low (B, G^2, W),
        middle (B, G^2, W))."""
        cfg = self.cfg
        dt = cfg.jdtype()
        x = PatchEmbed(cfg.vision_width, cfg.patch_size, dt,
                       name="conv1")(images, tokens)
        B = x.shape[0]                                         # (B, G^2, W)
        low_fea = x
        cls = self.param("class_embedding",
                         nn.initializers.normal(cfg.vision_width ** -0.5),
                         (cfg.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (B, 1, cfg.vision_width)), x], 1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.vision_width ** -0.5),
                         (cfg.grid ** 2 + 1, cfg.vision_width))
        x = x + pos.astype(dt)
        x = LayerNormF32(name="ln_pre")(x)
        x = Transformer(cfg.vision_width, cfg.vision_layers, cfg.vision_heads,
                        dt, name="transformer")(
            x, flatten=cfg.flatten_tokens, fused_attn=cfg.fused_attn,
            fused_mlp=cfg.fused_mlp)
        middle_fea = x[:, 1:, :]
        pooled = LayerNormF32(name="ln_post")(x[:, 0, :])
        proj = self.param("proj",
                          nn.initializers.normal(cfg.vision_width ** -0.5),
                          (cfg.vision_width, cfg.embed_dim))
        high = jnp.dot(pooled, proj.astype(dt),
                       preferred_element_type=jnp.float32)
        return high.astype(jnp.float32), low_fea, middle_fea


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, text_ids: jnp.ndarray,
                 img_tokens: Optional[jnp.ndarray] = None,
                 split_ind: int = 4) -> jnp.ndarray:
        """text_ids: (B, L) int32; EOT token = highest id in each row.
        img_tokens: optional (B, text_width) image features spliced in
        place of the `split_ind` placeholder token — the pic2word-style
        compositional encoding (ref encode_text_img_retrieval,
        model.py:496-527)."""
        cfg = self.cfg
        dt = cfg.jdtype()
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.text_width))
        x = emb[text_ids].astype(dt)
        if img_tokens is not None:
            # splice at the FIRST occurrence of split_ind only
            # (encode_text_img_retrieval uses ind_insert.nonzero()[0];
            # a caption whose BPE stream repeats the id must not get
            # the image feature injected at later positions)
            is_split = text_ids == split_ind
            first = jnp.argmax(is_split, axis=-1)
            hit = jnp.any(is_split, axis=-1)
            onehot = (jnp.arange(text_ids.shape[1])[None, :]
                      == first[:, None]) & hit[:, None]
            x = jnp.where(onehot[..., None],
                          img_tokens[:, None, :].astype(dt), x)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.text_width))
        L = text_ids.shape[1]
        x = x + pos[:L].astype(dt)
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        x = Transformer(cfg.text_width, cfg.text_layers, cfg.text_heads, dt,
                        name="transformer")(x, causal,
                                            flatten=cfg.flatten_tokens,
                                            fused_attn=cfg.fused_attn,
                                            fused_mlp=cfg.fused_mlp,
                                            causal=True)
        x = LayerNormF32(name="ln_final")(x)
        eot = jnp.argmax(text_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection",
                          nn.initializers.normal(cfg.text_width ** -0.5),
                          (cfg.text_width, cfg.embed_dim))
        out = jnp.dot(pooled, proj.astype(dt),
                      preferred_element_type=jnp.float32)
        return out.astype(jnp.float32)


class CLIPModel(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTower(self.cfg, name="visual")
        self.text = TextTower(self.cfg, name="text")
        self.logit_scale = self.param("logit_scale",
                                      lambda k: jnp.asarray(np.log(1 / 0.07),
                                                            jnp.float32))

    def encode_image(self, images: jnp.ndarray):
        """(B, H, W, 3) -> (high (B, E), middle (B, G^2, W)), matching the
        reference CLIP.encode_image tuple contract."""
        high, _low, middle = self.visual(images)
        return high, middle

    def encode_video(self, frames: jnp.ndarray):
        """(B, F, H, W, 3) -> (high (B, F, E), middle (B, F, G^2, W)) —
        frames folded into the batch for one big MXU pass."""
        B, F = frames.shape[0], frames.shape[1]
        flat = frames.reshape((B * F,) + frames.shape[2:])
        high, _low, middle = self.visual(flat)
        return (high.reshape(B, F, -1),
                middle.reshape(B, F, middle.shape[1], middle.shape[2]))

    def encode_video_u8(self, frames_u8: jnp.ndarray):
        """uint8 ingest: (B, F, H, W, 3) u8 -> same outputs as
        encode_video(normalized frames), via the fused dequant+normalize+
        patchify ingest (ops/pallas_preprocess.u8_to_patches) straight into
        the patch-embed GEMM — no f32 frame tensor is materialized and the
        host->device transfer is 4x smaller."""
        from ..ops.pallas_preprocess import u8_to_patches

        B, F = frames_u8.shape[0], frames_u8.shape[1]
        flat = frames_u8.reshape((B * F,) + frames_u8.shape[2:])
        toks = u8_to_patches(flat, self.cfg.patch_size,
                             out_dtype=self.cfg.jdtype())
        high, _low, middle = self.visual(tokens=toks)
        return (high.reshape(B, F, -1),
                middle.reshape(B, F, middle.shape[1], middle.shape[2]))

    def encode_text(self, text_ids: jnp.ndarray):
        return self.text(text_ids)

    def encode_text_img_retrieval(self, text_ids: jnp.ndarray,
                                  img_tokens: jnp.ndarray,
                                  split_ind: int = 4):
        """Compositional query: image feature replaces the placeholder
        token (pic2word / ref model.py:496-527)."""
        if text_ids.shape[0] == 1 and img_tokens.shape[0] > 1:
            text_ids = jnp.broadcast_to(
                text_ids, (img_tokens.shape[0], text_ids.shape[1]))
        return self.text(text_ids, img_tokens, split_ind)

    def __call__(self, images: jnp.ndarray, text_ids: jnp.ndarray):
        """Contrastive logits like reference CLIP.forward."""
        from ..ops.similarity import l2norm
        image_features, _ = self.encode_image(images)
        text_features = self.encode_text(text_ids)
        # l2norm's epsilon guard: an all-zero row (padded/blank batch
        # entry) must not turn the whole logit matrix into NaN
        image_features = l2norm(image_features)
        text_features = l2norm(text_features)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * image_features @ text_features.T
        return logits_per_image, logits_per_image.T
