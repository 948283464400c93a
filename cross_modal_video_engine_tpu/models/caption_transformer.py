"""Word-level transformer caption decoder with KV-cache greedy/beam decode.

The reference's caption head is the label-sequence GRU
(models/decoder_head.py here).  This module is the north-star upgrade: an
autoregressive token decoder over the same video backbone with

  * causal self-attention + cross-attention to encoder tokens;
  * a KV cache carried through one `lax.scan` (each step touches O(1)
    keys, not O(t^2) recompute);
  * greedy decode and width-W beam search, both fully compiled (beams
    fold into the batch axis; cache rows gather by beam origin each
    step).

All parameters are created up front (compact method) and the scan bodies
close over their VALUES — the same tracer-safe pattern as decoder_head.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class CaptionConfig:
    vocab_size: int = 10000
    d_model: int = 512
    heads: int = 8
    layers: int = 4
    max_len: int = 24
    enc_dim: int = 768
    bos_id: int = 1
    eos_id: int = 2


class CaptionTransformer(nn.Module):
    cfg: CaptionConfig

    def _params(self):
        cfg = self.cfg
        D = cfg.d_model
        p = {}
        p["tok"] = self.param("token_embedding",
                              nn.initializers.normal(0.02),
                              (cfg.vocab_size, D))
        p["pos"] = self.param("pos_embedding", nn.initializers.normal(0.01),
                              (cfg.max_len, D))
        p["enc_proj"] = self.param("enc_proj",
                                   nn.initializers.lecun_normal(),
                                   (cfg.enc_dim, D))
        for l in range(cfg.layers):
            for blk in ("self", "cross"):
                for w in ("q", "k", "v", "o"):
                    p[f"l{l}_{blk}_{w}"] = self.param(
                        f"l{l}_{blk}_{w}", nn.initializers.lecun_normal(),
                        (D, D))
            p[f"l{l}_mlp1"] = self.param(f"l{l}_mlp1",
                                         nn.initializers.lecun_normal(),
                                         (D, 4 * D))
            p[f"l{l}_mlp2"] = self.param(f"l{l}_mlp2",
                                         nn.initializers.lecun_normal(),
                                         (4 * D, D))
            for ln in ("ln1", "ln2", "ln3"):
                p[f"l{l}_{ln}_s"] = self.param(f"l{l}_{ln}_s",
                                               nn.initializers.ones, (D,))
                p[f"l{l}_{ln}_b"] = self.param(f"l{l}_{ln}_b",
                                               nn.initializers.zeros, (D,))
        p["lnf_s"] = self.param("lnf_s", nn.initializers.ones, (D,))
        p["lnf_b"] = self.param("lnf_b", nn.initializers.zeros, (D,))
        p["out"] = self.param("out", nn.initializers.normal(0.02),
                              (D, cfg.vocab_size))
        return p

    @staticmethod
    def _ln(x, s, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

    def _mha(self, p, pre, q, k, v, mask=None):
        cfg = self.cfg
        H = cfg.heads
        D = cfg.d_model
        hd = D // H
        qq = (q @ p[f"{pre}_q"]).reshape(q.shape[:-1] + (H, hd))
        kk = (k @ p[f"{pre}_k"]).reshape(k.shape[:-1] + (H, hd))
        vv = (v @ p[f"{pre}_v"]).reshape(v.shape[:-1] + (H, hd))
        logits = jnp.einsum("...qhd,...khd->...hqk", qq, kk,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("...hqk,...khd->...qhd", w, vv,
                       preferred_element_type=jnp.float32)
        return o.reshape(q.shape[:-1] + (D,)) @ p[f"{pre}_o"]

    @nn.compact
    def __call__(self, enc_tokens: jnp.ndarray, token_ids: jnp.ndarray,
                 mode: str = "train", beam_width: int = 4):
        """enc_tokens: (B, Le, enc_dim) encoder tokens.
        mode='train': token_ids (B, T) teacher forcing -> logits (B, T, V).
        mode='greedy': returns (ids (B, max_len), logprobs (B,)).
        mode='beam':   returns (ids (B, max_len), logprobs (B,)) of the
        best beam."""
        cfg = self.cfg
        p = self._params()
        enc = enc_tokens @ p["enc_proj"]                # (B, Le, D)

        if mode == "train":
            return self._train_forward(p, enc, token_ids)
        if mode == "greedy":
            return self._decode(p, enc, beam_width=1)
        return self._decode(p, enc, beam_width=beam_width)

    # -- teacher forcing -----------------------------------------------------
    def _train_forward(self, p, enc, token_ids):
        cfg = self.cfg
        T = token_ids.shape[1]
        x = p["tok"][token_ids] + p["pos"][:T]
        causal = jnp.triu(jnp.full((T, T), NEG, jnp.float32), 1)[None]
        for l in range(cfg.layers):
            h = self._ln(x, p[f"l{l}_ln1_s"], p[f"l{l}_ln1_b"])
            x = x + self._mha(p, f"l{l}_self", h, h, h, causal)
            h = self._ln(x, p[f"l{l}_ln2_s"], p[f"l{l}_ln2_b"])
            x = x + self._mha(p, f"l{l}_cross", h, enc, enc)
            h = self._ln(x, p[f"l{l}_ln3_s"], p[f"l{l}_ln3_b"])
            x = x + jax.nn.gelu(h @ p[f"l{l}_mlp1"]) @ p[f"l{l}_mlp2"]
        x = self._ln(x, p["lnf_s"], p["lnf_b"])
        return x @ p["out"]

    def _cached_self_attn(self, p, pre, q_vec, keys, vals, pos):
        """q_vec: (N, D); keys/vals: (N, Tmax, D) POST-projection cache.
        True KV cache: only the current token is projected per step."""
        cfg = self.cfg
        H, D = cfg.heads, cfg.d_model
        hd = D // H
        q = (q_vec @ p[f"{pre}_q"]).reshape(-1, H, hd)
        k = keys.reshape(keys.shape[0], -1, H, hd)
        v = vals.reshape(vals.shape[0], -1, H, hd)
        logits = jnp.einsum("nhd,nkhd->nhk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        mask = jnp.where(jnp.arange(keys.shape[1])[None, None, :] <= pos,
                         0.0, NEG)
        w = jax.nn.softmax(logits + mask, axis=-1)
        o = jnp.einsum("nhk,nkhd->nhd", w, v,
                       preferred_element_type=jnp.float32)
        return o.reshape(-1, D) @ p[f"{pre}_o"]

    def _cross_attn_cached(self, p, pre, q_vec, enc_k, enc_v):
        """Cross attention with K/V precomputed once outside the scan."""
        cfg = self.cfg
        H, D = cfg.heads, cfg.d_model
        hd = D // H
        q = (q_vec @ p[f"{pre}_q"]).reshape(-1, H, hd)
        k = enc_k.reshape(enc_k.shape[0], -1, H, hd)
        v = enc_v.reshape(enc_v.shape[0], -1, H, hd)
        logits = jnp.einsum("nhd,nkhd->nhk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("nhk,nkhd->nhd", w, v,
                       preferred_element_type=jnp.float32)
        return o.reshape(-1, D) @ p[f"{pre}_o"]

    # -- incremental step ------------------------------------------------------
    def _step(self, p, cross_kv, ids_t, pos, cache):
        """ids_t: (N,) current tokens; cache: (layers, 2, N, max_len, D)
        holding post-projection K (slot 0) and V (slot 1) per layer.
        cross_kv: per-layer (enc_k, enc_v), precomputed.
        Returns (logits (N, V), new cache)."""
        cfg = self.cfg
        x = p["tok"][ids_t] + p["pos"][pos]             # (N, D)
        for l in range(cfg.layers):
            h = self._ln(x, p[f"l{l}_ln1_s"], p[f"l{l}_ln1_b"])
            k_t = h @ p[f"l{l}_self_k"]
            v_t = h @ p[f"l{l}_self_v"]
            cache = cache.at[l, 0, :, pos].set(k_t)
            cache = cache.at[l, 1, :, pos].set(v_t)
            x = x + self._cached_self_attn(p, f"l{l}_self", h,
                                           cache[l, 0], cache[l, 1], pos)
            h = self._ln(x, p[f"l{l}_ln2_s"], p[f"l{l}_ln2_b"])
            x = x + self._cross_attn_cached(p, f"l{l}_cross", h,
                                            cross_kv[l][0], cross_kv[l][1])
            h = self._ln(x, p[f"l{l}_ln3_s"], p[f"l{l}_ln3_b"])
            x = x + jax.nn.gelu(h @ p[f"l{l}_mlp1"]) @ p[f"l{l}_mlp2"]
        x = self._ln(x, p["lnf_s"], p["lnf_b"])
        return x @ p["out"], cache

    # -- greedy / beam ----------------------------------------------------------
    def _decode(self, p, enc, beam_width: int):
        cfg = self.cfg
        B, Le, D = enc.shape
        W = beam_width
        N = B * W
        enc_rep = jnp.repeat(enc, W, axis=0)            # (N, Le, D)
        V = cfg.vocab_size

        cross_kv = [(enc_rep @ p[f"l{l}_cross_k"],
                     enc_rep @ p[f"l{l}_cross_v"])
                    for l in range(cfg.layers)]

        cache0 = jnp.zeros((cfg.layers, 2, N, cfg.max_len, cfg.d_model),
                           jnp.float32)
        ids0 = jnp.full((N, cfg.max_len), cfg.eos_id, jnp.int32)
        # beam 0 active, others start at NEG so the first expansion seeds
        scores0 = jnp.tile(
            jnp.asarray([0.0] + [NEG] * (W - 1), jnp.float32), (B,))
        finished0 = jnp.zeros((N,), bool)
        cur0 = jnp.full((N,), cfg.bos_id, jnp.int32)

        def step(carry, t):
            ids, scores, finished, cur, cache = carry
            logits, cache = self._step(p, cross_kv, cur, t, cache)
            logp = jax.nn.log_softmax(logits, axis=-1)   # (N, V)
            # finished beams only extend with EOS at no cost
            eos_only = jnp.full((V,), NEG).at[cfg.eos_id].set(0.0)
            logp = jnp.where(finished[:, None], eos_only[None, :], logp)

            total = scores[:, None] + logp               # (N, V)
            total_b = total.reshape(B, W * V)
            top_scores, top_idx = jax.lax.top_k(total_b, W)  # (B, W)
            beam_origin = top_idx // V                   # (B, W) in [0, W)
            token = top_idx % V
            flat_origin = (beam_origin
                           + (jnp.arange(B) * W)[:, None]).reshape(N)
            # gather state by beam origin
            ids = ids[flat_origin]
            cache = cache[:, :, flat_origin]
            finished = finished[flat_origin]
            cur = token.reshape(N)
            ids = ids.at[:, t].set(cur)
            finished = jnp.logical_or(finished, cur == cfg.eos_id)
            scores = top_scores.reshape(N)
            return (ids, scores, finished, cur, cache), None

        (ids, scores, finished, _, _), _ = jax.lax.scan(
            step, (ids0, scores0, finished0, cur0, cache0),
            jnp.arange(cfg.max_len))
        ids = ids.reshape(B, W, cfg.max_len)
        scores = scores.reshape(B, W)
        best = jnp.argmax(scores, axis=1)
        return (ids[jnp.arange(B), best], scores[jnp.arange(B), best])
