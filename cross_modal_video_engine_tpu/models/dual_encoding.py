"""Support-set distilled dual encoder for text->video retrieval.

TPU-native rebuild of LINAS-engine/model.py:

* `VideoMultilevelEncoding` (ref model.py:119-176): mean-pooled raw feature
  (level 1) + biGRU pooled (level 2) + multi-window conv bank over the GRU
  outputs (level 3), concatenated.
* `TextMultilevelEncoding` (ref model.py:263-359): same three levels over
  word embeddings + BoW, plus support-set attention (k/q projections,
  softmax-gated sum of support caption features).  `support_style='none'`
  gives the plain student encoder (`Text_multilevel_encoding_ori`,
  model.py:191-260).
* `DualEncoding` (ref model.py:512-1004): teacher tower (vid/text encoding
  + latent mapping) and optional student towers, with `embed_vis`,
  `embed_vis_distill`, `embed_txt_distill`, `embed_txt_GT` entry points
  matching the reference inference surface (model.py:707-832).

Everything is static-shape: frames padded to `max_frames` (VIDEO_MAX_LEN=64,
tag_data_provider.py:11), captions padded to `max_words`, support sets to
`support_set_number`; masks carry validity.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BiGRU, ConvBank1D, LatentMapping


class VideoBatch(NamedTuple):
    frames: jnp.ndarray       # (B, T, D) float32
    mean_origin: jnp.ndarray  # (B, D) mean-pooled raw feature
    lengths: jnp.ndarray      # (B,) int32
    mask: jnp.ndarray         # (B, T) float32


class TextBatch(NamedTuple):
    ids: jnp.ndarray          # (B, L) int32   (or (B, S, L) for support sets)
    bows: jnp.ndarray         # (B, V) float32 (or (B, S, V))
    lengths: jnp.ndarray      # (B,)           (or (B, S))
    mask: jnp.ndarray         # (B, L)         (or (B, S, L))


@dataclasses.dataclass(frozen=True)
class DualEncodingConfig:
    # sizes (defaults = reference trainer.py:27-106 defaults)
    visual_feat_dim: int = 2048
    visual_rnn_size: int = 512
    visual_kernel_num: int = 512
    visual_kernel_sizes: Tuple[int, ...] = (2, 3, 4, 5)
    vocab_size: int = 7807
    bow_vocab_size: int = 7183
    word_dim: int = 500
    text_rnn_size: int = 512
    text_kernel_num: int = 512
    text_kernel_sizes: Tuple[int, ...] = (2, 3, 4)
    hidden_size: int = 1024          # support-set attention k/q dim
    common_dim: int = 1536           # latent space
    text_resblock_number: int = 0
    dropout: float = 0.2
    concate: str = "full"            # 'full' (levels 1+2+3) | 'reduced' (2+3)
    gru_pool: str = "mean"           # 'mean' | 'max'
    # architecture style
    style: str = "distill_from_best_model"   # | 'GT'
    teacher_model: str = "GT"                # | 'student'
    student_model: str = "de+map"            # 'map' | 'de+map' | 'text+video'

    @property
    def video_feature_dim(self) -> int:
        gru = 2 * self.visual_rnn_size
        conv = self.visual_kernel_num * len(self.visual_kernel_sizes)
        return gru + conv + (self.visual_feat_dim if self.concate == "full" else 0)

    @property
    def text_feature_dim(self) -> int:
        gru = 2 * self.text_rnn_size
        conv = self.text_kernel_num * len(self.text_kernel_sizes)
        return gru + conv + (self.bow_vocab_size if self.concate == "full" else 0)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid timesteps: sum(x * mask) / length."""
    s = jnp.sum(x * mask[..., None], axis=1)
    return s / jnp.maximum(lengths[..., None].astype(x.dtype), 1.0)


class VideoMultilevelEncoding(nn.Module):
    cfg: DualEncodingConfig

    @nn.compact
    def __call__(self, videos: VideoBatch, *, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        org_out = videos.mean_origin                            # level 1

        # level 2: biGRU over the (unpacked) padded batch, like the reference
        gru_out_seq = BiGRU(cfg.visual_rnn_size, packed=False, name="rnn")(
            videos.frames, videos.mask)
        if cfg.gru_pool == "mean":
            gru_out = _masked_mean(gru_out_seq, videos.mask, videos.lengths)
        else:
            gru_out = jnp.max(gru_out_seq * videos.mask[..., None], axis=1)
        gru_out = nn.Dropout(cfg.dropout, deterministic=not train)(gru_out)

        # level 3: conv bank over masked GRU outputs (model.py:163-171)
        masked_seq = gru_out_seq * videos.mask[..., None]
        con_out = ConvBank1D(cfg.visual_kernel_num, cfg.visual_kernel_sizes,
                             name="convs")(masked_seq)
        con_out = nn.Dropout(cfg.dropout, deterministic=not train)(con_out)

        if cfg.concate == "full":
            return jnp.concatenate([gru_out, con_out, org_out], axis=1)
        return jnp.concatenate([gru_out, con_out], axis=1)


class TextMultilevelEncoding(nn.Module):
    """Text tower; with `with_support=True` adds the support-set attention
    (teacher).  Set `with_support=False` for the student encoder."""

    cfg: DualEncodingConfig
    with_support: bool = False
    style: str = "distill_from_best_model"

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.word_dim, name="embed")
        self.rnn = BiGRU(cfg.text_rnn_size, packed=True, name="rnn")
        self.convs = ConvBank1D(cfg.text_kernel_num, cfg.text_kernel_sizes,
                                name="convs")
        self.drop = nn.Dropout(cfg.dropout)
        if self.with_support:
            self.k = nn.Dense(cfg.hidden_size, name="k")
            self.q = nn.Dense(cfg.hidden_size, name="q")

    def encode_text(self, text: TextBatch, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        org_out = text.bows                                     # level 1

        wemb = self.embed(text.ids)                             # (B,L,Dw)
        gru_seq = self.rnn(wemb, text.mask)                     # (B,L,2H), zeroed pads
        if cfg.gru_pool == "mean":
            gru_out = _masked_mean(gru_seq, text.mask, text.lengths)
        else:
            gru_out = jnp.max(gru_seq * text.mask[..., None], axis=1)
        gru_out = self.drop(gru_out, deterministic=not train)

        con_out = self.convs(gru_seq)                           # level 3
        con_out = self.drop(con_out, deterministic=not train)

        if cfg.concate == "full":
            return jnp.concatenate([gru_out, con_out, org_out], axis=1)
        return jnp.concatenate([gru_out, con_out], axis=1)

    def __call__(self, text: TextBatch, support: Optional[TextBatch] = None,
                 *, train: bool = False):
        feature = self.encode_text(text, train)
        if support is None or not self.with_support:
            return feature
        # support.ids: (B, S, L) -> encode each support caption via vmap over S
        B, S = support.ids.shape[0], support.ids.shape[1]
        flat = TextBatch(
            ids=support.ids.reshape(B * S, -1),
            bows=support.bows.reshape(B * S, -1),
            lengths=support.lengths.reshape(B * S),
            mask=support.mask.reshape(B * S, -1),
        )
        s_feature = self.encode_text(flat, train).reshape(B, S, -1)
        key = self.k(s_feature)                                 # (B,S,Hk)
        query = self.q(feature)                                 # (B,Hk)
        w = jax.nn.softmax(
            jnp.einsum("bsh,bh->bs", key, query), axis=1)[..., None]
        gated_feature = jnp.sum(w * s_feature, axis=1)
        if self.style == "distill_from_best_model":
            return feature, gated_feature
        return feature + gated_feature                          # 'GT'


class DualEncoding(nn.Module):
    """Teacher + student dual encoder (ref Dual_Encoding, model.py:512-705)."""

    cfg: DualEncodingConfig

    def setup(self):
        cfg = self.cfg
        map_dims = (cfg.common_dim,)
        self.vid_encoding = VideoMultilevelEncoding(cfg, name="vid_encoding")
        self.vid_mapping = LatentMapping(map_dims, cfg.dropout, name="vid_mapping")
        teacher_support = cfg.teacher_model != "student"
        self.text_encoding = TextMultilevelEncoding(
            cfg, with_support=teacher_support, style=cfg.style,
            name="text_encoding")
        self.text_mapping = LatentMapping(map_dims, cfg.dropout, name="text_mapping")

        if cfg.style == "distill_from_best_model":
            if cfg.student_model in ("de+map", "text+video"):
                self.student_text_encoding = TextMultilevelEncoding(
                    cfg, with_support=False, name="student_text_encoding")
            student_text_dims = map_dims + (cfg.common_dim,) * cfg.text_resblock_number
            self.student_text_mapping = LatentMapping(
                student_text_dims if cfg.student_model == "text+video" else map_dims,
                cfg.dropout, name="student_text_mapping")
            if cfg.student_model == "text+video":
                self.student_vid_encoding = VideoMultilevelEncoding(
                    cfg, name="student_vid_encoding")
                self.student_vid_mapping = LatentMapping(
                    map_dims, cfg.dropout, name="student_vid_mapping")

    def __call__(self, videos: VideoBatch, text: TextBatch,
                 support: Optional[TextBatch] = None, *, train: bool = False,
                 detach_teacher_feature: bool = False):
        """forward_emb (model.py:609-705). Returns a dict of embeddings."""
        cfg = self.cfg
        out = {}
        out["vid_emb"] = self.vid_mapping(
            self.vid_encoding(videos, train=train), train=train)
        if cfg.style == "distill_from_best_model":
            if cfg.teacher_model == "GT":
                enc = self.text_encoding(text, support, train=train)
                # with no support set the teacher degrades to feature-only
                # (ref Text_multilevel_encoding.forward returns the bare
                # feature when support_text is None, model.py:305-306)
                cap_enc, gated = enc if isinstance(enc, tuple) else (enc, 0.0)
                out["cap_emb"] = self.text_mapping(cap_enc + gated, train=train)
                if cfg.student_model == "map":
                    feat = jax.lax.stop_gradient(cap_enc) if detach_teacher_feature else cap_enc
                    out["student_cap_emb"] = self.student_text_mapping(feat, train=train)
                else:
                    out["student_cap_emb"] = self.student_text_mapping(
                        self.student_text_encoding(text, train=train), train=train)
                if cfg.student_model == "text+video":
                    out["student_vid_emb"] = self.student_vid_mapping(
                        self.student_vid_encoding(videos, train=train), train=train)
            else:  # teacher_model == 'student'
                out["cap_emb"] = self.text_mapping(
                    self.text_encoding(text, train=train), train=train)
                out["student_cap_emb"] = self.student_text_mapping(
                    self.student_text_encoding(text, train=train), train=train)
                if cfg.student_model == "text+video":
                    out["student_vid_emb"] = self.student_vid_mapping(
                        self.student_vid_encoding(videos, train=train), train=train)
        else:  # 'GT'
            out["cap_emb"] = self.text_mapping(
                self.text_encoding(text, support, train=train), train=train)
        return out

    # -- inference entry points (model.py:707-832) -------------------------
    def embed_vis(self, videos: VideoBatch, *, train: bool = False) -> jnp.ndarray:
        return self.vid_mapping(self.vid_encoding(videos, train=train), train=train)

    def embed_vis_distill(self, videos: VideoBatch, *, train: bool = False) -> jnp.ndarray:
        if self.cfg.style == "distill_from_best_model" and \
                self.cfg.student_model == "text+video":
            return self.student_vid_mapping(
                self.student_vid_encoding(videos, train=train), train=train)
        return self.embed_vis(videos, train=train)

    def embed_txt_distill(self, text: TextBatch, *, train: bool = False) -> jnp.ndarray:
        if self.cfg.student_model == "map":
            feat = self.text_encoding(text, None, train=train)
            return self.student_text_mapping(feat, train=train)
        return self.student_text_mapping(
            self.student_text_encoding(text, train=train), train=train)

    def embed_txt_GT(self, text: TextBatch, support: TextBatch,
                     *, train: bool = False) -> jnp.ndarray:
        enc = self.text_encoding(text, support, train=train)
        if isinstance(enc, tuple):
            enc = enc[0] + enc[1]
        return self.text_mapping(enc, train=train)


def make_video_batch(frame_features: Sequence[np.ndarray], max_frames: int = 64
                     ) -> VideoBatch:
    """Pad a list of (T_i, D) frame-feature arrays into a VideoBatch,
    mirroring collate_frame_gru_fn (tag_data_provider.py:24-88): frames are
    subsampled to at most `max_frames` uniformly, mean_origin is the mean of
    ALL original frames."""
    B = len(frame_features)
    D = frame_features[0].shape[1]
    frames = np.zeros((B, max_frames, D), np.float32)
    mask = np.zeros((B, max_frames), np.float32)
    lengths = np.zeros((B,), np.int32)
    origin = np.zeros((B, D), np.float32)
    for i, f in enumerate(frame_features):
        origin[i] = f.mean(axis=0)
        if len(f) > max_frames:
            idx = np.round(np.linspace(0, len(f) - 1, max_frames)).astype(int)
            f = f[idx]
        n = len(f)
        frames[i, :n] = f
        mask[i, :n] = 1.0
        lengths[i] = n
    return VideoBatch(jnp.asarray(frames), jnp.asarray(origin),
                      jnp.asarray(lengths), jnp.asarray(mask))


def make_text_batch(ids_list: Sequence[Sequence[int]], bows: np.ndarray,
                    max_words: int = 0) -> TextBatch:
    """Pad tokenized captions into a TextBatch."""
    B = len(ids_list)
    L = max_words or max(len(x) for x in ids_list)
    ids = np.zeros((B, L), np.int32)
    mask = np.zeros((B, L), np.float32)
    lengths = np.zeros((B,), np.int32)
    for i, x in enumerate(ids_list):
        x = list(x)[:L]
        ids[i, :len(x)] = x
        mask[i, :len(x)] = 1.0
        lengths[i] = len(x)
    return TextBatch(jnp.asarray(ids), jnp.asarray(np.asarray(bows, np.float32)),
                     jnp.asarray(lengths), jnp.asarray(mask))
