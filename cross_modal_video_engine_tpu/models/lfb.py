"""Long-Term Feature Bank (LFB), FBO fusion heads, and the ACRN head.

TPU-first rebuild of the reference's detection shared heads:

* `LongTermFeatureBank` — the bank itself.  The reference stores a
  pickle of {video: {second: [roi tensors]}} and gathers a 60 s window
  with python loops per RoI (MCT/mmaction/models/common/lfb.py:18-189).
  Here the bank is three dense device arrays — ``features``
  (num_steps, capacity, C) zero-padded per (video, second) step, a
  (V, S) ``step_table`` of row ids (-1 where empty), and per-video
  start seconds — so sampling a window is ONE vectorized gather that
  jits: `sample_window` returns (window*capacity, C) with zeros for
  missing steps, exactly the layout `sample_long_term_features`
  produces (lfb.py:153-180).
* `NonLocalLayer` / `FBONonLocal` — the modified non-local block
  stack fusing short-term RoI features with the long-term window
  (models/heads/fbo_head.py:21-283): latent 1x1 projections (Dense in
  channels-last), scaled theta·phi softmax, LayerNorm + ReLU
  pre-activation, out projection, dropout, residual.
* `FBOAvg` / `FBOMax` — parameter-free pooling operators
  (fbo_head.py:286-321).
* `FBOHead` — temporal-avg + spatial-max pool of the RoI feature,
  FBO fusion, concat [identity, fbo] on channels
  (fbo_head.py:324-401).
* `ACRNHead` — actor-centric relation head (heads/misc_head.py:16-134):
  max-pool the RoI feature, tile over the context map, concat with the
  RoI's batch context, 1x1x1 conv + (1,3,3) conv stack (BN + ReLU).
* `LFBInferHead`-equivalent bank building lives in
  train/detection_trainer.build_lfb (the reference head hoards
  features in forward and pickles them in __del__,
  heads/lfb_infer_head.py:17-148 — here it is an explicit pass).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "LongTermFeatureBank", "LFBBuilder", "NonLocalLayer", "FBONonLocal",
    "FBOAvg", "FBOMax", "FBOHead", "FBOHeadConfig", "ACRNHead",
    "ACRNHeadConfig",
]


# ---------------------------------------------------------------------------
# the bank
# ---------------------------------------------------------------------------

class LFBBuilder:
    """Accumulates RoI features keyed by (video_id, second) and
    finalizes to the dense device layout."""

    def __init__(self, channels: int, capacity: int = 5):
        self.channels = channels
        self.capacity = capacity
        self._store: Dict[str, Dict[int, List[np.ndarray]]] = {}

    def add(self, video_id: str, timestamp, features: np.ndarray) -> None:
        """features: (n, C) RoI rows for one keyframe."""
        sec = int(timestamp)
        vid = self._store.setdefault(video_id, {})
        rows = vid.setdefault(sec, [])
        for f in np.asarray(features, np.float32).reshape(-1, self.channels):
            rows.append(f)

    def build(self, seed: int = 0) -> "LongTermFeatureBank":
        """Pad/sample each (video, second) to `capacity` rows (the
        reference samples K=max_num_sampled_feat without replacement at
        window time, lfb.py:166-176; we sample once at build)."""
        rng = np.random.default_rng(seed)
        video_ids = sorted(self._store)
        sec_min, sec_max = {}, {}
        for v in video_ids:
            secs = self._store[v].keys()
            sec_min[v] = min(secs)
            sec_max[v] = max(secs)
        span = max((sec_max[v] - sec_min[v] + 1 for v in video_ids),
                   default=1)
        steps: List[np.ndarray] = []
        counts: List[int] = []
        table = -np.ones((max(len(video_ids), 1), span), np.int32)
        for vi, v in enumerate(video_ids):
            for sec, rows in sorted(self._store[v].items()):
                feats = np.stack(rows)
                if len(feats) > self.capacity:
                    sel = rng.choice(len(feats), self.capacity,
                                     replace=False)
                    feats = feats[sel]
                pad = np.zeros((self.capacity, self.channels), np.float32)
                pad[:len(feats)] = feats
                table[vi, sec - sec_min[v]] = len(steps)
                steps.append(pad)
                counts.append(len(feats))
        features = (np.stack(steps) if steps
                    else np.zeros((1, self.capacity, self.channels),
                                  np.float32))
        return LongTermFeatureBank(
            features=jnp.asarray(features),
            step_table=jnp.asarray(table),
            start_sec=jnp.asarray([sec_min[v] for v in video_ids]
                                  or [0], jnp.int32),
            counts=jnp.asarray(counts or [0], jnp.int32),
            video_index={v: i for i, v in enumerate(video_ids)},
            capacity=self.capacity)


@dataclasses.dataclass
class LongTermFeatureBank:
    """Device-resident LFB; `sample_window` is jit-compatible."""

    features: jnp.ndarray          # (num_steps, capacity, C)
    step_table: jnp.ndarray        # (V, S) row ids, -1 = empty
    start_sec: jnp.ndarray         # (V,)
    counts: jnp.ndarray            # (num_steps,)
    video_index: Dict[str, int]
    capacity: int

    @property
    def channels(self) -> int:
        return self.features.shape[-1]

    def sample_window(self, video_idx, timestamp, window_size: int = 60
                      ) -> jnp.ndarray:
        """(window_size * capacity, C) long-term features centered on
        `timestamp` (start = ts - window//2, lfb.py:162-163), zeros
        where a second has no stored features."""
        start = timestamp - window_size // 2 - self.start_sec[video_idx]
        offs = start + jnp.arange(window_size)
        S = self.step_table.shape[1]
        in_range = (offs >= 0) & (offs < S)
        rows = self.step_table[video_idx, jnp.clip(offs, 0, S - 1)]
        rows = jnp.where(in_range, rows, -1)
        valid = rows >= 0
        feats = self.features[jnp.clip(rows, 0, None)]
        # zero invalid seconds and padded slots beyond each second's
        # true count in one mask
        slot_ok = (jnp.arange(self.capacity)[None, :]
                   < self.counts[jnp.clip(rows, 0, None)][:, None])
        feats = jnp.where((valid[:, None] & slot_ok)[..., None], feats, 0.0)
        return feats.reshape(window_size * self.capacity, -1)

    def sample_batch(self, video_idxs, timestamps, window_size: int = 60
                     ) -> jnp.ndarray:
        """(N, window*capacity, C) via vmap — the per-RoI python loop
        of FBOHead.sample_lfb (fbo_head.py:374-384) becomes one
        program."""
        return jax.vmap(
            lambda v, t: self.sample_window(v, t, window_size)
        )(jnp.asarray(video_idxs), jnp.asarray(timestamps))

    # -- persistence (np.savez replaces the reference's pickle) ------------
    def save(self, path: str) -> None:
        np.savez(path, features=np.asarray(self.features),
                 step_table=np.asarray(self.step_table),
                 start_sec=np.asarray(self.start_sec),
                 counts=np.asarray(self.counts),
                 video_ids=np.array(sorted(self.video_index,
                                           key=self.video_index.get)),
                 capacity=self.capacity)

    @classmethod
    def load(cls, path: str) -> "LongTermFeatureBank":
        z = np.load(path, allow_pickle=False)
        vids = [str(v) for v in z["video_ids"]]
        return cls(features=jnp.asarray(z["features"]),
                   step_table=jnp.asarray(z["step_table"]),
                   start_sec=jnp.asarray(z["start_sec"]),
                   counts=jnp.asarray(z["counts"]),
                   video_index={v: i for i, v in enumerate(vids)},
                   capacity=int(z["capacity"]))


# ---------------------------------------------------------------------------
# FBO operators
# ---------------------------------------------------------------------------

class NonLocalLayer(nn.Module):
    """fbo_head.py:21-170 in channels-last: st (N, S, C), lt (N, L, C)
    -> (N, S, C)."""

    latent_channels: int
    out_channels: int
    use_scale: bool = True
    pre_activate: bool = True
    dropout: float = 0.2

    @nn.compact
    def __call__(self, st_feat: jnp.ndarray, lt_feat: jnp.ndarray,
                 *, train: bool = False) -> jnp.ndarray:
        c = self.latent_channels
        theta = nn.Dense(c, name="st_feat_conv")(st_feat)     # (N, S, c)
        phi = nn.Dense(c, name="lt_feat_conv")(lt_feat)       # (N, L, c)
        g = nn.Dense(c, name="global_conv")(lt_feat)          # (N, L, c)
        attn = jnp.einsum("nsc,nlc->nsl", theta, phi)
        if self.use_scale:
            attn = attn / jnp.sqrt(jnp.asarray(c, attn.dtype))
        p = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nsl,nlc->nsc", p, g)
        if self.pre_activate:
            out = nn.LayerNorm(name="ln")(out)
            out = nn.relu(out)
        out = nn.Dense(self.out_channels, name="out_conv")(out)
        if not self.pre_activate:
            out = nn.LayerNorm(name="ln")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class FBONonLocal(nn.Module):
    """fbo_head.py:173-283: project st/lt to the latent width, then a
    residual stack of non-local layers."""

    latent_channels: int = 512
    num_non_local_layers: int = 2
    st_feat_dropout: float = 0.2
    lt_feat_dropout: float = 0.2
    pre_activate: bool = True

    @nn.compact
    def __call__(self, st_feat: jnp.ndarray, lt_feat: jnp.ndarray,
                 *, train: bool = False) -> jnp.ndarray:
        c = self.latent_channels
        st = nn.Dense(c, name="st_feat_conv")(st_feat)
        st = nn.Dropout(self.st_feat_dropout,
                        deterministic=not train)(st)
        lt = nn.Dense(c, name="lt_feat_conv")(lt_feat)
        lt = nn.Dropout(self.lt_feat_dropout,
                        deterministic=not train)(lt)
        for i in range(self.num_non_local_layers):
            nl = NonLocalLayer(c, c, pre_activate=self.pre_activate,
                               name=f"non_local_layer_{i + 1}")(
                st, lt, train=train)
            st = st + nl
            if not self.pre_activate:
                st = nn.relu(st)
        return st


class FBOAvg(nn.Module):
    @nn.compact
    def __call__(self, st_feat, lt_feat, *, train: bool = False):
        return lt_feat.mean(axis=1, keepdims=True)


class FBOMax(nn.Module):
    @nn.compact
    def __call__(self, st_feat, lt_feat, *, train: bool = False):
        return lt_feat.max(axis=1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class FBOHeadConfig:
    fbo_type: str = "non_local"    # | 'avg' | 'max'
    latent_channels: int = 512
    num_non_local_layers: int = 2
    temporal_pool: str = "avg"
    spatial_pool: str = "max"


class FBOHead(nn.Module):
    """fbo_head.py:324-401: RoI feature (N, T, H, W, C) + long-term
    window (N, L, C_lt) -> concat([identity, fbo]) (N, 1, 1, 1, C')."""

    cfg: FBOHeadConfig

    @nn.compact
    def __call__(self, roi_feat: jnp.ndarray, lt_feat: jnp.ndarray,
                 *, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        x = (roi_feat.mean(axis=1) if cfg.temporal_pool == "avg"
             else roi_feat.max(axis=1))                       # (N, H, W, C)
        x = (x.max(axis=(1, 2)) if cfg.spatial_pool == "max"
             else x.mean(axis=(1, 2)))                        # (N, C)
        st = x[:, None, :]                                    # (N, 1, C)
        if cfg.fbo_type == "non_local":
            fbo = FBONonLocal(cfg.latent_channels,
                              cfg.num_non_local_layers,
                              name="fbo")(st, lt_feat, train=train)
        elif cfg.fbo_type == "avg":
            fbo = FBOAvg(name="fbo")(st, lt_feat, train=train)
        else:
            fbo = FBOMax(name="fbo")(st, lt_feat, train=train)
        out = jnp.concatenate([st, fbo], axis=-1)             # (N, 1, C')
        return out.reshape(out.shape[0], 1, 1, 1, -1)         # (N,1,1,1,C')


@dataclasses.dataclass(frozen=True)
class ACRNHeadConfig:
    out_channels: int = 512
    stride: int = 1
    num_convs: int = 1


class ACRNHead(nn.Module):
    """misc_head.py:16-134 in channels-last.

    roi_feat (N, T, H, W, C) is max-pooled to a vector, tiled over the
    context map's (T, H, W), concatenated with the RoI's batch context
    `feat[batch_idx]`, then 1x1x1 conv -> (1,3,3) conv stack, each
    BN + ReLU."""

    cfg: ACRNHeadConfig

    @nn.compact
    def __call__(self, roi_feat: jnp.ndarray, feat: jnp.ndarray,
                 rois: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, name=name)

        x = roi_feat.max(axis=(1, 2, 3))                     # (N, C)
        batch_idx = rois[:, 0].astype(jnp.int32)
        ctx = feat[batch_idx]                                # (N, T, H, W, Cc)
        T, H, W = ctx.shape[1:4]
        x_tile = jnp.broadcast_to(x[:, None, None, None, :],
                                  (x.shape[0], T, H, W, x.shape[-1]))
        y = jnp.concatenate([x_tile, ctx], axis=-1)
        y = nn.relu(bn("bn1")(nn.Conv(cfg.out_channels, (1, 1, 1),
                                      use_bias=False, name="conv1")(y)))
        s = cfg.stride
        y = nn.relu(bn("bn2")(nn.Conv(
            cfg.out_channels, (1, 3, 3), strides=(1, s, s),
            padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
            name="conv2")(y)))
        for i in range(cfg.num_convs - 1):
            y = nn.relu(bn(f"bn_extra{i}")(nn.Conv(
                cfg.out_channels, (1, 3, 3),
                padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                name=f"conv_extra{i}")(y)))
        return y
