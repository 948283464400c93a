"""3D-CNN video backbones: ResNet3D, SlowOnly, SlowFast, X3D.

TPU rebuilds of the MCT/mmaction backbone family
(mmaction/models/backbones/resnet3d.py, resnet3d_slowfast.py, x3d.py):

* `ResNet3D` — inflated ResNet with (1+3)D-style stage config:
  `conv1_t / stage temporal kernels` follow the SlowOnly/SlowFast recipes
  (pathway configs below);
* `SlowFast` — two ResNet3D pathways (slow: low rate, more channels;
  fast: high rate, thin) with fast->slow lateral time-strided conv
  fusion after each stage;
* `X3D` — mobile-style expanded 3D bottlenecks with SE and swish.

Everything is channels-last (N, T, H, W, C); temporal convs use
lax-friendly `nn.Conv` with 3D kernels so XLA maps them onto the MXU as
implicit GEMMs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import BACKBONES


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Bottleneck3D(nn.Module):
    planes: int
    spatial_stride: int = 1
    temporal_kernel: int = 3       # 3 -> 3x1x1 conv1 (inflated), 1 -> 2D-like
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        tk = self.temporal_kernel
        out = nn.Conv(self.planes, (tk, 1, 1),
                      padding=((tk // 2, tk // 2), (0, 0), (0, 0)),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        s = self.spatial_stride
        out = nn.Conv(self.planes, (1, 3, 3), strides=(1, s, s),
                      padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                      name="conv2")(out)
        out = nn.relu(_bn(train, "bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                      use_bias=False, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if s != 1 or x.shape[-1] != self.planes * self.expansion:
            sc = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                         strides=(1, s, s), use_bias=False,
                         name="downsample")(x)
            sc = _bn(train, "bn_down")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class NonLocal3DBlock(nn.Module):
    """mmcv NonLocal3d, embedded-gaussian mode (the slowonly_r50_nl
    non_local_cfg: sub_sample=True, use_scale=True, BN3d on conv_out).
    g/theta/phi are biased 1x1x1 convs to C/2; sub_sample max-pools g
    and phi spatially by 2; the attention-weighted values project back
    through a bias-free conv_out + BN and add residually."""

    sub_sample: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        C = x.shape[-1]
        inter = max(1, C // 2)
        g = nn.Conv(inter, (1, 1, 1), name="g")(x)
        theta = nn.Conv(inter, (1, 1, 1), name="theta")(x)
        phi = nn.Conv(inter, (1, 1, 1), name="phi")(x)
        if self.sub_sample:
            g = nn.max_pool(g, (1, 2, 2), strides=(1, 2, 2))
            phi = nn.max_pool(phi, (1, 2, 2), strides=(1, 2, 2))
        B = x.shape[0]
        tq = theta.reshape(B, -1, inter)
        pk = phi.reshape(B, -1, inter)
        gv = g.reshape(B, -1, inter)
        attn = jnp.einsum("bqc,bkc->bqk", tq, pk,
                          preferred_element_type=jnp.float32)
        if self.use_scale:
            attn = attn / jnp.sqrt(jnp.float32(inter))
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, gv.astype(jnp.float32))
        y = y.astype(x.dtype).reshape(x.shape[:-1] + (inter,))
        y = nn.Conv(C, (1, 1, 1), use_bias=False, name="conv_out")(y)
        y = _bn(train, "bn_out")(y)
        return x + y


@dataclasses.dataclass(frozen=True)
class ResNet3DConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)       # depth 50
    base_channels: int = 64
    conv1_kernel_t: int = 1        # SlowOnly: 1; I3D/SlowFast-fast: 5
    conv1_stride_t: int = 1
    pool1_stride_t: int = 1
    stage_temporal_kernels: Tuple[int, ...] = (1, 1, 3, 3)  # SlowOnly recipe
    channel_ratio: int = 1         # fast pathway uses 8x thinner channels
    # AVA detection keeps the last stage at stride 1 for finer RoI maps
    # (configs/detection/ava/*.py spatial_strides=(1, 2, 2, 1))
    stage_spatial_strides: Tuple[int, ...] = (1, 2, 2, 2)
    # per-stage per-block non-local flags, e.g. the slowonly_r50_nl
    # family's ((0,0,0), (1,0,1,0), (1,0,1,0,1,0), (0,0,0))
    # (resnet3d.py:131-133 NonLocal3d after the flagged bottlenecks);
    # () = none
    non_local: Tuple[Tuple[int, ...], ...] = ()
    # exact-math space-to-depth retiling of the 7x7 stride-2 stem
    # (ops/s2d_stem.py — the thin fast-pathway stem tiles the MXU at 6%;
    # same param tree, same outputs).  Off pending the on-chip A/B.
    s2d_stem: bool = False


@BACKBONES.register("ResNet3D")
class ResNet3D(nn.Module):
    cfg: ResNet3DConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False,
                 return_stages: bool = False, include_stem: bool = False):
        """videos: (B, T, H, W, 3) -> pooled feature (B, C) or stage list
        (prepended with the post-pool stem when include_stem, for the
        SlowFast conv1_lateral fusion point)."""
        cfg = self.cfg
        c0 = cfg.base_channels // cfg.channel_ratio
        kt = cfg.conv1_kernel_t
        if cfg.s2d_stem:
            from ..ops.s2d_stem import s2d_stem_conv
            from .layers import KernelParams
            k = KernelParams((kt, 7, 7, videos.shape[-1], c0),
                             name="conv1")
            x = s2d_stem_conv(videos, k.kernel,
                              stride_t=cfg.conv1_stride_t)
        else:
            x = nn.Conv(c0, (kt, 7, 7),
                        strides=(cfg.conv1_stride_t, 2, 2),
                        padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
                        use_bias=False, name="conv1")(videos)
        x = nn.relu(_bn(train, "bn1")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(cfg.pool1_stride_t, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        stages = [x] if (return_stages and include_stem) else []
        planes = c0
        for i, (blocks, tk) in enumerate(zip(cfg.stage_blocks,
                                             cfg.stage_temporal_kernels)):
            stride = cfg.stage_spatial_strides[i]
            nl = cfg.non_local[i] if i < len(cfg.non_local) else ()
            for j in range(blocks):
                x = Bottleneck3D(planes, stride if j == 0 else 1, tk,
                                 name=f"layer{i+1}_{j}")(x, train=train)
                if j < len(nl) and nl[j]:
                    x = NonLocal3DBlock(
                        name=f"layer{i+1}_{j}_nl")(x, train=train)
            stages.append(x)
            planes *= 2
        if return_stages:
            return stages
        return jnp.mean(x, axis=(1, 2, 3))             # global avg pool


SLOWONLY_CFG = ResNet3DConfig()  # 1x1x1 conv1, temporal kernels late


def _bn_csn(train: bool, name: str):
    # mmaction CSN norm_cfg: BN3d with eps=1e-3 (resnet3d_csn.py:94)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, name=name)


class CSNBottleneck(nn.Module):
    """Channel-Separated bottleneck (mmaction backbones/resnet3d_csn.py):
    the 3x3x3 conv is DEPTHWISE (groups = channels); 'ip' keeps an extra
    1x1x1 pointwise conv (+BN, no act) before it, 'ir' drops it.  Stage
    transitions stride BOTH time and space (temporal_strides=(1,2,2,2))."""

    planes: int
    stride: int = 1
    temporal_stride: int = 1
    mode: str = "ir"              # 'ir' | 'ip'
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                      name="conv1")(x)
        out = nn.relu(_bn_csn(train, "bn1")(out))
        if self.mode == "ip":
            out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                          name="conv2_point")(out)
            out = _bn_csn(train, "bn_point")(out)
        s, t = self.stride, self.temporal_stride
        out = nn.Conv(self.planes, (3, 3, 3), strides=(t, s, s),
                      padding=1, feature_group_count=self.planes,
                      use_bias=False, name="conv2_depth")(out)
        out = nn.relu(_bn_csn(train, "bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                      use_bias=False, name="conv3")(out)
        out = _bn_csn(train, "bn3")(out)
        if s > 1 or t > 1 or x.shape[-1] != self.planes * self.expansion:
            sc = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                         strides=(t, s, s), use_bias=False,
                         name="conv_down")(x)
            sc = _bn_csn(train, "bn_down")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


@dataclasses.dataclass(frozen=True)
class CSNConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    base_channels: int = 64
    mode: str = "ir"              # ir-CSN / ip-CSN
    temporal_strides: Tuple[int, ...] = (1, 2, 2, 2)


@BACKBONES.register("CSN")
class CSN(nn.Module):
    """Channel-Separated Network (ir/ip-CSN-50/152 family)."""

    cfg: CSNConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """videos: (B, T, H, W, 3) -> pooled feature (B, C)."""
        cfg = self.cfg
        x = nn.Conv(cfg.base_channels, (3, 7, 7), strides=(1, 2, 2),
                    padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                    name="conv1")(videos)
        x = nn.relu(_bn_csn(train, "bn1")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        planes = cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            x = CSNBottleneck(planes, stride, cfg.temporal_strides[i],
                              cfg.mode,
                              name=f"layer{i+1}_0")(x, train=train)
            for j in range(1, blocks):
                x = CSNBottleneck(planes, 1, 1, cfg.mode,
                                  name=f"layer{i+1}_{j}")(x, train=train)
            planes *= 2
        return jnp.mean(x, axis=(1, 2, 3))


@dataclasses.dataclass(frozen=True)
class SlowFastConfig:
    depth_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    alpha: int = 4                 # fast frame rate multiple (slow takes
                                   # every alpha-th frame of the fast input)
    beta_inv: int = 8              # fast channel thinning
    base_channels: int = 64
    lateral_kernel_t: int = 5
    # per-stage spatial strides on BOTH pathways; the AVA detection
    # configs use (1, 2, 2, 1) to keep stride-16 RoI maps
    # (configs/detection/ava/*.py spatial_strides)
    spatial_strides: Tuple[int, ...] = (1, 2, 2, 2)
    # BN+ReLU after each lateral conv (ResNet3dPathway lateral_norm;
    # the slowfast_r50_8x8 steplr / prebn / multigrid checkpoints all
    # train with it — importing one without this flag would silently
    # drop the lateral BN)
    lateral_norm: bool = False
    # route the FAST pathway stem through the exact-math space-to-depth
    # retiling (ops/s2d_stem.py; param tree unchanged) — the roofline's
    # top offender op.  Off pending the on-chip A/B.
    fast_s2d_stem: bool = False


@BACKBONES.register("SlowFast")
class SlowFast(nn.Module):
    cfg: SlowFastConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False,
                 return_stages: bool = False):
        """videos: (B, T, H, W, 3) fast-rate input.  Slow pathway samples
        every alpha-th frame.  Returns concat pooled (B, C_slow + C_fast),
        or with ``return_stages`` the temporally pooled dual-pathway map
        list for the AVA RoI head."""
        cfg = self.cfg
        fast_in = videos
        slow_in = videos[:, ::cfg.alpha]

        # fast pathway: thin channels, temporal conv1
        fast_cfg = ResNet3DConfig(
            stage_blocks=cfg.depth_blocks, base_channels=cfg.base_channels,
            conv1_kernel_t=5, stage_temporal_kernels=(3, 3, 3, 3),
            channel_ratio=cfg.beta_inv,
            stage_spatial_strides=cfg.spatial_strides,
            s2d_stem=cfg.fast_s2d_stem)
        fast_feats = ResNet3D(fast_cfg, name="fast")(
            fast_in, train=train, return_stages=True, include_stem=True)
        # fast_feats: [stem, stage1..stage4] — the mmaction fusion points
        # (resnet3d_slowfast.py forward: conv1_lateral after the stem,
        # layer{1..3}_lateral after stages 1-3; none after the last stage)

        # slow pathway with lateral concat BEFORE each stage
        c0 = cfg.base_channels
        kt = 1
        x = nn.Conv(c0, (kt, 7, 7), strides=(1, 2, 2),
                    padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                    name="slow_conv1")(slow_in)
        x = nn.relu(_bn(train, "slow_bn1")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        planes = c0
        tks = (1, 1, 3, 3)
        for i, blocks in enumerate(cfg.depth_blocks):
            stride = cfg.spatial_strides[i]
            # time-strided lateral conv brings the fast pathway's previous
            # fusion point to the slow frame rate (conv1_lateral is
            # lateral_0 here, layer{i}_lateral is lateral_{i})
            fast_feat = fast_feats[i]
            lk = cfg.lateral_kernel_t
            lateral = nn.Conv(
                fast_feat.shape[-1] * 2, (lk, 1, 1),
                strides=(cfg.alpha, 1, 1),
                padding=((lk // 2, lk // 2), (0, 0), (0, 0)),
                use_bias=False, name=f"lateral_{i}")(fast_feat)
            if cfg.lateral_norm:
                lateral = nn.relu(_bn(train, f"lateral_bn_{i}")(lateral))
            t = min(x.shape[1], lateral.shape[1])
            x = jnp.concatenate([x[:, :t], lateral[:, :t]], axis=-1)
            x = Bottleneck3D(planes, stride, tks[i], name=f"slow_l{i+1}_0")(
                x, train=train)
            for j in range(1, blocks):
                x = Bottleneck3D(planes, 1, tks[i], name=f"slow_l{i+1}_{j}")(
                    x, train=train)
            planes *= 2
        if return_stages:
            # AVA detection path (SingleRoIExtractor3D
            # with_temporal_pool=True): temporal-pool each pathway,
            # concat channels -> one (B, 1, H', W', Cs+Cf) map for the
            # RoI head (configs/detection/ava/slowfast_*.py)
            slow_map = x.mean(axis=1, keepdims=True)
            fast_map = fast_feats[-1].mean(axis=1, keepdims=True)
            return [jnp.concatenate([slow_map, fast_map], axis=-1)]
        slow_pool = jnp.mean(x, axis=(1, 2, 3))
        fast_pool = jnp.mean(fast_feats[-1], axis=(1, 2, 3))
        return jnp.concatenate([slow_pool, fast_pool], axis=-1)


def se_round_width(width: float, min_width: int = 8,
                   divisor: int = 8) -> int:
    """mmaction x3d.py SEModule._round_width: the SE bottleneck is the
    scaled width rounded to a multiple of 8 (min 8, +8 if it dropped
    below 90%)."""
    out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if out < 0.9 * width:
        out += divisor
    return int(out)


class SEBlock(nn.Module):
    ratio: float = 1 / 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2, 3))
        s = nn.relu(nn.Dense(se_round_width(c * self.ratio),
                             name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(c, name="fc2")(s))
        return x * s[:, None, None, None, :]


class X3DBlock(nn.Module):
    planes: int
    inner: int
    spatial_stride: int = 1
    use_se: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.Conv(self.inner, (1, 1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        s = self.spatial_stride
        # depthwise 3x3x3
        out = nn.Conv(self.inner, (3, 3, 3), strides=(1, s, s),
                      padding=((1, 1), (1, 1), (1, 1)),
                      feature_group_count=self.inner, use_bias=False,
                      name="conv2")(out)
        out = _bn(train, "bn2")(out)
        if self.use_se:
            out = SEBlock(name="se")(out)
        out = nn.swish(out)
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                      name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if s != 1 or x.shape[-1] != self.planes:
            sc = nn.Conv(self.planes, (1, 1, 1), strides=(1, s, s),
                         use_bias=False, name="downsample")(x)
            sc = _bn(train, "bn_down")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


@dataclasses.dataclass(frozen=True)
class X3DConfig:
    stage_blocks: Tuple[int, ...] = (3, 5, 11, 7)      # X3D-M
    stage_channels: Tuple[int, ...] = (24, 48, 96, 192)
    expansion: float = 2.25
    feat_dim: int = 432
    se_style: str = "half"        # mmaction default: SE on every other
                                  # block (x3d.py:397-398); "all" everywhere


@BACKBONES.register("X3D")
class X3D(nn.Module):
    cfg: X3DConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        cfg = self.cfg
        c0 = cfg.stage_channels[0]
        x = nn.Conv(c0, (1, 3, 3), strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    name="stem_s")(videos)
        x = nn.Conv(c0, (5, 1, 1), padding=((2, 2), (0, 0), (0, 0)),
                    feature_group_count=c0, use_bias=False,
                    name="stem_t")(x)
        x = nn.relu(_bn(train, "stem_bn")(x))
        for i, (blocks, ch) in enumerate(zip(cfg.stage_blocks,
                                             cfg.stage_channels)):
            inner = int(ch * cfg.expansion)
            for j in range(blocks):
                use_se = (cfg.se_style == "all" or j % 2 == 0)
                x = X3DBlock(ch, inner, 2 if j == 0 else 1, use_se,
                             name=f"s{i+1}_{j}")(x, train=train)
        x = nn.Conv(cfg.feat_dim, (1, 1, 1), use_bias=False, name="conv5")(x)
        x = nn.relu(_bn(train, "bn5")(x))
        return jnp.mean(x, axis=(1, 2, 3))
