"""ST-GCN: spatial-temporal graph convolution for skeleton recognition.

TPU rebuild of MCT/mmaction/models/skeleton_gcn (STGCN): spatial graph
convolution over the joint adjacency (partitioned into identity/
centripetal/centrifugal subsets per the ST-GCN paper) followed by
temporal 1D convolution, with a learnable edge-importance mask per layer.

The graph conv is one einsum per subset — (B*T, V, C) x (V, V) x weights
— so the whole network is matmuls on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES

# COCO-17 skeleton edges (joint pairs) as the default layout
COCO_EDGES = ((0, 1), (0, 2), (1, 3), (2, 4), (0, 5), (0, 6), (5, 7),
              (7, 9), (6, 8), (8, 10), (5, 11), (6, 12), (11, 13),
              (13, 15), (12, 14), (14, 16), (11, 12), (5, 6))

# NTU-RGB+D 25-joint layout (skeleton_gcn/utils/graph.py:107-119,
# 1-based list converted; center = joint 20, the spine)
NTU_EDGES = tuple((i - 1, j - 1) for i, j in
                  ((1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5),
                   (7, 6), (8, 7), (9, 21), (10, 9), (11, 10), (12, 11),
                   (13, 1), (14, 13), (15, 14), (16, 15), (17, 1),
                   (18, 17), (19, 18), (20, 19), (22, 23), (23, 8),
                   (24, 25), (25, 12)))

GRAPH_LAYOUTS = {
    "coco": (17, COCO_EDGES, 0),
    "ntu-rgb+d": (25, NTU_EDGES, 20),
}


def build_partitioned_adjacency(num_joints: int = 17,
                                edges: Tuple = COCO_EDGES,
                                center: int = 0,
                                layout: Optional[str] = None) -> np.ndarray:
    """(3, V, V): identity / centripetal / centrifugal normalized subsets
    (the 'spatial' partition strategy).  `layout` ('coco' | 'ntu-rgb+d')
    overrides (num_joints, edges, center) with the reference Graph's
    named layouts (skeleton_gcn/utils/graph.py)."""
    if layout is not None:
        num_joints, edges, center = GRAPH_LAYOUTS[layout]
    V = num_joints
    adj = np.eye(V)                   # hop-0 self links + hop-1 edges
    for a, b in edges:
        adj[a, b] = adj[b, a] = 1
    # hop distance to the center joint
    dist = np.full(V, 1e9)
    dist[center] = 0
    for _ in range(V):
        for a, b in edges:
            dist[a] = min(dist[a], dist[b] + 1)
            dist[b] = min(dist[b], dist[a] + 1)
    # normalize_digraph (graph.py): norm[j, i] = adj[j, i] / in_deg(i)
    # — COLUMN degree (self-loop included), not the row degree
    deg = adj.sum(0)
    norm_ref = adj / np.maximum(deg[None, :], 1)
    # reference spatial partition over (j, i) in A_ref[source, target]:
    #   hop 0            -> subset 0 (the diagonal)
    #   hop 1, equal or FARTHER source (dist[j] >= dist[i])
    #                    -> subset 1 (root + 'close' merged, graph.py)
    #   hop 1, closer source -> subset 2
    ref = np.zeros((3, V, V))
    for j in range(V):
        for i in range(V):
            if norm_ref[j, i] == 0:
                continue
            if j == i:
                ref[0, j, i] = norm_ref[j, i]
            elif dist[j] >= dist[i]:
                ref[1, j, i] = norm_ref[j, i]
            else:
                ref[2, j, i] = norm_ref[j, i]
    # our block einsum consumes A[k, target, source] -> transpose
    return np.transpose(ref, (0, 2, 1)).astype(np.float32)


class STGCNBlock(nn.Module):
    """mmaction backbones/stgcn.py:23-99 structure: gcn conv (biased)
    -> adjacency einsum -> [BN, ReLU, temporal conv, BN] + residual
    (1x1 conv + BN when shapes change; block 0 runs residual-free)."""

    out_channels: int
    adjacency: Tuple   # static (3, V, V) as nested tuples, OUR
                       # orientation A[k, target, source]
    temporal_stride: int = 1
    temporal_kernel: int = 9
    residual: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, T, V, C)."""
        A = jnp.asarray(np.asarray(self.adjacency, np.float32))
        K, V, _ = A.shape
        B, T, _, C = x.shape
        edge = self.param("edge_importance", nn.initializers.ones,
                          (K, V, V))
        Aw = A * edge
        # spatial graph conv: per-subset linear then neighborhood mix
        # (ConvTemporalGraphical: biased 1x1 conv, stgcn.py:143-152)
        feats = nn.Dense(self.out_channels * K, name="gcn")(x)
        feats = feats.reshape(B, T, V, K, self.out_channels)
        y = jnp.einsum("btvkc,kwv->btwc", feats, Aw,
                       preferred_element_type=jnp.float32)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_gcn")(y)
        y = nn.relu(y)
        # temporal conv over T per joint
        tk, s = self.temporal_kernel, self.temporal_stride
        y = nn.Conv(self.out_channels, (tk, 1), strides=(s, 1),
                    padding=((tk // 2, tk // 2), (0, 0)), name="tcn")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_tcn")(y)
        if not self.residual:
            sc = 0.0
        elif s != 1 or C != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(s, 1),
                         name="residual")(x)
            sc = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              name="bn_res")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


@dataclasses.dataclass(frozen=True)
class STGCNConfig:
    num_joints: int = 17
    in_channels: int = 3             # (x, y, score)
    channels: Tuple[int, ...] = (64, 64, 128, 128, 256, 256)
    temporal_strides: Tuple[int, ...] = (1, 1, 2, 1, 2, 1)
    # checkpoint import: the reference stores the graph as a buffer;
    # pass it here (OUR orientation, A[k, target, source]) to override
    # the built-in COCO spatial partition
    adjacency: Optional[Tuple] = None
    layout: Optional[str] = None     # 'coco' | 'ntu-rgb+d' named graph


class AGCNBlock(nn.Module):
    """Adaptive graph conv block (2s-AGCN; reference backbones/agcn.py:
    43-236): per subset k the adjacency is A_k + PA_k (learned, ~0 init)
    + a data-dependent attention adjacency softmax(theta(x)^T phi(x)),
    followed by the usual temporal conv, residual around both."""

    out_channels: int
    adjacency: Tuple   # static (K, V, V) nested tuples, REFERENCE
                       # orientation A[k, source, target] (agcn.py's
                       # matmul(x, A1) contracts over source)
    temporal_stride: int = 1
    temporal_kernel: int = 9
    residual: bool = True     # agcn.py:281-289: block 0 runs without

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, T, V, C)."""
        A = jnp.asarray(np.asarray(self.adjacency, np.float32))
        K, V, _ = A.shape
        B, T, _, C = x.shape
        PA = self.param("PA", nn.initializers.constant(1e-6), (K, V, V))
        A = A + PA
        inter = max(self.out_channels // 4, 1)

        bn = lambda name, **kw: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name=name, **kw)

        y = None
        for k in range(K):
            a = nn.Dense(inter, name=f"conv_a{k}")(x)      # (B,T,V,i)
            b = nn.Dense(inter, name=f"conv_b{k}")(x)
            a_r = a.transpose(0, 2, 3, 1).reshape(B, V, inter * T)
            b_r = b.transpose(0, 3, 1, 2).reshape(B, inter * T, V)
            att = jax.nn.softmax(
                jnp.einsum("bvm,bmw->bvw", a_r, b_r,
                           preferred_element_type=jnp.float32)
                / (inter * T), axis=-2)
            Ak = att + A[k]
            agg = jnp.einsum("btvc,bvw->btwc", x, Ak,
                             preferred_element_type=jnp.float32)
            z = nn.Dense(self.out_channels, name=f"conv_d{k}")(agg)
            y = z if y is None else y + z
        # gcn output BN starts ~0 so early training leans on the skip
        y = bn("bn_gcn", scale_init=nn.initializers.constant(1e-6))(y)
        if C != self.out_channels:
            sc = bn("bn_down")(nn.Dense(self.out_channels, name="down")(x))
        else:
            sc = x
        g = nn.relu(y + sc)

        # temporal conv + block residual
        tk, s = self.temporal_kernel, self.temporal_stride
        t = nn.Conv(self.out_channels, (tk, 1), strides=(s, 1),
                    padding=((tk // 2, tk // 2), (0, 0)), name="tcn")(g)
        t = bn("bn_tcn")(t)
        if not self.residual:
            res = 0.0
        elif s != 1 or C != self.out_channels:
            res = bn("bn_res")(nn.Conv(self.out_channels, (1, 1),
                                       strides=(s, 1), name="residual")(x))
        else:
            res = x
        return nn.relu(t + res)


@dataclasses.dataclass(frozen=True)
class AGCNConfig:
    num_joints: int = 17
    in_channels: int = 3
    channels: Tuple[int, ...] = (64, 64, 64, 64, 128, 128, 128, 256, 256,
                                 256)
    temporal_strides: Tuple[int, ...] = (1, 1, 1, 1, 2, 1, 1, 2, 1, 1)
    # checkpoint import: override with the reference's graph buffer
    # (A[k, source, target] — used as-is by the block einsum)
    adjacency: Optional[Tuple] = None
    layout: Optional[str] = None     # 'coco' | 'ntu-rgb+d' named graph


@BACKBONES.register("AGCN")
class AGCN(nn.Module):
    """Two-stream Adaptive GCN backbone (skeleton recognition)."""

    cfg: AGCNConfig

    @nn.compact
    def __call__(self, keypoints: jnp.ndarray, *, train: bool = False):
        """keypoints: (B, T, V, C) -> pooled feature (B, channels[-1])."""
        cfg = self.cfg
        if cfg.adjacency is not None:
            A_t = cfg.adjacency
        else:
            A = build_partitioned_adjacency(cfg.num_joints,
                                            layout=cfg.layout)
            A_t = tuple(tuple(tuple(r) for r in s) for s in A)
        # per-(joint, channel) data_bn like the reference's
        # BatchNorm1d(V*C) (agcn.py:277-279, 325-331)
        B, T, V, C = keypoints.shape
        x = keypoints.reshape(B, T, V * C)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="data_bn")(x)
        x = x.reshape(B, T, V, C)
        for i, (c, s) in enumerate(zip(cfg.channels, cfg.temporal_strides)):
            x = AGCNBlock(c, A_t, s, residual=i > 0,
                          name=f"block_{i}")(x, train=train)
        return jnp.mean(x, axis=(1, 2))


@BACKBONES.register("STGCN")
class STGCN(nn.Module):
    cfg: STGCNConfig

    @nn.compact
    def __call__(self, keypoints: jnp.ndarray, *, train: bool = False):
        """keypoints: (B, T, V, C) -> pooled feature (B, channels[-1])."""
        cfg = self.cfg
        if cfg.adjacency is not None:
            A_t = cfg.adjacency
        else:
            A = build_partitioned_adjacency(cfg.num_joints,
                                            layout=cfg.layout)
            A_t = tuple(tuple(tuple(r) for r in s) for s in A)
        # data_bn normalizes per (joint, channel) pair like the
        # reference's BatchNorm1d(V*C) on (N*M, V*C, T)
        # (stgcn.py:212-215, 262-266)
        B, T, V, C = keypoints.shape
        x = keypoints.reshape(B, T, V * C)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="data_bn")(x)
        x = x.reshape(B, T, V, C)
        for i, (c, s) in enumerate(zip(cfg.channels, cfg.temporal_strides)):
            x = STGCNBlock(c, A_t, s, residual=i > 0,
                           name=f"block_{i}")(x, train=train)
        return jnp.mean(x, axis=(1, 2))


class SkeletonClassifier(nn.Module):
    """Person-averaged skeleton recognizer: the backbone runs per
    person, pooled features average over the M axis before the
    classifier — STGCNHead's num_person semantics
    (heads/stgcn_head.py:46-57: pool, view (n/M, M, -1), mean(1), fc)."""

    backbone: nn.Module
    num_classes: int
    dropout_ratio: float = 0.0

    @nn.compact
    def __call__(self, keypoints: jnp.ndarray, *, train: bool = False):
        """keypoints: (B, M, T, V, C) -> class scores (B, num_classes)."""
        from .heads import I3DHead
        B, M = keypoints.shape[:2]
        feat = self.backbone(
            keypoints.reshape((B * M,) + keypoints.shape[2:]),
            train=train)
        feat = feat.reshape(B, M, -1).mean(axis=1)
        return I3DHead(self.num_classes, self.dropout_ratio,
                       name="cls_head")(feat, train=train)
