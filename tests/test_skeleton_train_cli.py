"""Skeleton family end-to-end: STGCN / 2s-AGCN (joint + bone streams) /
PoseC3D recipes train on synthetic pose data via cli/skeleton_train and
the loss decreases."""

import pickle

import numpy as np

from cross_modal_video_engine_tpu.cli import skeleton_train
from cross_modal_video_engine_tpu.cli.skeleton_train import to_bone_stream

rng = np.random.default_rng(11)


def _pose_fixture(tmp_path, n=8, T=12, V=17):
    """Class 0 raises the arms (joints 9/10 high), class 1 lowers them —
    separable by both joint positions and bone vectors.  Coordinates
    are in pixels on a 16x16 canvas (GeneratePoseTarget's convention:
    keypoints are pixel coords on img_shape)."""
    annos = []
    rng = np.random.default_rng(11)          # order-independent fixture
    for i in range(n):
        label = i % 2
        kp = rng.normal(0.0, 0.6, (T, V, 3)).astype(np.float32)
        kp[..., :2] += 8.0
        kp[..., 2] = 1.0                     # confidence
        dy = -4.0 if label == 0 else 4.0
        kp[:, 9, 1] += dy
        kp[:, 10, 1] += dy
        annos.append({"keypoint": kp, "label": label})
    p = tmp_path / "poses.pkl"
    with open(p, "wb") as f:
        pickle.dump(annos, f)
    return str(p)


def _cfg(tmp_path, ann, model_block, data_extra="", lr=3e-2, epochs=10):
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = {model_block}
data = dict(
    train=dict(ann_file=r'{ann}'),
    val=dict(ann_file=r'{ann}'),
    clip_len=8, batch_size=8{data_extra})
optimizer = dict(optimizer='adamw', learning_rate={lr}, grad_clip=1.0)
total_epochs = {epochs}
eval_interval = {epochs}
""")
    return str(cfg)


def _run(cfg, work, min_ratio=0.9):
    history = skeleton_train.main([cfg, "--work_dir", work])
    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * min_ratio, losses
    assert "top1_acc" in history[-1]
    return history


def test_stgcn_recipe(tmp_path):
    ann = _pose_fixture(tmp_path)
    cfg = _cfg(tmp_path, ann,
               "dict(backbone=dict(type='STGCN', num_joints=17, "
               "channels=[8, 8], temporal_strides=[1, 2]), num_classes=2)")
    history = _run(cfg, str(tmp_path / "w"))
    # the fixture is separable: the model fits it (eval accuracy uses
    # BN running stats, which lag on a 10-step run, so assert on train)
    assert history[-1]["train_top1"] == 1.0


def test_agcn_joint_and_bone_streams(tmp_path):
    ann = _pose_fixture(tmp_path)
    cfg = _cfg(tmp_path, ann,
               "dict(backbone=dict(type='AGCN', num_joints=17, "
               "channels=[8, 8], temporal_strides=[1, 2]), num_classes=2)")
    _run(cfg, str(tmp_path / "wj"))
    cfg_bone = _cfg(tmp_path, ann,
                    "dict(backbone=dict(type='AGCN', num_joints=17, "
                    "channels=[8, 8], temporal_strides=[1, 2]), "
                    "num_classes=2)",
                    data_extra=", stream='bone'")
    _run(cfg_bone, str(tmp_path / "wb"))


def test_posec3d_recipe_heatmap_input(tmp_path):
    ann = _pose_fixture(tmp_path, n=4)
    cfg = _cfg(tmp_path, ann,
               "dict(backbone=dict(type='PoseC3D', stage_blocks=[1, 1], "
               "base_channels=8, conv1_kernel_t=1, "
               "stage_temporal_kernels=[1, 3], "
               "stage_spatial_strides=[1, 2]), num_classes=2)",
               data_extra=", heatmap=dict(sigma=1.0, img_shape=[16, 16])",
               lr=3e-3, epochs=6)
    _run(cfg, str(tmp_path / "w"), min_ratio=1.0)


def test_bone_stream_is_parent_relative():
    kp = np.zeros((1, 17, 3), np.float32)
    kp[0, 5, :2] = [1.0, 2.0]     # parent of joint 7
    kp[0, 7, :2] = [1.5, 2.5]
    kp[..., 2] = 0.9
    bones = to_bone_stream(kp)
    np.testing.assert_allclose(bones[0, 7, :2], [0.5, 0.5])
    np.testing.assert_allclose(bones[0, 7, 2], 0.9)   # score untouched
    # root joint 0 keeps zero bone
    np.testing.assert_allclose(bones[0, 0, :2], kp[0, 0, :2] - kp[0, 0, :2])


def test_multi_person_stgcn(tmp_path):
    """NTU-style 2-person clips: (M, T, V, C) batches fold persons into
    the backbone batch and average per-person features before the head
    (STGCNHead num_person semantics)."""
    import pickle
    annos = []
    rng2 = np.random.default_rng(31)
    for i in range(8):
        label = i % 2
        kp = rng2.normal(0.0, 0.6, (2, 12, 17, 3)).astype(np.float32)
        kp[..., :2] += 8.0
        kp[..., 2] = 1.0
        dy = -4.0 if label == 0 else 4.0
        kp[:, :, 9, 1] += dy
        kp[:, :, 10, 1] += dy
        if i % 3 == 0:        # some clips have only one visible person
            kp = kp[:1]
        annos.append({"keypoint": kp, "label": label})
    ann = tmp_path / "poses2.pkl"
    with open(ann, "wb") as f:
        pickle.dump(annos, f)

    cfg = _cfg(tmp_path, str(ann),
               "dict(backbone=dict(type='STGCN', num_joints=17, "
               "channels=[8, 8], temporal_strides=[1, 2]), num_classes=2)",
               data_extra=", num_persons=2")
    history = _run(cfg, str(tmp_path / "wmp"))
    assert history[-1]["train_top1"] == 1.0


def test_pose_dataset_multi_person_padding(tmp_path):
    import pickle
    from cross_modal_video_engine_tpu.data.datasets_extra import PoseDataset
    annos = [{"keypoint": np.ones((1, 6, 17, 3), np.float32), "label": 0},
             {"keypoint": np.ones((3, 6, 17, 3), np.float32), "label": 1}]
    p = tmp_path / "p.pkl"
    with open(p, "wb") as f:
        pickle.dump(annos, f)
    ds = PoseDataset(str(p), clip_len=4, num_persons=2)
    kp0, _ = ds[0]
    assert kp0.shape == (2, 4, 17, 3)
    np.testing.assert_allclose(kp0[1], 0.0)       # zero-padded person
    kp1, _ = ds[1]
    assert kp1.shape == (2, 4, 17, 3)             # truncated to M
    np.testing.assert_allclose(kp1[1], 1.0)


def test_ntu_graph_layout():
    """The named 'ntu-rgb+d' layout builds the reference Graph's
    25-joint spatial partition (skeleton_gcn/utils/graph.py:107-119)
    and drives both GCN backbones."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.models.stgcn import (
        STGCN, STGCNConfig, build_partitioned_adjacency)
    A = build_partitioned_adjacency(layout="ntu-rgb+d")
    assert A.shape == (3, 25, 25)
    # reference normalize_digraph: the incoming weights of each TARGET
    # joint sum to 1 (our orientation is A[k, target, source], so sum
    # over subsets and the source axis)
    np.testing.assert_allclose(A.sum(axis=(0, 2)), 1.0, atol=1e-5)
    m = STGCN(STGCNConfig(num_joints=25, channels=(8,),
                          temporal_strides=(1,), layout="ntu-rgb+d"))
    x = jnp.zeros((2, 6, 25, 3))
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (2, 8)


def test_spatial_partition_matches_reference_graph_math():
    """build_partitioned_adjacency vs an independent transcription of
    the reference Graph 'spatial' strategy (graph.py get_hop_distance /
    normalize_digraph / the a_root+a_close merge) on COCO-17."""
    from cross_modal_video_engine_tpu.models.stgcn import (
        COCO_EDGES, build_partitioned_adjacency)

    V, center = 17, 0
    adj = np.eye(V)
    for a, b in COCO_EDGES:
        adj[a, b] = adj[b, a] = 1
    # hop_dis to center via matrix powers (reference get_hop_distance)
    hop = np.full((V, V), np.inf)
    mats = [np.linalg.matrix_power(adj, d) for d in range(V)]
    for d in range(V - 1, -1, -1):
        hop[np.stack(mats)[d] > 0] = d
    dist = hop[:, center]
    # normalize_digraph: A @ Dn^-1 (column degree)
    deg = adj.sum(0)
    norm = adj @ np.diag(1.0 / deg)
    a0 = np.zeros((V, V))
    a1 = np.zeros((V, V))
    a2 = np.zeros((V, V))
    for j in range(V):
        for i in range(V):
            if adj[j, i] == 0:
                continue
            if j == i:
                a0[j, i] = norm[j, i]
            elif dist[j] >= dist[i]:
                a1[j, i] = norm[j, i]
            else:
                a2[j, i] = norm[j, i]
    ref = np.stack([a0, a1, a2])

    ours = build_partitioned_adjacency(V, COCO_EDGES, center)
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)),
                               atol=1e-6)
