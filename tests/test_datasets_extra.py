import json
import pickle

import numpy as np

from cross_modal_video_engine_tpu.data.datasets_extra import (
    AVADataset, HVUDataset, PoseDataset)

rng = np.random.default_rng(561)


def test_hvu_dataset(tmp_path):
    ann = [
        {"filename": "a.mp4",
         "label": {"action": [1], "scene": [0, 2]}},
        {"filename": "b.mp4", "label": {"action": []}},
    ]
    p = str(tmp_path / "hvu.json")
    json.dump(ann, open(p, "w"))
    ds = HVUDataset(p, ["action", "scene"],
                    {"action": 3, "scene": 4}, data_prefix="/videos")
    assert len(ds) == 2
    item = ds[0]
    assert item["filename"] == "/videos/a.mp4"
    np.testing.assert_array_equal(item["label"]["action"], [0, 1, 0])
    np.testing.assert_array_equal(item["label"]["scene"], [1, 0, 1, 0])
    np.testing.assert_array_equal(ds[1]["label"]["action"], [0, 0, 0])


def test_pose_dataset_with_stgcn(tmp_path):
    annos = [
        {"keypoint": rng.standard_normal((1, 30, 17, 3)).astype(np.float32),
         "label": 2},
        {"keypoint": rng.standard_normal((5, 17, 3)).astype(np.float32),
         "label": 0},   # short clip -> loop pad
    ]
    p = str(tmp_path / "pose.pkl")
    pickle.dump(annos, open(p, "wb"))
    ds = PoseDataset(p, clip_len=8)
    kp, label = ds[0]
    assert kp.shape == (8, 17, 3) and label == 2
    kp2, _ = ds[1]
    assert kp2.shape == (8, 17, 3)
    np.testing.assert_array_equal(kp2[5], kp2[0])   # looped

    kps, labels, n = next(ds.batches(4))
    assert kps.shape == (4, 8, 17, 3) and n == 2

    # feeds the STGCN backbone end-to-end
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.models.stgcn import STGCN, STGCNConfig
    m = STGCN(STGCNConfig(channels=(8,), temporal_strides=(1,)))
    variables = m.init(jax.random.key(0), jnp.asarray(kps))
    out = m.apply(variables, jnp.asarray(kps))
    assert out.shape == (4, 8)


def test_ava_dataset(tmp_path):
    rows = [
        "v1,902.0,0.1,0.1,0.5,0.9,12,e0",
        "v1,902.0,0.1,0.1,0.5,0.9,17,e0",   # same entity, second action
        "v1,902.0,0.6,0.2,0.9,0.8,12,e1",
        "v1,903.0,0.2,0.2,0.4,0.4,3,e0",
        "v2,100.0,0.0,0.0,1.0,1.0,1,e9",
    ]
    p = str(tmp_path / "ava.csv")
    open(p, "w").write("\n".join(rows))
    ds = AVADataset(p, num_classes=20, data_prefix="/videos")
    assert len(ds) == 3                     # 3 distinct keyframes
    kf = ds[0]
    assert kf["filename"] == "/videos/v1" and kf["timestamp"] == 902.0
    assert kf["boxes"].shape == (2, 4)
    # entity e0 carries both action labels
    assert kf["labels"][0][12] == 1 and kf["labels"][0][17] == 1
    assert kf["labels"][1][12] == 1 and kf["labels"][1][17] == 0
