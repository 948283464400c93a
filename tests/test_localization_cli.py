"""Config-driven localization CLI end-to-end on a synthetic corpus."""

import json
import os

import numpy as np

from cross_modal_video_engine_tpu.cli import localization_train
from cross_modal_video_engine_tpu.data.datasets_extra import (
    ActivityNetDataset)

rng = np.random.default_rng(761)


def _corpus(tmp_path, n=12, T=20, F=8):
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    ann = {}
    for i in range(n):
        s = rng.uniform(0.1, 0.5)
        e = s + rng.uniform(0.2, 0.4)
        dur = 100.0
        inside = (np.arange(T) / T >= s) & (np.arange(T) / T < e)
        feats = rng.standard_normal((T, F)).astype(np.float32) * 0.2
        feats[:, 0] += inside.astype(np.float32)   # channel 0 marks action
        np.save(feat_dir / f"v{i}.npy", feats)
        ann[f"v{i}"] = {"duration": dur,
                        "annotations": [{"segment": [s * dur, e * dur],
                                         "label": 1}]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(feat_dir)


def test_activitynet_dataset(tmp_path):
    ann, feats = _corpus(tmp_path, n=3, T=16)
    ds = ActivityNetDataset(ann, feats, temporal_dim=10)
    assert len(ds) == 3
    item = ds[0]
    assert item["features"].shape == (10, 8)      # resampled
    assert item["segments"].shape == (1, 2)
    assert 0 <= item["segments"].min() <= item["segments"].max() <= 1


def test_bmn_cli_trains_and_evaluates(tmp_path):
    ann, feats = _corpus(tmp_path, n=12, T=20)
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(type='BMN', temporal_dim=20, feat_dim=8, num_samples=4,
             max_duration=20, hidden_1d=16, hidden_2d=8, hidden_3d=16)
data = dict(
    train=dict(ann_file=r'{ann}', feature_prefix=r'{feats}'),
    val=dict(ann_file=r'{ann}', feature_prefix=r'{feats}'))
optimizer = dict(learning_rate=2e-3)
total_epochs = 12
batch_size = 6
""")
    work = str(tmp_path / "work")
    history, report = localization_train.main([str(cfg), "--work_dir", work])
    assert history[-1]["loss"] < history[0]["loss"]
    assert 0.0 <= report["auc"] <= 100.0
    # the channel-0 signal is learnable: proposals recall the gt span
    assert report["AR@100"] >= 0.5, report
    assert os.path.exists(os.path.join(work, "bmn_final"))


def test_tem_cli_trains(tmp_path):
    ann, feats = _corpus(tmp_path, n=6, T=16)
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(type='TEM', temporal_dim=16, feat_dim=8, hidden=16)
data = dict(
    train=dict(ann_file=r'{ann}', feature_prefix=r'{feats}'),
    val=dict(ann_file=r'{ann}', feature_prefix=r'{feats}'))
optimizer = dict(learning_rate=3e-3)
total_epochs = 8
batch_size = 6
""")
    work = str(tmp_path / "work")
    history, _ = localization_train.main([str(cfg), "--work_dir", work])
    assert history[-1]["loss"] < history[0]["loss"]
    assert os.path.exists(os.path.join(work, "tem_final"))


def _pgm_corpus(tmp_path, n=6, k=20, d=16):
    """Synthetic PGM artifacts: per-video proposals csv + bsp features
    whose channel 0 encodes the match iou (learnable by the PEM MLP)."""
    props_dir = tmp_path / "pgm_proposals"
    feats_dir = tmp_path / "pgm_features"
    props_dir.mkdir(); feats_dir.mkdir()
    ann = {}
    for i in range(n):
        s, e = 0.3, 0.7
        ann[f"v{i}"] = {"duration": 50.0,
                        "annotations": [{"segment": [s * 50, e * 50],
                                         "label": 1}]}
        tmin = rng.uniform(0, 0.8, k)
        tmax = np.minimum(tmin + rng.uniform(0.05, 0.4, k), 1.0)
        # plant near-gt candidates so a correct ranking can recall them
        tmin[:3] = [s, s - 0.02, s + 0.03]
        tmax[:3] = [e, e + 0.02, e - 0.03]
        inter = np.clip(np.minimum(tmax, e) - np.maximum(tmin, s), 0, None)
        union = (tmax - tmin) + (e - s) - inter
        iou = inter / union
        rows = np.stack([tmin, tmax, np.full(k, 0.9), np.full(k, 0.9),
                         np.zeros(k), iou], 1)
        np.savetxt(props_dir / f"v{i}.csv", rows, delimiter=",",
                   fmt="%.6f", header="tmin,tmax,tmin_score,tmax_score,"
                                      "score,match_iou")
        feats = rng.normal(size=(k, d)).astype(np.float32) * 0.1
        feats[:, 0] = iou * 4.0
        np.save(feats_dir / f"v{i}.npy", feats)
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(props_dir), str(feats_dir)


def test_pem_cli_trains_and_evaluates(tmp_path):
    ann, props_dir, feats_dir = _pgm_corpus(tmp_path)
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(type='PEM', feat_dim=16, hidden=16, top_k=20,
             u_ratio_m=1.0, u_ratio_l=2.0, post_process_top_k=20)
data = dict(
    train=dict(ann_file=r'{ann}', pgm_proposals_dir=r'{props_dir}',
               pgm_features_dir=r'{feats_dir}'),
    val=dict(ann_file=r'{ann}', pgm_proposals_dir=r'{props_dir}',
             pgm_features_dir=r'{feats_dir}'))
optimizer = dict(optimizer='adam', learning_rate=0.02)
total_epochs = 60
batch_size = 3
""")
    work = str(tmp_path / "work")
    history, report = localization_train.main([str(cfg), "--work_dir", work])
    assert history[-1]["loss"] < history[0]["loss"]
    assert 0.0 <= report["auc"] <= 100.0
    # the iou signal in channel 0 is learnable -> fused scores recall gt
    assert report["AR@10"] >= 0.5, report
    assert os.path.exists(os.path.join(work, "pem_final"))


def _ssn_corpus(tmp_path, n=6, T=24, F=8, C=3):
    """Tag-style proposal file + snippet features where the gt class
    writes channel `label` inside its span."""
    feats_dir = tmp_path / "ssn_feats"
    feats_dir.mkdir()
    lines = []
    for i in range(n):
        frames = 48
        label = (i % C) + 1
        gs, ge = 12, 36                          # gt span in frames
        feats = rng.normal(size=(T, F)).astype(np.float32) * 0.2
        scale = T / frames
        feats[int(gs * scale):int(ge * scale), label] += 2.0
        np.save(feats_dir / f"v{i}.npy", feats)
        props = [
            (label, 0.9, 0.9, 13, 35),           # positive-ish
            (label, 0.95, 0.95, 12, 36),         # exact
            (label, 0.2, 0.6, 12, 20),           # incomplete
            (label, 0.25, 0.7, 28, 36),          # incomplete
            (label, 0.15, 0.5, 18, 30),          # incomplete
            (0, 0.0, 0.0, 0, 10),                # background
            (0, 0.0, 0.0, 38, 47),               # background
        ]
        lines += [f"# {i}", f"v{i}", str(frames), "1.0", "1",
                  f"{label} {gs} {ge}", str(len(props))]
        lines += [" ".join(str(x) for x in p) for p in props]
    ann_file = tmp_path / "proposal_list.txt"
    ann_file.write_text("\n".join(lines) + "\n")
    return str(ann_file), str(feats_dir)


def test_ssn_cli_trains(tmp_path):
    ann, feats_dir = _ssn_corpus(tmp_path)
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(type='SSN', temporal_dim=24, feat_dim=8, num_classes=3,
             parts=[1, 2, 1], hidden=16)
sampler = dict(positive_per_video=1, incomplete_per_video=2,
               background_per_video=1, positive_iou=0.7,
               background_iou=0.01, incomplete_iou=0.3,
               incomplete_overlap=0.01, background_coverage=0.02)
ssn = dict(comp_loss_weight=0.1, reg_loss_weight=0.1)
data = dict(
    train=dict(ann_file=r'{ann}', feature_prefix=r'{feats_dir}'),
    val=dict(ann_file=r'{ann}', feature_prefix=r'{feats_dir}'))
optimizer = dict(optimizer='sgd', learning_rate=0.05, momentum=0.9)
total_epochs = 25
batch_size = 3
""")
    work = str(tmp_path / "work")
    history, report = localization_train.main([str(cfg), "--work_dir", work])
    assert history[-1]["loss"] < history[0]["loss"]
    # the per-class channel signal is learnable: positives classify
    assert report["pos_acc"] >= 0.5, report
    assert os.path.exists(os.path.join(work, "ssn_final"))
