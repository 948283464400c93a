"""SSN proposal dataset (data/datasets_extra.py tail) + denormalize tool,
vs the reference ssn_dataset.py / ssn_utils.py format."""

import os

import numpy as np
import pytest

from cross_modal_video_engine_tpu.data.datasets_extra import (
    SSNDataset, load_localize_proposal_file)

PROPOSAL_FILE = """# 0
video_a
100
1
2
3 10 40
5 60 90
3
3 0.8500 0.9000 12 38
0 0.0500 0.0200 1 8
5 0.2000 0.5000 55 75
# 1
video_b
50
1
1
1 5 25
1
1 0.9000 0.8000 6 24
"""


def _write(tmp_path):
    path = tmp_path / "props.txt"
    path.write_text(PROPOSAL_FILE)
    return str(path)


def test_load_localize_proposal_file(tmp_path):
    infos = load_localize_proposal_file(_write(tmp_path))
    assert len(infos) == 2
    vid, n, fps, gt, prop = infos[0]
    assert vid == "video_a" and n == 100
    assert gt.shape == (2, 3)
    np.testing.assert_allclose(gt[0], [3, 10, 40])
    assert prop.shape == (3, 5)
    np.testing.assert_allclose(prop[0], [3, 0.85, 0.9, 12, 38])
    assert infos[1][3].shape == (1, 3)


def test_ssn_dataset_samples_fixed_layout(tmp_path):
    from cross_modal_video_engine_tpu.train.localization_trainer import (
        SSNSamplerConfig)

    cfg = SSNSamplerConfig(positive_per_video=1, incomplete_per_video=2,
                           background_per_video=1)
    ds = SSNDataset(_write(tmp_path), data_prefix="/frames",
                    sampler_cfg=cfg, seed=0)
    assert len(ds) == 2
    assert ds.video_infos[0]["frame_dir"] == "/frames/video_a"
    item = ds[0]
    P = 1 + 2 + 1
    assert item["sampled_proposals"].shape == (P, 2)
    assert item["labels"].shape == (P,)
    assert item["proposal_type"].shape == (P,)
    assert item["bbox_targets"].shape == (P, 2)
    assert len(item["out_proposals"]) == P
    # out_proposals feed SampleProposalFrames directly
    from cross_modal_video_engine_tpu.data.pipelines_extra import (
        SampleProposalFrames)
    op = SampleProposalFrames(clip_len=1, body_segments=3,
                              aug_segments=(1, 1), aug_ratio=0.5,
                              mode="train", seed=0)
    out = op(dict(item))
    assert out["frame_inds"].shape == (P * 5,)
    assert (out["frame_inds"] < item["total_frames"]).all()
    assert out["num_proposals"] == P


def test_denormalize_proposals_tool(tmp_path):
    from cross_modal_video_engine_tpu.cli.data_tools import main as dt_main

    norm = tmp_path / "normalized_props.txt"
    norm.write_text("# 0\nvid1\n1\n1\n1\n2 0.1 0.5\n1\n2 0.7000 0.8000 "
                    "0.2 0.6\n")
    frames = tmp_path / "frames" / "vid1"
    frames.mkdir(parents=True)
    for i in range(20):
        (frames / f"img_{i:05d}.jpg").write_bytes(b"x")
    dt_main(["denormalize_proposals", "--input", str(norm),
             "--frames_dir", str(tmp_path / "frames")])
    out = load_localize_proposal_file(str(tmp_path / "props.txt"))
    vid, n, _fps, gt, prop = out[0]
    assert vid == "vid1" and n == 20
    np.testing.assert_allclose(gt[0], [2, 2, 10])     # 0.1*20, 0.5*20
    np.testing.assert_allclose(prop[0], [2, 0.7, 0.8, 4, 12])
