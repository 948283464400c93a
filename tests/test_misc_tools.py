"""Misc/deployment tools (cli/misc_tools.py): flow extraction, BSN PGM,
publish, jax.export serving artifact."""

import json
import os

import numpy as np
import pytest

from cross_modal_video_engine_tpu.cli.misc_tools import main as mt_main
from cross_modal_video_engine_tpu.io.video_decode import write_test_video

rng = np.random.default_rng(21)


def test_flow_extraction(tmp_path):
    # a moving square produces nonzero, bounded flow
    frames = np.zeros((6, 48, 48, 3), np.uint8)
    for t in range(6):
        frames[t, 10:20, 5 + 4 * t:15 + 4 * t] = 255
    vid = str(tmp_path / "v.avi")
    write_test_video(vid, frames)
    dest = str(tmp_path / "flow")
    mt_main(["flow_extraction", "--input", vid, "--dest", dest,
             "--save_rgb"])
    names = sorted(os.listdir(dest))
    assert "flow_x_00000.jpg" in names and "flow_y_00000.jpg" in names
    assert "img_00000.jpg" in names
    import cv2
    fx = cv2.imread(os.path.join(dest, "flow_x_00002.jpg"),
                    cv2.IMREAD_GRAYSCALE)
    assert fx.shape == (48, 48)
    # rightward motion: x-flow in the square region above the 128 midpoint
    assert fx.max() > 140


def test_bsn_pgm_contract(tmp_path):
    T = 50
    action = np.zeros(T, np.float32)
    action[10:30] = 0.9
    start = np.zeros(T, np.float32)
    start[10] = 0.95
    start[12] = 0.6
    end = np.zeros(T, np.float32)
    end[29] = 0.9
    tem = tmp_path / "tem"
    tem.mkdir()
    np.savez(tem / "vid1.npz", action=action, start=start, end=end)
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "vid1": {"duration": 10.0,
                 "annotations": [{"segment": [2.0, 6.0], "label": 0}]}}))
    pdir, fdir = str(tmp_path / "props"), str(tmp_path / "feats")
    mt_main(["bsn_pgm", "--tem_dir", str(tem), "--proposals_dir", pdir,
             "--features_dir", fdir, "--ann_file", str(ann)])
    rows = np.loadtxt(os.path.join(pdir, "vid1.csv"), delimiter=",",
                      skiprows=1, ndmin=2)
    assert rows.shape[1] == 6
    # best proposal spans ~[10, 29]/50 = [0.2, 0.58] -> high IoU with
    # gt [0.2, 0.6]
    best = rows[np.argmax(rows[:, 4])]
    assert best[5] > 0.9                      # match_iou column
    feats = np.load(os.path.join(fdir, "vid1.npy"))
    assert feats.shape == (len(rows), 16 + 2 * 4)
    # LoadProposals consumes the outputs directly
    from cross_modal_video_engine_tpu.data.pipelines_extra import (
        LoadProposals)
    out = LoadProposals(top_k=2, pgm_proposals_dir=pdir,
                        pgm_features_dir=fdir)({"video_name": "vid1"})
    assert out["bsp_feature"].shape == (2, 24)
    assert out["reference_temporal_iou"].shape == (2,)


def test_publish_model(tmp_path):
    ckpt = tmp_path / "model.npz"
    ckpt.write_bytes(b"weights")
    out = mt_main(["publish_model", "--input", str(ckpt)])
    assert os.path.exists(out)
    digest = os.path.basename(out)
    assert digest.startswith("model-") and digest.endswith(".npz")
    assert not os.path.exists(ckpt)


def test_export_model_roundtrip(tmp_path):
    """Weights ride as a call argument (like export_yolo) so the
    artifact stays small and serving loads checkpoints independently;
    the exported forward must match model.apply on the same weights."""
    import jax
    import jax.numpy as jnp

    from cross_modal_video_engine_tpu.models.clip import (CLIPConfig,
                                                          CLIPModel)
    from cross_modal_video_engine_tpu.train.checkpoint import (
        save_checkpoint)

    # must mirror export_model's 'tiny' preset exactly
    cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                     vision_layers=2, vision_heads=2, patch_size=16,
                     context_length=8, vocab_size=64, text_width=16,
                     text_heads=2, text_layers=1)
    model = CLIPModel(cfg)
    variables = model.init(jax.random.key(3),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 8), jnp.int32))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, variables)

    out = str(tmp_path / "model.stablehlo")
    mt_main(["export_model", "--output", out, "--preset", "tiny",
             "--batch", "2", "--frames", "2", "--checkpoint", ckpt])
    with open(out, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    x = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32)
    y = np.asarray(exported.call(variables, x))
    assert y.shape == (2, 2, 16)
    want, _ = model.apply(variables, x, method="encode_video")
    np.testing.assert_allclose(y, np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.full    # full lane: detector artifact packing; export_model_roundtrip keeps StableHLO export default
def test_export_yolo_roundtrip(tmp_path):
    """export_yolo: deserialized StableHLO artifact reproduces the
    jitted forward+decode (weights ride as a call argument so serving
    loads checkpoints independently of the graph)."""
    import jax
    import jax.numpy as jnp

    from cross_modal_video_engine_tpu.cli.yolo_train import (
        build_yolo_model)
    from cross_modal_video_engine_tpu.config import Config
    from cross_modal_video_engine_tpu.models.yolo import (
        decode_predictions)

    cfg_py = tmp_path / "yolo_cfg.py"
    cfg_py.write_text(
        "model = dict(num_classes=3, depth_multiple=0.33,"
        " width_multiple=0.125, img_size=64)\n")
    out = str(tmp_path / "yolo.stablehlo")
    mt_main(["export_yolo", str(cfg_py), "--output", out, "--batch", "2"])
    with open(out, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    model = build_yolo_model(Config.fromfile(str(cfg_py)))
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    got = np.asarray(exported.call(variables, x))
    want = np.asarray(decode_predictions(
        model.apply(variables, x, train=False), model.cfg))
    assert got.shape == want.shape == (2, got.shape[1], 5 + 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
