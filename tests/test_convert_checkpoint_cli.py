"""convert_checkpoint CLI (cli/convert_checkpoint.py): the argument
routing + config plumbing over the parity-tested importers — torch .pth
on disk in, loadable TPU checkpoint out, numerically identical to
calling the importer directly."""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cross_modal_video_engine_tpu.cli.convert_checkpoint import main
from cross_modal_video_engine_tpu.convert.torch_import import convert_tsm
from cross_modal_video_engine_tpu.models.backbones2d import (TSMConfig,
                                                             TSMResNet)
from cross_modal_video_engine_tpu.models.heads import TSNHead
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D
from cross_modal_video_engine_tpu.train.checkpoint import load_checkpoint

from test_tsm_conversion import TTSM


def test_convert_checkpoint_cli_tsm_roundtrip(tmp_path):
    cfg = TSMConfig(stage_blocks=(1, 1, 1, 1), base_channels=8)
    tmodel = TTSM(cfg, T=4, num_classes=5).eval()
    src = tmp_path / "tsm.pth"
    torch.save({"state_dict": tmodel.state_dict()}, str(src))
    blob = tmp_path / "cfg.json"
    blob.write_text(json.dumps({
        "backbone": {"stage_blocks": [1, 1, 1, 1], "base_channels": 8},
        "num_classes": 5}))
    dst = tmp_path / "out_ckpt"

    main(["--type", "tsm", "--src", str(src), "--dst", str(dst),
          "--config", str(blob)])

    model = Recognizer2D(TSMResNet(cfg), TSNHead(5, dropout_ratio=0.0))
    direct = convert_tsm(dict(tmodel.state_dict()), cfg)
    loaded, config, _meta = load_checkpoint(str(dst))
    assert config["num_classes"] == 5
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32))
    got = np.asarray(model.apply(loaded, x))
    want = np.asarray(model.apply(direct, x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_convert_checkpoint_cli_rejects_unknown_type(tmp_path):
    with pytest.raises(SystemExit):
        main(["--type", "nope", "--src", "x", "--dst", str(tmp_path / "d")])
