"""The shipped configs/ tree parses, inherits and builds real models
(the reference's MCT/configs role: ready-made recipes the CLIs consume)."""

import glob
import os

import pytest

from cross_modal_video_engine_tpu.cli.recognition_train import (
    build_recognition_model)
from cross_modal_video_engine_tpu.config import Config
from cross_modal_video_engine_tpu.data.pipelines import build_pipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECOGNITION = sorted(glob.glob(os.path.join(REPO, "configs/recognition",
                                            "*.py")))


def test_found_configs():
    assert len(RECOGNITION) >= 9


@pytest.mark.parametrize("path", RECOGNITION,
                         ids=[os.path.basename(p) for p in RECOGNITION])
def test_recognition_config_builds(path):
    cfg = Config.fromfile(path)
    # _base_ inheritance delivered runtime + data defaults
    assert cfg.get("eval_interval") == 1
    # k400 recipes carry 400 classes; sthv1/v2 recipes 174 (the
    # reference's dataset-matched head sizes)
    expect = 174 if "sth" in os.path.basename(path) else 400
    assert cfg["model.num_classes"] == expect
    pipe = build_pipeline(cfg["data.pipeline"])
    assert pipe.ops
    model = build_recognition_model(cfg)     # constructs the flax module
    assert model is not None
    if cfg.get("multigrid"):
        from cross_modal_video_engine_tpu.train.multigrid import (
            GridBucket, MultigridSchedule)
        mg = dict(cfg["multigrid"])
        mg["buckets"] = tuple(GridBucket(*b) for b in mg["buckets"])
        sched = MultigridSchedule(**mg)
        assert len(sched.buckets) == 4


def test_localization_config_parses():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/localization/bmn_anet_400x100.py"))
    from cross_modal_video_engine_tpu.models.bmn import BMN, BMNConfig
    mcfg = dict(cfg["model"])
    assert mcfg.pop("type") == "BMN"
    model = BMN(BMNConfig(**mcfg))
    assert model.cfg.temporal_dim == 100


def test_seq_generate_config_parses():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/seq_generate/timesformer_relseq.py"))
    assert cfg["model.decoder.num_classes"] == 36
    assert cfg["model.backbone.num_layers"] == 12


def test_recognition_audio_config_parses():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/recognition_audio/resnet_audio_k400.py"))
    assert cfg["model.n_mels"] == 80
    from cross_modal_video_engine_tpu.data.pipelines import build_pipeline
    assert build_pipeline(cfg["data.pipeline"]).ops
