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


DETECTION = sorted(glob.glob(os.path.join(
    REPO, "configs/detection/*", "*.py")))
SKELETON = sorted(glob.glob(os.path.join(
    REPO, "configs/skeleton/*", "*.py")))


def test_found_family_configs():
    # ava(2) + lfb + acrn + yolov5(3); stgcn + 2s-agcn + posec3d
    assert len(DETECTION) >= 7
    assert len(SKELETON) >= 3


@pytest.mark.parametrize("path", DETECTION,
                         ids=[os.path.basename(p) for p in DETECTION])
def test_detection_config_builds(path):
    cfg = Config.fromfile(path)
    name = os.path.basename(path)
    if "yolov5" in path:
        if "cls" in name:
            from cross_modal_video_engine_tpu.cli.yolo_cls_train import (
                build_cls_model)
            model = build_cls_model(cfg)
            assert model.cfg.num_classes == 1000
        else:
            from cross_modal_video_engine_tpu.cli.yolo_train import (
                build_yolo_model)
            model = build_yolo_model(cfg)
            assert model.cfg.num_classes == 80
            assert ("seg" not in name) == (model.cfg.masks == 0)
        return
    from cross_modal_video_engine_tpu.cli.detection_train import (
        build_detection_model)
    model = build_detection_model(cfg)
    assert model is not None
    if "lfb" in name:
        assert model.shared_head is not None
    if "acrn" in name:
        assert model.shared_head is not None


@pytest.mark.parametrize("path", SKELETON,
                         ids=[os.path.basename(p) for p in SKELETON])
def test_skeleton_config_builds(path):
    from cross_modal_video_engine_tpu.cli.skeleton_train import (
        build_skeleton_model)
    cfg = Config.fromfile(path)
    model = build_skeleton_model(cfg)
    assert model is not None
    assert cfg["model.num_classes"] == 60      # ntu60 recipes
