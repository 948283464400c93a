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
    # the 21 reference configs/recognition model families each ship
    # >=1 recipe (tsn/i3d/c3d/r2plus1d/trn/videomae/videoclip/clip/
    # omnisource joined in r4)
    assert len(RECOGNITION) >= 20


@pytest.mark.parametrize("path", RECOGNITION,
                         ids=[os.path.basename(p) for p in RECOGNITION])
def test_recognition_config_builds(path):
    cfg = Config.fromfile(path)
    # _base_ inheritance delivered runtime + data defaults
    assert cfg.get("eval_interval") == 1
    # dataset-matched head sizes (the reference's recipes): k400=400,
    # sthv1/v2=174, ucf101=101, mini-kinetics=200
    name = os.path.basename(path)
    expect = (174 if "sth" in name else 101 if "ucf101" in name
              else 200 if "minikinetics" in name else 400)
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


def test_localization_family_configs():
    """The reference's three localization families each ship recipes:
    bmn(1) + bsn tem/pem(2) + ssn(1) (reference configs/localization/
    {bmn,bsn,ssn}; PGM is a data-prep step via misc_tools bsn_pgm)."""
    paths = sorted(glob.glob(os.path.join(REPO, "configs/localization",
                                          "*.py")))
    names = [os.path.basename(p) for p in paths]
    assert len(paths) >= 4, names
    assert any("bsn_tem" in n for n in names)
    assert any("bsn_pem" in n for n in names)
    assert any("ssn" in n for n in names)

    tem = Config.fromfile(os.path.join(
        REPO, "configs/localization/bsn_tem_400x100_anet.py"))
    assert tem["model.type"] == "TEM"
    assert tem["model.hidden"] == 512                 # tem_hidden_dim
    pem = Config.fromfile(os.path.join(
        REPO, "configs/localization/bsn_pem_400x100_anet.py"))
    assert pem["model.type"] == "PEM"
    assert pem["model.hidden"] == 256                 # pem_hidden_dim
    assert pem["model.u_ratio_l"] == 2.0
    assert pem["optimizer.learning_rate"] == 0.01     # adam_20e.py
    ssn = Config.fromfile(os.path.join(
        REPO, "configs/localization/ssn_r50_450e_thumos14.py"))
    assert ssn["model.type"] == "SSN"
    assert ssn["model.num_classes"] == 20             # thumos14
    assert ssn["sampler.incomplete_per_video"] == 6
    assert ssn["ssn.comp_loss_weight"] == 0.1
    assert ssn["total_epochs"] == 450


def test_seq_generate_config_parses():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/seq_generate/timesformer_relseq.py"))
    assert cfg["model.decoder.num_classes"] == 36
    assert cfg["model.backbone.num_layers"] == 12


SEQ_GENERATE = sorted(glob.glob(os.path.join(REPO, "configs/seq_generate",
                                             "*.py")))


def test_found_seq_generate_configs():
    # the reference's 6 seq_generate families (i3d/mvit/slowfast/
    # timesformer/videomae/x3d) + the per-frame tsm adapter recipe
    assert len(SEQ_GENERATE) >= 7


@pytest.mark.parametrize("path", SEQ_GENERATE,
                         ids=[os.path.basename(p) for p in SEQ_GENERATE])
def test_seq_generate_config_builds(path):
    """Every caption recipe constructs its model through the caption
    trainer's builder (backbone registry + RNNDecoderConfig)."""
    from cross_modal_video_engine_tpu.models.decoder_head import (
        RNNDecoderConfig)
    cfg = Config.fromfile(path)
    dec = RNNDecoderConfig(**dict(cfg["model.decoder"]))
    assert dec.max_len == 5
    btype = cfg["model.backbone"].get("type", "TimeSformer")
    if btype != "TimeSformer":
        from cross_modal_video_engine_tpu.cli.recognition_train import (
            build_backbone)
        bb_kw = {k: tuple(v) if isinstance(v, list) else v
                 for k, v in cfg["model.backbone"].items() if k != "type"}
        assert build_backbone(btype, bb_kw) is not None
    assert build_pipeline(cfg["data.pipeline"]).ops


def test_omnisource_config_routes():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/recognition/tsn_r50_1x1x8_minikinetics_omnisource.py"))
    oms = cfg["omnisource"]
    assert list(oms["train_ratio"]) == [2, 1, 1]
    assert len(oms["aux"]) == 2
    assert cfg["model.backbone.type"] == "TSN"


def test_clip_and_videoclip_recognizers_forward():
    """The CLIP / VideoCLIP recognition routes (reference configs/
    recognition/{clip,videoclip}) build and run at tiny shapes."""
    import jax
    import jax.numpy as jnp
    v = jnp.zeros((2, 8, 16, 16, 3), jnp.float32)
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/recognition/videoclip_ctv_extraction_k400.py")
    ).merge_from_options([
        "model.backbone.fps=2", "model.backbone.s3d_channels=4",
        "model.backbone.width=8", "model.backbone.layers=1",
        "model.backbone.heads=2", "model.backbone.max_video_len=8",
        "model.num_classes=3"])
    m = build_recognition_model(cfg)
    assert m.apply(m.init(jax.random.key(0), v), v).shape == (2, 3)

    cfg2 = Config.fromfile(os.path.join(
        REPO, "configs/recognition/clip_mean_pooling_8x32_k400.py")
    ).merge_from_options([
        "model.backbone.embed_dim=8", "model.backbone.image_resolution=16",
        "model.backbone.vision_width=8", "model.backbone.vision_layers=1",
        "model.backbone.vision_heads=2", "model.backbone.patch_size=8",
        "model.num_classes=3"])
    m2 = build_recognition_model(cfg2)
    assert m2.apply(m2.init(jax.random.key(0), v), v).shape == (2, 3)


def test_trn_config_selects_trn_head():
    from cross_modal_video_engine_tpu.models.heads import TRNHead
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/recognition/trn_r50_1x1x8_sthv1.py"))
    model = build_recognition_model(cfg)
    assert isinstance(model.cls_head, TRNHead)
    assert model.cls_head.relation_type == "TRNMultiScale"


def test_recognition_audio_config_parses():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/recognition_audio/resnet_audio_k400.py"))
    assert cfg["model.n_mels"] == 80
    from cross_modal_video_engine_tpu.data.pipelines import build_pipeline
    assert build_pipeline(cfg["data.pipeline"]).ops


def test_audioonly_config_parses():
    """Both reference recognition_audio families ship (resnet +
    audioonly, reference configs/recognition_audio/audioonly/
    audioonly_r50_64x1x1_100e_kinetics400_audio_feature.py)."""
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/recognition_audio/audioonly_r50_64x1x1_k400_"
              "feature.py"))
    assert list(cfg["model.channels"]) == [64, 128, 256, 512]  # r50-deep
    assert cfg["data.videos_per_gpu"] == 160
    assert cfg["total_epochs"] == 100
    pipe = cfg["data.pipeline"]
    assert pipe[1]["clip_len"] == 64                  # 64x1x1 protocol
    from cross_modal_video_engine_tpu.data.pipelines import build_pipeline
    assert build_pipeline(pipe).ops


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
