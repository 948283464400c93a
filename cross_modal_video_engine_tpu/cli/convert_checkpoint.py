"""Torch -> TPU checkpoint conversion CLI.

  python -m cross_modal_video_engine_tpu.cli.convert_checkpoint \
      --type linas --src model_best.pth.tar --dst ckpt_dir \
      [--config config.json]

Types:
  linas       — LINAS Dual_Encoding .pth.tar (model list + embedded opt;
                relevant opt fields are translated into DualEncodingConfig)
  clip        — OpenAI-layout CLIP ViT state dict (.pt with or without
                'state_dict')
  clip_resnet — OpenAI-layout CLIP ModifiedResNet state dict (RN50x4 etc,
                the MultiFusion tower — inference.py:179-196); config is
                derived from the state dict, --config overrides
  combiner    — MultiFusion combiner_arithmetic.pt (inference.py:218-223);
                config derived from the state dict
  timesformer — mmaction TimeSformer (needs --config)
  yolov5      — ultralytics yolov5 .pt (detect or -seg weights; config
                incl. nm/npr derived)
  yolov5_cls  — ultralytics yolov5-cls .pt (ClassificationModel)
  resnet3d    — mmaction ResNet3d/SlowOnly (ConvModule key grammar)
  slowfast    — mmaction SlowFast (both pathways + lateral fusion convs)
  videomae    — VideoMAE finetuned ViT (config derived from shapes)
  x3d         — mmaction X3D (half-style SE, two-layer head)
  csn         — mmaction ir/ip-CSN (Sequential conv2 grammar)
  tsm         — mmaction ResNetTSM (ConvModule or torchvision keys)
  tin         — mmaction ResNetTIN (CombineNet-wrapped interlace)
"""

from __future__ import annotations

import argparse
import json

from ..convert.torch_import import (
    convert_clip_vit, convert_linas_dual_encoding, convert_timesformer,
    load_torch_checkpoint)
from ..models.clip import CLIPConfig
from ..models.dual_encoding import DualEncodingConfig
from ..models.timesformer import TimeSformerConfig
from ..train.checkpoint import save_checkpoint


def _parse_sizes(s):
    return tuple(int(x) for x in str(s).split("-"))


def linas_config_from_opt(opt) -> DualEncodingConfig:
    """Translate the reference argparse namespace embedded in the ckpt
    (trainer.py:288-295) into DualEncodingConfig."""
    g = lambda k, d=None: getattr(opt, k, d)
    return DualEncodingConfig(
        visual_feat_dim=g("visual_feat_dim", 2048),
        visual_rnn_size=g("visual_rnn_size", 512),
        visual_kernel_num=g("visual_kernel_num", 512),
        visual_kernel_sizes=_parse_sizes(g("visual_kernel_sizes", "2-3-4-5")),
        vocab_size=g("vocab_size", 7807),
        bow_vocab_size=g("bow_vocab_size", 7183),
        word_dim=g("word_dim", 500),
        text_rnn_size=g("text_rnn_size", 512),
        text_kernel_num=g("text_kernel_num", 512),
        text_kernel_sizes=_parse_sizes(g("text_kernel_sizes", "2-3-4")),
        hidden_size=g("hidden_size", 1024),
        common_dim=_parse_sizes(g("visual_mapping_layers", "0-1536"))[-1],
        text_resblock_number=g("text_resblock_number", 0),
        dropout=g("dropout", 0.2),
        concate=g("concate", "full"),
        gru_pool=g("gru_pool", "mean"),
        style=g("style", "distill_from_best_model"),
        teacher_model=g("teacher_model", "GT"),
        student_model=g("student_model", "de+map"),
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--type", required=True,
                        choices=["linas", "clip", "clip_resnet", "combiner",
                                 "timesformer", "yolov5", "yolov5_cls",
                                 "resnet3d",
                                 "slowfast", "videomae", "x3d", "csn",
                                 "tsm", "tin", "c3d", "r2plus1d",
                                 "mobilenetv2_tsm", "stgcn", "agcn",
                                 "tanet"])
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--config", default=None,
                        help="json config overriding/replacing embedded opt")
    args = parser.parse_args(argv)

    ckpt = load_torch_checkpoint(args.src)
    if args.type == "linas":
        if args.config:
            cfg = DualEncodingConfig(**json.load(open(args.config)))
        else:
            cfg = linas_config_from_opt(ckpt["opt"])
        variables = convert_linas_dual_encoding(ckpt["model"], cfg)
        meta = {"epoch": ckpt.get("epoch"), "best_rsum": ckpt.get("best_rsum"),
                "source": args.src}
    elif args.type == "timesformer":
        sd = ckpt.get("state_dict", ckpt)
        assert args.config, ("--config json required: TimeSformerConfig "
                             "fields under 'backbone' + 'num_classes'")
        blob = json.load(open(args.config))
        ts_cfg = TimeSformerConfig(**blob["backbone"])
        variables = convert_timesformer(sd, ts_cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob["backbone"],
                         "num_classes": blob["num_classes"]},
                        {"source": args.src})
        print(f"converted timesformer checkpoint -> {args.dst}")
        return
    elif args.type == "clip_resnet":
        from ..convert.torch_import import (
            convert_clip_resnet, clip_resnet_config_from_sd)
        from ..models.clip_resnet import CLIPResNetConfig
        sd = ckpt.get("state_dict", ckpt)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        kwargs = clip_resnet_config_from_sd(sd)
        if args.config:
            kwargs.update(json.load(open(args.config)))
        cfg = CLIPResNetConfig(**kwargs)
        variables = convert_clip_resnet(sd, cfg)
        meta = {"source": args.src, "model_type": "clip_resnet"}
    elif args.type == "combiner":
        from ..convert.torch_import import (
            convert_combiner, combiner_config_from_sd)
        from ..models.combiner import CombinerConfig
        sd = ckpt.get("Combiner", ckpt.get("state_dict", ckpt))
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        kwargs = combiner_config_from_sd(sd)
        if args.config:
            kwargs.update(json.load(open(args.config)))
        cfg = CombinerConfig(**kwargs)
        variables = convert_combiner(sd)
        meta = {"source": args.src}
    elif args.type == "resnet3d":
        from ..convert.torch_import import convert_resnet3d
        from ..models.resnet3d import ResNet3DConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = ResNet3DConfig(**kwargs)
        variables = convert_resnet3d(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted resnet3d checkpoint -> {args.dst}")
        return
    elif args.type == "slowfast":
        from ..convert.torch_import import convert_slowfast
        from ..models.resnet3d import SlowFastConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = SlowFastConfig(**kwargs)
        variables = convert_slowfast(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted slowfast checkpoint -> {args.dst}")
        return
    elif args.type == "x3d":
        from ..convert.torch_import import convert_x3d
        from ..models.resnet3d import X3DConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = X3DConfig(**kwargs)
        variables = convert_x3d(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted x3d checkpoint -> {args.dst}")
        return
    elif args.type == "csn":
        from ..convert.torch_import import convert_csn
        from ..models.resnet3d import CSNConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = CSNConfig(**kwargs)
        variables = convert_csn(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted csn checkpoint -> {args.dst}")
        return
    elif args.type == "tsm":
        from ..convert.torch_import import convert_tsm
        from ..models.backbones2d import TSMConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = TSMConfig(**kwargs)
        variables = convert_tsm(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted tsm checkpoint -> {args.dst}")
        return
    elif args.type == "tin":
        from ..convert.torch_import import convert_tin
        from ..models.tin_mobilenet import TINExactConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = TINExactConfig(**kwargs)
        variables = convert_tin(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted tin checkpoint -> {args.dst}")
        return
    elif args.type == "videomae":
        from ..convert.torch_import import convert_videomae
        from ..models.videomae_vit import videomae_config_from_sd
        sd = ckpt.get("module", ckpt.get("model", ckpt.get("state_dict",
                                                           ckpt)))
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = videomae_config_from_sd(
            sd, num_frames=blob.get("num_frames", 16),
            img_size=blob.get("img_size", 224),
            num_heads=blob.get("num_heads"))   # ViT-dim default if None
        # honor any other explicit --config overrides (e.g. mlp_ratio)
        import dataclasses as _dc

        from ..models.videomae_vit import VideoMAEConfig
        fields = {f.name for f in _dc.fields(VideoMAEConfig)}
        kwargs.update({k: v for k, v in blob.items()
                       if k in fields
                       and k not in ("num_frames", "img_size",
                                     "num_heads")})
        variables = convert_videomae(sd)
        save_checkpoint(args.dst, variables, {"backbone": kwargs},
                        {"source": args.src})
        print(f"converted videomae checkpoint -> {args.dst}")
        return
    elif args.type == "c3d":
        from ..convert.torch_import import convert_c3d
        sd = ckpt.get("state_dict", ckpt)
        variables = convert_c3d(sd)
        save_checkpoint(args.dst, variables,
                        {"backbone": {"type": "C3D", "exact_head": True}},
                        {"source": args.src})
        print(f"converted c3d checkpoint -> {args.dst}")
        return
    elif args.type == "r2plus1d":
        from ..convert.torch_import import convert_r2plus1d
        from ..models.backbones2d import R2Plus1DConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = R2Plus1DConfig(**kwargs)
        variables = convert_r2plus1d(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted r2plus1d checkpoint -> {args.dst}")
        return
    elif args.type == "mobilenetv2_tsm":
        from ..convert.torch_import import convert_mobilenetv2_tsm
        from ..models.tin_mobilenet import MobileNetV2TSMConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(tuple(s) for s in v) if k == "stages" else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = MobileNetV2TSMConfig(**kwargs)
        variables = convert_mobilenetv2_tsm(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted mobilenetv2_tsm checkpoint -> {args.dst}")
        return
    elif args.type in ("stgcn", "agcn"):
        from ..convert.torch_import import convert_agcn, convert_stgcn
        sd = ckpt.get("state_dict", ckpt)
        fn = convert_stgcn if args.type == "stgcn" else convert_agcn
        variables, cfg = fn(sd)
        save_checkpoint(args.dst, variables,
                        {"backbone": {"type": args.type.upper(),
                                      "num_joints": cfg.num_joints,
                                      "in_channels": cfg.in_channels,
                                      "channels": list(cfg.channels),
                                      "temporal_strides": list(
                                          cfg.temporal_strides),
                                      "adjacency": [
                                          [list(r) for r in s]
                                          for s in cfg.adjacency]}},
                        {"source": args.src})
        print(f"converted {args.type} checkpoint -> {args.dst}")
        return
    elif args.type == "tanet":
        from ..convert.torch_import import convert_tanet
        from ..models.tanet import TANetConfig
        sd = ckpt.get("state_dict", ckpt)
        blob = json.load(open(args.config)) if args.config else {}
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in blob.get("backbone", {}).items()}
        cfg = TANetConfig(**kwargs)
        variables = convert_tanet(sd, cfg)
        save_checkpoint(args.dst, variables,
                        {"backbone": blob.get("backbone", {}),
                         "num_classes": blob.get("num_classes")},
                        {"source": args.src})
        print(f"converted tanet checkpoint -> {args.dst}")
        return
    elif args.type == "yolov5":
        from ..convert.torch_import import (
            convert_yolov5, yolo_config_from_torch)
        model = ckpt.get("model", ckpt)
        cfg, sd = yolo_config_from_torch(model)
        variables = convert_yolov5(sd, cfg)
        meta = {"source": args.src}
    elif args.type == "yolov5_cls":
        from ..convert.torch_import import (
            convert_yolov5_cls, yolo_cls_config_from_torch)
        model = ckpt.get("model", ckpt)
        cfg, sd = yolo_cls_config_from_torch(model)
        variables = convert_yolov5_cls(sd, cfg)
        meta = {"source": args.src}
    else:
        sd = ckpt.get("state_dict", ckpt)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        assert args.config, "--config (CLIPConfig json) required for clip"
        cfg = CLIPConfig(**json.load(open(args.config)))
        variables = convert_clip_vit(sd, cfg)
        meta = {"source": args.src}

    save_checkpoint(args.dst, variables, cfg, meta)
    print(f"converted {args.type} checkpoint -> {args.dst}")


if __name__ == "__main__":
    main()
