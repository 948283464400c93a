"""Config-driven recognition training CLI (MCT tools/train.py equivalent).

Config is a python file in the unified Config format (mmcv-style dicts,
`_base_` inheritance, dotted --cfg-options), e.g.:

    model = dict(
        backbone=dict(num_frames=8, img_size=224, patch_size=16,
                      embed_dims=768, num_heads=12, num_layers=12),
        num_classes=400)
    data = dict(
        train=dict(ann_file='train.txt', data_prefix='videos/'),
        val=dict(ann_file='val.txt', data_prefix='videos/'),
        pipeline=[dict(type='DecordInit'), ...],
        videos_per_gpu=8)
    optimizer = dict(optimizer='sgd', learning_rate=0.005)
    total_epochs = 15
    eval_interval = 1

Runs the EpochBasedRunner-equivalent loop: train epochs, EvalHook-style
validation (top-k/mean-class-acc), per-epoch train-state checkpoints,
save-best, resume.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen

from ..config import Config
from ..data.datasets import ShardedSampler, VideoDataset
from ..data.pipelines import build_pipeline
from ..models.recognizer import BackboneClassifier, Recognizer3D
from ..models.timesformer import TimeSformerConfig
from ..train.checkpoint import best_checkpoint_manager, save_checkpoint
from ..train.recognition_trainer import (
    RecognitionTrainConfig, RecTrainState, evaluate_classification,
    make_cls_train_step, make_rec_optimizer, train_multigrid)
from ..train.resume import (latest_checkpoint, load_train_state,
                            save_train_state)


# backbones emitting PER-FRAME (B, T, C) features: they pair with
# Recognizer2D + TSNHead segment consensus, not the pooled classifier
PER_FRAME_BACKBONES = ("TANet", "TSM", "TSN", "TIN", "TINExact",
                       "MobileNetV2TSM")


class _TemporalMean(linen.Module):
    """Pool a per-frame (B, T, C) backbone to (B, C).  Module-scope
    class (like _VideoCLIPPooled below) so two build_caption_backbone
    calls with equal configs produce EQUAL modules — a function-local
    class would mint a fresh type per call and defeat every
    instance-keyed jit/lru cache (20s-9min recompile via the relay)."""

    inner: linen.Module

    def __call__(self, videos, *, train: bool = False):
        return self.inner(videos, train=train).mean(axis=1)


def build_caption_backbone(btype: str, kw: dict):
    """Backbone for the caption (Relseq) trainer: pooled (B, C) feature.
    Per-frame (B, T, C) backbones get a temporal mean adapter (the
    reference seq_generate configs' CNN encoder pooling).  Shared by
    cli/caption_train and api.init_recognizer so per-frame caption
    checkpoints rebuild with the same param tree they trained with."""
    backbone = build_backbone(btype, kw)
    if btype in PER_FRAME_BACKBONES:
        backbone = _TemporalMean(backbone)
    return backbone


class _VideoCLIPPooled(linen.Module):
    """Backbone contract (videos -> pooled (B, C)) over
    VideoCLIP.encode_video.  Module-scope class with a config field so
    equal configs build equal (hashable) modules — the instance-keyed
    jit caches rely on that."""

    vcfg: "object"    # VideoCLIPConfig

    @linen.compact
    def __call__(self, videos, *, train: bool = False):
        from ..models.videoclip import VideoCLIP
        return VideoCLIP(self.vcfg, name="videoclip").encode_video(videos)


def _deep_tuple(v):
    """Recursively convert lists to tuples so nested config values
    (e.g. the per-stage non_local bitmasks) stay hashable inside frozen
    dataclass configs."""
    if isinstance(v, list):
        return tuple(_deep_tuple(x) for x in v)
    return v


def build_backbone(btype: str, kw: dict):
    """Backbone factory shared by the recognition and caption trainers
    (model.backbone.type registry keys)."""
    from ..models.resnet3d import (CSN, CSNConfig, ResNet3D, ResNet3DConfig,
                                   SlowFast, SlowFastConfig, X3D, X3DConfig)
    if btype in ("ResNet3D", "SlowOnly"):
        return ResNet3D(ResNet3DConfig(**kw))
    if btype == "SlowFast":
        return SlowFast(SlowFastConfig(**kw))
    if btype == "X3D":
        return X3D(X3DConfig(**kw))
    if btype == "CSN":
        return CSN(CSNConfig(**kw))
    if btype == "Swin3D":
        from ..models.swin3d import Swin3D, Swin3DConfig
        return Swin3D(Swin3DConfig(**kw))
    if btype == "MViT":
        from ..models.mvit import MViT, MViTConfig
        return MViT(MViTConfig(**kw))
    if btype == "TANet":
        from ..models.tanet import TANet, TANetConfig
        return TANet(TANetConfig(**kw))
    if btype == "VideoMAEViT":
        from ..models.videomae_vit import VideoMAEConfig, VideoMAEViT
        return VideoMAEViT(VideoMAEConfig(**kw))
    if btype == "TSM":
        from ..models.backbones2d import TSMConfig, TSMResNet
        return TSMResNet(TSMConfig(**kw))
    if btype == "TSN":
        # plain per-frame ResNet = TSM with the shift disabled
        # (reference configs/recognition/tsn/*: ResNet backbone +
        # TSNHead segment consensus)
        from ..models.backbones2d import TSMConfig, TSMResNet
        return TSMResNet(TSMConfig(**dict(kw, shift_div=0)))
    if btype == "TIN":
        from ..models.tin_mobilenet import TINConfig, TINResNet
        return TINResNet(TINConfig(**kw))
    if btype == "TINExact":
        from ..models.tin_mobilenet import TINExactConfig, TINResNetExact
        return TINResNetExact(TINExactConfig(**kw))
    if btype == "MobileNetV2TSM":
        from ..models.tin_mobilenet import (MobileNetV2TSM,
                                            MobileNetV2TSMConfig)
        if "stages" in kw:
            kw["stages"] = tuple(tuple(s) for s in kw["stages"])
        return MobileNetV2TSM(MobileNetV2TSMConfig(**kw))
    if btype == "C3D":
        from ..models.backbones2d import C3D
        return C3D(**kw)
    if btype == "R2Plus1D":
        from ..models.backbones2d import R2Plus1D, R2Plus1DConfig
        return R2Plus1D(R2Plus1DConfig(**kw))
    raise ValueError(f"unknown backbone type {btype}")


def build_recognition_model(cfg: Config):
    """model.backbone.type selects the family (TimeSformer default; the
    conv backbones pair with BackboneClassifier and multigrid).  A
    model.neck=dict(type='TPN', ...) block routes stages through the
    TPN neck (the configs/recognition/tpn family)."""
    bcfg = dict(cfg["model.backbone"])
    btype = bcfg.pop("type", "TimeSformer")
    num_classes = cfg["model.num_classes"]
    kw = {k: _deep_tuple(v) for k, v in bcfg.items()}
    ncfg = cfg.get("model.neck")
    if ncfg and ncfg.get("type") == "TPN":
        from ..models.recognizer import TPNRecognizer
        from ..models.tpn import TPNConfig
        nkw = {k: tuple(v) if isinstance(v, list) else v
               for k, v in ncfg.items() if k != "type"}
        nkw.setdefault("aux_num_classes", num_classes)
        return TPNRecognizer(build_backbone(btype, kw),
                             TPNConfig(**nkw), num_classes)
    if btype == "TimeSformer":
        return Recognizer3D(TimeSformerConfig(**kw),
                            num_classes=num_classes)
    if btype == "CLIP":
        # reference configs/recognition/clip/clip_mean_pooling_*.py:
        # Recognizer3D_CLIP over a frozen-ish CLIP vision tower with a
        # linear head over the time-mean of frame features
        from ..models.clip import CLIPConfig, VisionTower
        from ..models.recognizer import Recognizer3DCLIP
        return Recognizer3DCLIP(VisionTower(CLIPConfig(**kw)), num_classes)
    if btype == "VideoCLIP":
        # reference configs/recognition/videoclip/ctv_extraction.py:
        # Recognizer3D over the VideoCLIP video encoder's pooled output
        from ..models.videoclip import VideoCLIPConfig
        return BackboneClassifier(
            _VideoCLIPPooled(VideoCLIPConfig(**kw)), num_classes=num_classes)
    if btype in PER_FRAME_BACKBONES:
        # (B, T, C) per-frame features -> segment-consensus head:
        # TSNHead by default, or the multi-scale relation TRNHead when
        # model.head selects it (reference configs/recognition/trn/*)
        from ..models.heads import TSNHead
        from ..models.recognizer import Recognizer2D
        hcfg = cfg.get("model.head")
        if hcfg and hcfg.get("type") in ("TRN", "TRNHead"):
            from ..models.heads import TRNHead
            hkw = {k: v for k, v in dict(hcfg).items() if k != "type"}
            head = TRNHead(num_classes=num_classes, **hkw)
        else:
            head = TSNHead(num_classes)
        return Recognizer2D(build_backbone(btype, kw), head)
    return BackboneClassifier(build_backbone(btype, kw),
                              num_classes=num_classes)


def _label_batches(ds, batch_size, order=None):
    for imgs, items, n in ds.batches(batch_size, order):
        clips = jnp.asarray(imgs[:, 0].astype(np.float32))
        labels = jnp.asarray([it["label"] for it in items], jnp.int32)
        yield clips, labels, n


def train_from_config(cfg: Config, work_dir: str,
                      resume: str | None = None,
                      num_epochs: int | None = None):
    model = build_recognition_model(cfg)

    pipe = build_pipeline(cfg["data.pipeline"])
    train_ds = VideoDataset(cfg["data.train.ann_file"], pipe,
                            cfg.get("data.train.data_prefix"))
    val_ds = VideoDataset(cfg["data.val.ann_file"], pipe,
                          cfg.get("data.val.data_prefix"))
    bs = cfg.get("data.videos_per_gpu", 8)

    tcfg = RecognitionTrainConfig(**cfg.get("optimizer", {}))

    if cfg.get("omnisource"):
        return _train_omnisource_from_config(cfg, model, train_ds, val_ds,
                                             bs, tcfg, work_dir, num_epochs,
                                             resume=resume)
    if cfg.get("multigrid"):
        return _train_multigrid_from_config(cfg, model, train_ds, bs, tcfg,
                                            work_dir, num_epochs)
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)
    # total_steps sizes the warmup-cosine schedule to the actual run
    # (the 10k default would decay lr to 0 mid-run on real datasets)
    tx = make_rec_optimizer(
        tcfg, total_steps=epochs * max(1, (len(train_ds) + bs - 1) // bs))
    clips0, labels0, _ = next(_label_batches(train_ds, bs))
    variables = model.init(jax.random.key(0), clips0)
    stats = variables.get("batch_stats")
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    # mmaction train_cfg=dict(blending=dict(type='MixupBlending', alpha=.2))
    blending = None
    bcfg = cfg.get("train_cfg.blending")
    if bcfg:
        from ..data.blending import make_blending
        blending = make_blending(
            bcfg["type"], cfg["model.num_classes"],
            bcfg.get("alpha", 0.2))
    from ..models.recognizer import TPNRecognizer
    is_tpn = isinstance(model, TPNRecognizer)
    if is_tpn:
        from ..train.recognition_trainer import make_tpn_train_step_stats
        step_bn = make_tpn_train_step_stats(model, tx, bf16=tcfg.bf16)
    elif stats is not None:
        from ..train.recognition_trainer import make_cls_train_step_stats
        step_bn = make_cls_train_step_stats(model, tx, blending=blending,
                                            bf16=tcfg.bf16)
    else:
        step = make_cls_train_step(model, tx, blending=blending,
                                   bf16=tcfg.bf16)
    save_best = best_checkpoint_manager(work_dir)
    sampler = ShardedSampler(len(train_ds), shuffle=True)
    rng = jax.random.key(1)

    start_epoch = 0
    if resume:
        # batch_stats ride in the payload so BN resumes with its
        # accumulated running statistics, not model.init values.
        payload, loop = load_train_state(
            resume, {"state": state, "batch_stats": stats})
        state, stats = payload["state"], payload["batch_stats"]
        start_epoch = int(loop.get("epoch", -1)) + 1

    eval_interval = cfg.get("eval_interval", tcfg.eval_interval)
    history = []
    for epoch in range(start_epoch, epochs):
        losses, accs = [], []
        for clips, labels, n in _label_batches(train_ds, bs,
                                               sampler.indices(epoch)):
            rng, sub = jax.random.split(rng)
            if stats is not None:
                state, stats, logs = step_bn(state, stats, clips, labels,
                                             sub)
            else:
                state, logs = step(state, clips, labels, sub)
            losses.append(float(logs["loss"]))
            accs.append(float(logs["top1_acc"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "train_top1": float(np.mean(accs))}
        if (epoch + 1) % eval_interval == 0:
            report = evaluate_classification(
                model, state.params, _label_batches(val_ds, bs),
                stats=stats)
            rec.update(report)
            live = {"params": state.params}
            if stats is not None:
                live["batch_stats"] = stats
            save_best(live,
                      {"backbone": cfg["model.backbone"],
                       "num_classes": cfg["model.num_classes"]},
                      report["top1_acc"], {"epoch": epoch})
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"state": state, "batch_stats": stats},
                         {"epoch": epoch})
        history.append(rec)
        print(json.dumps(rec))
    return state, history


def _omnisource_total_steps(n_main: int, bs: int, epochs: int,
                            train_ratio) -> int:
    """LR-schedule step count for train_omnisource: every aux batch is
    an optimizer step too, so the schedule must cover main steps PLUS
    the aux waves (one wave of sum(train_ratio[1:]) steps per
    train_ratio[0] main steps)."""
    main_steps = max(1, (n_main + bs - 1) // bs)
    waves_per_epoch = -(-main_steps // max(1, train_ratio[0]))
    aux_per_wave = sum(train_ratio[1:])
    return epochs * (main_steps + waves_per_epoch * aux_per_wave)


def _train_omnisource_from_config(cfg, model, train_ds, val_ds, bs, tcfg,
                                  work_dir, num_epochs, resume=None):
    """OmniSource joint training (reference configs/recognition/
    omnisource/*: `omnisource = True` + web/insta/kraw aux sources,
    apis/train.py train_ratio alternation).  Config shape:

        omnisource = dict(
            train_ratio=[2, 1, ...],       # [main niter, aux0 times, ..]
            aux=[dict(ann_file=..., data_prefix=..., pipeline=[...])])

    Aux sources reuse data.pipeline unless they carry their own.
    Per-epoch train state (params/stats/opt_state/it) is checkpointed
    and --resume continues from it."""
    from ..train.recognition_trainer import train_omnisource
    oms = dict(cfg["omnisource"])
    sampler = ShardedSampler(len(train_ds), shuffle=True)
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)

    # feed FULL padded batches (ds.batches pads tails by repeating real
    # samples, the reference sampler's wrap-around): slicing to [:n]
    # would hand the jitted step a second tail shape -> an extra XLA
    # compile per data source through the remote relay
    def main_batches(epoch):
        for clips, labels, _ in _label_batches(train_ds, bs,
                                               sampler.indices(epoch)):
            yield clips, labels

    aux_sources = []
    for acfg in oms.get("aux", []):
        pipe = build_pipeline(acfg.get("pipeline", cfg["data.pipeline"]))
        ads = VideoDataset(acfg["ann_file"], pipe, acfg.get("data_prefix"))

        def source(ads=ads):
            for clips, labels, _ in _label_batches(ads, bs):
                yield clips, labels
        aux_sources.append(source)

    clips0, _, _ = next(_label_batches(train_ds, bs))
    variables = model.init(jax.random.key(0), clips0)
    train_ratio = tuple(oms.get("train_ratio", (2,) + (1,) * len(aux_sources)))
    total_steps = _omnisource_total_steps(len(train_ds), bs, epochs,
                                          train_ratio)

    from ..train.recognition_trainer import make_rec_optimizer
    start_epoch, init_opt, init_it = 0, None, 0
    if resume:
        tx0 = make_rec_optimizer(tcfg, total_steps=total_steps)
        template = {"params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                    "opt_state": tx0.init(variables["params"])}
        payload, loop = load_train_state(resume, template)
        variables = {"params": payload["params"]}
        if payload["batch_stats"]:
            variables["batch_stats"] = payload["batch_stats"]
        init_opt = payload["opt_state"]
        start_epoch = int(loop.get("epoch", -1)) + 1
        init_it = int(loop.get("it", 0))

    def save_epoch(epoch, state):
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"params": state["params"],
                          "batch_stats": state["batch_stats"],
                          "opt_state": state["opt_state"]},
                         {"epoch": epoch, "it": state["it"]})

    variables, history = train_omnisource(
        model, variables, tcfg, main_batches, aux_sources,
        train_ratio=train_ratio, total_epochs=epochs,
        total_steps=total_steps, start_epoch=start_epoch,
        init_opt_state=init_opt, init_it=init_it,
        epoch_callback=save_epoch)
    report = evaluate_classification(
        model, variables["params"], _label_batches(val_ds, bs),
        stats=variables.get("batch_stats"))
    save_checkpoint(os.path.join(work_dir, "omnisource_final"), variables,
                    {"backbone": cfg["model.backbone"],
                     "num_classes": cfg["model.num_classes"]},
                    {"epochs": epochs, "omnisource": True, **report})
    for rec in history:
        print(json.dumps(rec))
    print(json.dumps(report))
    return variables, history


def _train_multigrid_from_config(cfg, model, train_ds, bs, tcfg, work_dir,
                                 num_epochs):
    """Multigrid path: per-bucket compiled steps, LR scaled with the
    bucket's effective batch, final epochs at the finest bucket."""
    from ..train.multigrid import GridBucket, MultigridSchedule
    mg = dict(cfg["multigrid"])
    if "buckets" in mg:
        mg["buckets"] = tuple(GridBucket(*b) for b in mg["buckets"])
    schedule = MultigridSchedule(**mg)
    sampler = ShardedSampler(len(train_ds), shuffle=True)
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)

    def epoch_batches(epoch):
        # full padded batches: see _train_omnisource_from_config note
        for clips, labels, _ in _label_batches(train_ds, bs,
                                               sampler.indices(epoch)):
            yield clips, labels

    clips0, _, _ = next(_label_batches(train_ds, bs))
    variables = model.init(jax.random.key(0), clips0)
    (variables, _opt), history = train_multigrid(
        model, variables, tcfg, schedule, epoch_batches, epochs,
        total_steps=epochs * max(1, (len(train_ds) + bs - 1) // bs))
    save_checkpoint(os.path.join(work_dir, "multigrid_final"), variables,
                    {"backbone": cfg["model.backbone"],
                     "num_classes": cfg["model.num_classes"]},
                    {"epochs": epochs, "multigrid": True})
    for rec in history:
        print(json.dumps(rec))
    return variables, history


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--work_dir", required=True)
    parser.add_argument("--resume", nargs="?", const="auto", default=None)
    parser.add_argument("--total_epochs", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    resume = args.resume
    if resume == "auto":
        resume = latest_checkpoint(args.work_dir)
    state, history = train_from_config(cfg, args.work_dir, resume,
                                       args.total_epochs)
    return history


if __name__ == "__main__":
    main()
