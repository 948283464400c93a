"""High-level recognition API (MCT mmaction/apis equivalent).

* `init_recognizer(checkpoint)` — rebuild model + variables from a saved
  checkpoint (apis/inference.py:19 equivalent; config embedded in ckpt);
* `inference_recognizer(model, variables, video, outputs=...)` — run the
  test pipeline on a video file and return (scores, captured_layers),
  mirroring apis/inference.py:56-192 incl. the `outputs=` layer capture,
  `centercrop` toggle and `shuffle_idx` frame-permutation probe.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .data.pipelines import build_pipeline
from .models.decoder_head import RNNDecoderConfig
from .models.recognizer import Recognizer3D, Recognizer3DRelseq
from .models.timesformer import TimeSformerConfig
from .train.checkpoint import load_checkpoint

TEST_PIPELINE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=32, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
    dict(type="FormatShape", input_format="NTHWC"),
]


def init_recognizer(checkpoint: str):
    """Returns (model, variables, config_dict).  When the backbone
    config says dtype='bfloat16', the loaded tree is cast to bf16
    (torch .half() analogue, utils/precision.py) — without it the f32
    params promote every Dense(dtype=None)/BatchNorm back to f32 and
    the 'bf16' inference runs an f32 program."""
    variables, cfg_d, _ = load_checkpoint(checkpoint)
    bb_kw = {k: tuple(v) if isinstance(v, list) else v
             for k, v in cfg_d["backbone"].items()}
    from .utils.precision import maybe_cast_bf16
    variables = maybe_cast_bf16(variables, cfg_d)
    btype = bb_kw.pop("type", "TimeSformer")
    if btype != "TimeSformer":
        from .cli.recognition_train import build_caption_backbone
        from .models.recognizer import RecognizerRelseq
        assert "decoder" in cfg_d, "non-TimeSformer ckpts are caption models"
        model = RecognizerRelseq(build_caption_backbone(btype, bb_kw),
                                 RNNDecoderConfig(**cfg_d["decoder"]))
        return model, variables, cfg_d
    backbone = TimeSformerConfig(**bb_kw)
    if "decoder" in cfg_d:
        model = Recognizer3DRelseq(backbone,
                                   RNNDecoderConfig(**cfg_d["decoder"]))
    else:
        model = Recognizer3D(backbone, num_classes=cfg_d["num_classes"])
    return model, variables, cfg_d


def inference_recognizer(model, variables, video: str,
                         outputs: Optional[Sequence[int]] = None,
                         pipeline: Optional[list] = None,
                         centercrop: bool = True,
                         shuffle_idx: Optional[Sequence[int]] = None,
                         return_scores: bool = True
                         ) -> Tuple[np.ndarray, Dict[int, np.ndarray]]:
    """Run a video through the test pipeline and the recognizer.
    outputs: backbone block indices to capture (OutputHook equivalent)."""
    # copy the op dicts, not just the list: centercrop=False rewrites
    # the Resize entry, and a shallow copy would mutate the shared
    # TEST_PIPELINE (or the caller's pipeline) for every later call
    pipe_cfg = [dict(c) for c in (pipeline or TEST_PIPELINE)]
    if not centercrop:
        pipe_cfg = [c for c in pipe_cfg if c.get("type") != "CenterCrop"]
        for c in pipe_cfg:
            if c.get("type") == "Resize":
                c["scale"] = (224, 224)
                c["keep_ratio"] = False
    if shuffle_idx is not None:
        insert_at = next((i for i, c in enumerate(pipe_cfg)
                          if c["type"] == "Resize"), None)
        if insert_at is None:
            raise ValueError(
                "shuffle_idx needs a Resize op in the pipeline as its "
                "insertion anchor; none found")
        pipe_cfg.insert(insert_at,
                        dict(type="RandomShuffleFrames",
                             shuffle_idx=list(shuffle_idx)))
    pipe = build_pipeline(pipe_cfg)
    r = pipe({"filename": video, "start_index": 0})
    clips = jnp.asarray(np.asarray(r["imgs"], np.float32))

    if outputs:
        scores, captured = model.apply(variables, clips, tuple(outputs),
                                       method="forward_with_capture")
        captured = {k: np.asarray(v) for k, v in captured.items()}
    else:
        scores = model.apply(variables, clips)
        captured = {}
    return (np.asarray(scores) if return_scores else None), captured
