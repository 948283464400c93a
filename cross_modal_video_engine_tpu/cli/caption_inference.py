"""Video caption / label-sequence generation CLI.

Parity surface for the MCT seq_generate inference path
(Recognizer3D_Relseq._do_test -> RNNDecoderHead greedy loop,
decoder_head.py:187-227): decode a video, run the recognizer, emit the
thresholded label sequence per step (optionally mapped through a label
names file).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipelines import build_pipeline

DEFAULT_PIPELINE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=8, frame_interval=32, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(-1, 256)),
    dict(type="CenterCrop", crop_size=224),
    dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
    dict(type="FormatShape", input_format="NTHWC"),
]


def caption_video(model, variables, video_path: str, pipeline=None,
                  threshold: float = 0.5):
    pipe = build_pipeline(pipeline or DEFAULT_PIPELINE)
    r = pipe({"filename": video_path, "start_index": 0})
    clips = jnp.asarray(np.asarray(r["imgs"], np.float32))
    # (num_clips, T, H, W, C): clips fold into the batch, probs averaged
    # over them (average_clip(..., seq_gen=True) semantics)
    probs = model.apply(variables, clips, num_segs=clips.shape[0],
                        method="forward_test")
    probs = np.asarray(probs)[0]                      # (max_len, C)
    steps = [list(np.nonzero(p > threshold)[0]) for p in probs]
    return steps, probs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--video", required=True)
    parser.add_argument("--label_names", default=None,
                        help="json list of class names")
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args(argv)

    # init_recognizer handles BOTH caption families (TimeSformer and
    # any build_backbone type the trainer saved with a 'type' key) —
    # hardcoding TimeSformerConfig crashed on non-TimeSformer ckpts
    from ..api import init_recognizer
    model, variables, cfg_d = init_recognizer(args.checkpoint)

    steps, probs = caption_video(model, variables, args.video,
                                 threshold=args.threshold)
    names = None
    if args.label_names:
        names = json.load(open(args.label_names))
    for t, labels in enumerate(steps):
        shown = [names[i] if names else str(i) for i in labels]
        print(f"step {t}: {' '.join(shown) if shown else '<none>'}")
    return steps


if __name__ == "__main__":
    main()
