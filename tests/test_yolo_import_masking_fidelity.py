"""Detection-to-mask fidelity through IMPORTED yolo weights.

The reference explainability pipeline's concept masks come from stock
pretrained yolov5 (detect.py:114-233). With zero egress we can't load the
real checkpoint here, but behavioral parity transfers: this test runs the
SAME weights through the torch network and the converted flax network and
asserts the decoded detections and the resulting per-class masked videos
are identical — so whatever the real yolov5s.pt computes in torch, the
imported TPU model computes the same masks."""

import numpy as np
import torch

import jax.numpy as jnp

from test_yolo_conversion import TYolo

from cross_modal_video_engine_tpu.convert import (convert_yolov5,
                                                  yolo_config_from_torch)
from cross_modal_video_engine_tpu.explain.masking import (
    detect_video, per_class_masked_videos)
from cross_modal_video_engine_tpu.models.yolo import (YoloV5,
                                                      decode_predictions,
                                                      postprocess)

rng = np.random.default_rng(1337)


def test_imported_yolo_reproduces_torch_masks():
    torch.manual_seed(21)
    tm = TYolo(nc=4, wm=0.25, dm=0.34).eval()
    cfg, sd = yolo_config_from_torch(tm.state_dict())
    variables = convert_yolov5(sd, cfg)
    fm = YoloV5(cfg)

    T, H, W = 16, 64, 64
    frames_u8 = rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0

    # low thresholds so the random network emits plenty of boxes; the
    # >min_frames filter then exercises the per-class bookkeeping
    CONF, IOU = 0.01, 0.45

    def flax_detector(batch):
        raw = fm.apply(variables, jnp.asarray(batch))
        preds = np.asarray(decode_predictions(raw, cfg))
        return postprocess(preds, CONF, IOU)

    with torch.no_grad():
        t_raw = tm(torch.from_numpy(frames.transpose(0, 3, 1, 2)))
    t_maps = [r.permute(0, 2, 3, 1).numpy() for r in t_raw]
    t_preds = np.asarray(decode_predictions(
        [jnp.asarray(m) for m in t_maps], cfg))
    torch_dets = postprocess(t_preds, CONF, IOU)

    flax_dets = detect_video(flax_detector, frames, batch_size=8)
    assert len(flax_dets) == T
    total = sum(len(d) for d in flax_dets)
    assert total > 0, "random detector emitted nothing at conf=0.01"

    # identical detections per frame (same weights, same decode+NMS)
    for fd, td in zip(flax_dets, torch_dets):
        assert fd.shape == td.shape
        np.testing.assert_allclose(fd[:, :4], td[:, :4], rtol=2e-3,
                                   atol=0.15)            # box pixels
        np.testing.assert_array_equal(fd[:, 5], td[:, 5])  # classes

    # identical per-class masked videos (the CTV pipeline's input)
    names = [f"c{i}" for i in range(4)]
    m_flax = per_class_masked_videos(frames_u8, flax_dets, names,
                                     min_frames=4)
    m_torch = per_class_masked_videos(frames_u8, torch_dets, names,
                                      min_frames=4)
    assert sorted(m_flax) == sorted(m_torch)
    assert m_flax, "no concept survived the min-frames filter"
    for k in m_flax:
        np.testing.assert_array_equal(m_flax[k], m_torch[k])
        assert (m_flax[k] != frames_u8).any()   # masking actually happened
