"""YOLO detector, NMS, masking, and full explain pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.yolo import (
    YoloConfig, YoloV5, decode_predictions, nms, postprocess)
from cross_modal_video_engine_tpu.explain.masking import (
    box_mask, per_class_masked_videos, detect_video)
from cross_modal_video_engine_tpu.explain.pipeline import (
    ConceptBank, explain_video)
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D

rng = np.random.default_rng(55)


def test_yolo_shapes_and_decode():
    cfg = YoloConfig(num_classes=4, img_size=64)
    model = YoloV5(cfg)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    raw = model.apply(variables, x)
    assert [r.shape for r in raw] == [
        (1, 8, 8, 27), (1, 4, 4, 27), (1, 2, 2, 27)]
    preds = decode_predictions(raw, cfg)
    n = 8 * 8 * 3 + 4 * 4 * 3 + 2 * 2 * 3
    assert preds.shape == (1, n, 9)
    p = np.asarray(preds)
    # xy within (-stride/2, img+stride/2); wh positive
    assert p[..., 2:4].min() > 0
    assert np.isfinite(p).all()


def test_decode_grid_offsets():
    """A zero logit at cell (i,j) decodes to center (j+0.5)*stride."""
    cfg = YoloConfig(num_classes=1)
    H = W = 2
    raw = [np.zeros((1, H, W, 3 * 6), np.float32),
           np.zeros((1, 1, 1, 3 * 6), np.float32),
           np.zeros((1, 1, 1, 3 * 6), np.float32)]
    preds = np.asarray(decode_predictions([jnp.asarray(r) for r in raw], cfg))
    # sigmoid(0)=0.5 -> xy = (0.5*2-0.5+grid)*stride = (0.5+grid)*8
    first_cell = preds[0, 0]
    np.testing.assert_allclose(first_cell[:2], [4.0, 4.0])
    # wh = (2*0.5)^2 * anchor = anchor
    np.testing.assert_allclose(first_cell[2:4], [10, 13])


def test_nms_suppresses_overlaps_keeps_classes():
    boxes = np.array([[50, 50, 20, 20], [52, 52, 20, 20], [200, 200, 20, 20],
                      [50, 50, 20, 20]], np.float64)
    scores = np.array([0.9, 0.8, 0.7, 0.85])
    classes = np.array([0, 0, 0, 1])
    keep = nms(boxes, scores, classes, iou_thres=0.45)
    assert 0 in keep and 2 in keep and 3 in keep and 1 not in keep


def test_postprocess_thresholds():
    nc = 3
    preds = np.zeros((1, 5, 5 + nc))
    preds[0, 0] = [50, 50, 10, 10, 0.9, 0.1, 0.95, 0.1]
    preds[0, 1] = [90, 90, 10, 10, 0.05, 0.9, 0.1, 0.1]   # low obj conf
    out = postprocess(preds, conf_thres=0.25)
    assert out[0].shape == (1, 6)
    x1, y1, x2, y2, conf, cls = out[0][0]
    assert (x1, y1, x2, y2) == (45, 45, 55, 55)
    assert cls == 1


def test_box_mask_and_per_class_masked_videos():
    frames = np.full((14, 32, 32, 3), 200, np.uint8)
    # class 0 in all 14 frames, class 1 in only 3 frames (filtered at >10)
    dets = []
    for t in range(14):
        rows = [[4, 4, 12, 12, 0.9, 0]]
        if t < 3:
            rows.append([20, 20, 28, 28, 0.9, 1])
        dets.append(np.array(rows, np.float64))
    masked = per_class_masked_videos(frames, dets, ["dog", "cat"],
                                     min_frames=10)
    assert set(masked) == {"dog"}
    assert (masked["dog"][:, 4:12, 4:12] == 0).all()
    assert (masked["dog"][:, 20:28, 20:28] == 200).all()   # other region intact
    assert (frames[:, 4:12, 4:12] == 200).all()            # input not mutated


def test_full_explain_pipeline():
    ts = TimeSformerConfig(num_frames=2, img_size=16, patch_size=8,
                           embed_dims=16, num_heads=2, num_layers=2,
                           drop_path_max=0.0)
    model = Recognizer3D(ts, num_classes=3)
    v = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), v)

    D = 16
    banks = {
        "symbolic": ConceptBank(rng.standard_normal((4, D)).astype(np.float32),
                                ["a", "b", "c", "d"]),
    }

    raw = rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)

    def fake_detector(frames):
        # class 0 box on every frame
        return [np.array([[2, 2, 9, 9, 0.9, 0]]) for _ in frames]

    def prep(clip_u8):
        return clip_u8.astype(np.float32) / 255.0

    out = explain_video(model, variables, v, target_layer=0,
                        concept_banks=banks, detector_fn=fake_detector,
                        raw_frames_u8=raw, class_names=["dog"],
                        preprocess_fn=prep, min_frames=1, topk=2)
    assert out["pred"].shape == (1,)
    assert len(out["symbolic_top"]) == 2
    assert out["detected_concepts"] == ["dog"]
    assert "dog" in out["video_ctvs"]
    assert out["video_ctvs"]["dog"].shape == (D,)
    assert out["video_ctv_top"][0][0] == "dog"


def test_process_mask_matches_torch_replica():
    """process_mask vs a torch replica of segment/general.py
    process_mask(upsample=True) :44-67."""
    import torch
    import torch.nn.functional as F
    from cross_modal_video_engine_tpu.models.yolo import process_mask

    rng = np.random.RandomState(0)
    Hm = Wm = 8
    nm, n, ih, iw = 6, 3, 32, 32
    proto = rng.randn(Hm, Wm, nm).astype(np.float32)
    coefs = rng.randn(n, nm).astype(np.float32)
    boxes = np.array([[2.0, 4.0, 20.0, 28.0],
                      [8.0, 8.0, 30.0, 24.0],
                      [0.0, 0.0, 32.0, 32.0]], np.float32)

    got = process_mask(proto, coefs, boxes, (ih, iw), upsample=True)

    pt = torch.tensor(proto).permute(2, 0, 1)          # (nm, Hm, Wm)
    masks = (torch.tensor(coefs) @ pt.reshape(nm, -1)).sigmoid() \
        .view(-1, Hm, Wm)
    down = torch.tensor(boxes.copy())
    down[:, [0, 2]] *= Wm / iw
    down[:, [1, 3]] *= Hm / ih
    x1, y1, x2, y2 = torch.chunk(down[:, :, None], 4, 1)
    r = torch.arange(Wm, dtype=x1.dtype)[None, None, :]
    c = torch.arange(Hm, dtype=x1.dtype)[None, :, None]
    masks = masks * ((r >= x1) * (r < x2) * (c >= y1) * (c < y2))
    masks = F.interpolate(masks[None], (ih, iw), mode="bilinear",
                          align_corners=False)[0]
    want = (masks > 0.5).numpy()
    assert got.shape == want.shape == (n, ih, iw)
    # bilinear kernels differ only at exact-0.5 ties; demand near-exact
    assert (got == want).mean() > 0.999


def test_postprocess_seg_shapes():
    """Segment decode + NMS + mask assembly end-to-end on random maps."""
    from cross_modal_video_engine_tpu.models.yolo import (
        YoloConfig, YoloV5, decode_predictions, postprocess_seg)
    cfg = YoloConfig(num_classes=3, depth_multiple=0.33,
                     width_multiple=0.125, img_size=64, masks=4, protos=32)
    model = YoloV5(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (maps, proto) = model.apply(variables, x)
    preds = decode_predictions(maps, cfg)
    assert preds.shape[-1] == 5 + 3 + 4
    outs = postprocess_seg(np.asarray(preds), np.asarray(proto), (64, 64),
                           conf_thres=0.0, max_det=10)
    det, masks = outs[0]
    assert det.shape[1] == 6 and masks.shape == (len(det), 64, 64)
    assert masks.dtype == bool
