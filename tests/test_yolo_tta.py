"""Detector test-time augmentation parity vs a torch replica of the
reference pipeline (models/yolo.py:206-251 _forward_augment/
_descale_pred/_clip_augmented + utils/torch_utils.py scale_img)."""

import numpy as np
import torch
import torch.nn.functional as tF
import jax.numpy as jnp

from cross_modal_video_engine_tpu.cli.yolo_train import (_det_infer,
                                                         _det_infer_tta)
from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_yolov5, yolo_config_from_torch)
from cross_modal_video_engine_tpu.models.yolo import (
    TTA_SCALES, YoloV5, clip_augmented, decode_predictions, descale_pred,
    scale_img)

from test_yolo_conversion import TYolo

rng = np.random.default_rng(321)


def _torch_scale_img(img, ratio, gs=32):
    """Reference utils/torch_utils.py:297-306 verbatim semantics."""
    import math
    if ratio == 1.0:
        return img
    h, w = img.shape[2:]
    s = (int(h * ratio), int(w * ratio))
    img = tF.interpolate(img, size=s, mode="bilinear", align_corners=False)
    h, w = (math.ceil(x * ratio / gs) * gs for x in (h, w))
    return tF.pad(img, [0, w - s[1], 0, h - s[0]], value=0.447)


def _torch_descale(p, flips, scale, img_size):
    """Reference models/yolo.py:225-240 (non-inplace branch)."""
    x, y, wh = p[..., 0:1] / scale, p[..., 1:2] / scale, p[..., 2:4] / scale
    if flips == 2:
        y = img_size[0] - y
    elif flips == 3:
        x = img_size[1] - x
    return np.concatenate((x, y, wh, p[..., 4:]), -1)


def _torch_clip(y, nl=3):
    """Reference models/yolo.py:242-251."""
    g = sum(4 ** k for k in range(nl))
    i = (y[0].shape[1] // g) * sum(4 ** k for k in range(1))
    y[0] = y[0][:, :-i]
    i = (y[-1].shape[1] // g) * sum(4 ** (nl - 1 - k) for k in range(1))
    y[-1] = y[-1][:, i:]
    return y


def test_scale_img_matches_torch():
    imgs = rng.random((2, 64, 96, 3)).astype(np.float32)
    for ratio in (0.83, 0.67):
        want = _torch_scale_img(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)), ratio)
        got = scale_img(jnp.asarray(imgs), ratio)
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 3, 1).numpy(),
            rtol=1e-5, atol=1e-5)


def test_tta_full_pipeline_matches_torch_replica():
    """The whole augmented-inference path (flip -> scale -> forward ->
    decode -> descale -> clip -> concat) matches the reference algorithm
    run over the SAME converted weights."""
    import dataclasses
    torch.manual_seed(5)
    tm = TYolo(nc=4, wm=0.25, dm=0.34).eval()
    cfg, sd = yolo_config_from_torch(tm.state_dict())
    cfg = dataclasses.replace(cfg, img_size=64)   # keep the CPU run tiny
    variables = convert_yolov5(sd, cfg)
    model = YoloV5(cfg)
    size = cfg.img_size
    imgs = rng.random((2, size, size, 3)).astype(np.float32)

    # torch-side reference TTA: replica forward + our (already
    # parity-tested) decode on its raw maps, reference descale/clip
    ys = []
    for ratio, flip in TTA_SCALES:
        ti = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        if flip:
            ti = ti.flip(flip)
        ti = _torch_scale_img(ti, ratio)
        with torch.no_grad():
            maps = tm(ti)
        maps = [jnp.asarray(m.permute(0, 2, 3, 1).numpy()) for m in maps]
        dec = np.asarray(decode_predictions(maps, cfg))
        ys.append(_torch_descale(dec, flip, ratio, (size, size)))
    want = np.concatenate(_torch_clip(ys), axis=1)

    got = np.asarray(_det_infer_tta(model)(
        variables["params"], variables["batch_stats"], imgs))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # TTA output is a strict superset protocol: more candidate rows
    # than single-scale, same feature layout
    single = np.asarray(_det_infer(model)(
        variables["params"], variables["batch_stats"], jnp.asarray(imgs)))
    assert got.shape[1] > single.shape[1]
    assert got.shape[2] == single.shape[2]


def test_clip_augmented_drops_expected_rows():
    # synthetic pass outputs with grid ratios 16:4:1 per pass
    def fake(n):
        return np.arange(n * 21, dtype=np.float32).reshape(1, n * 21, 1)
    ys = [fake(100), fake(60), fake(40)]
    out = clip_augmented(list(ys))
    assert out[0].shape[1] == 100 * 21 - 100      # P5 tail dropped
    assert out[1].shape[1] == 60 * 21             # middle pass untouched
    assert out[2].shape[1] == 40 * 21 - 40 * 16   # P3 head dropped
    np.testing.assert_array_equal(np.asarray(out[2][0, :, 0]),
                                  np.arange(40 * 16, 40 * 21))


def test_descale_pred_flip_lr():
    p = rng.random((1, 7, 9)).astype(np.float32)
    out = np.asarray(descale_pred(jnp.asarray(p), 3, 0.5, (64, 128)))
    np.testing.assert_allclose(out[..., 0], 128 - p[..., 0] / 0.5,
                               rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], p[..., 1] / 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[..., 4:], p[..., 4:])
