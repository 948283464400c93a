"""YOLOv5 training-loss parity vs a torch replica of the reference
criterion (MCT/yolov5/utils/loss.py ComputeLoss + build_targets and
utils/metrics.py bbox_iou CIoU).

The replica performs the reference's dynamic-filtering assignment in
torch; the production loss (losses/yolo.py) is the static-shape masked
formulation.  Fixture boxes are spread out so no grid cell receives two
writes, making the reference's order-dependent tobj scatter and our
deterministic max-scatter coincide exactly.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cross_modal_video_engine_tpu.losses.yolo import (
    YoloHyp, bbox_ciou, build_targets, scale_hyp, smooth_bce, yolo_loss)

ANCHORS = (((10, 13), (16, 30), (33, 23)),
           ((30, 61), (62, 45), (59, 119)),
           ((116, 90), (156, 198), (373, 326)))
STRIDES = (8, 16, 32)
NC = 4
IMG = 64


# ---------------------------------------------------------------------------
# torch replica of the reference criterion
# ---------------------------------------------------------------------------

def _ciou_t(box1, box2, eps=1e-7):
    """metrics.py bbox_iou(..., xywh=True, CIoU=True) :222-256."""
    (x1, y1, w1, h1), (x2, y2, w2, h2) = box1.chunk(4, -1), box2.chunk(4, -1)
    b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    inter = ((torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0)
             * (torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)).clamp(0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = torch.max(b1x2, b2x2) - torch.min(b1x1, b2x1)
    ch = torch.max(b1y2, b2y2) - torch.min(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi ** 2) * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
    with torch.no_grad():
        alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def _build_targets_t(pshapes, rows, anchors_grid, anchor_t):
    """loss.py build_targets :177-234.  rows: (n, 6) [img,cls,x,y,w,h]
    normalized; pshapes: per-layer (B, na, H, W, no) shapes."""
    na, nt = 3, rows.shape[0]
    tcls, tbox, indices, anch = [], [], [], []
    gain = torch.ones(7)
    ai = torch.arange(na).float().view(na, 1).repeat(1, nt)
    t_all = torch.cat((rows.repeat(na, 1, 1), ai[..., None]), 2)
    g = 0.5
    off = torch.tensor([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]]).float() * g
    for i in range(len(pshapes)):
        anchors, shape = anchors_grid[i], pshapes[i]
        gain[2:6] = torch.tensor(shape)[[3, 2, 3, 2]].float()
        t = t_all * gain
        if nt:
            r = t[..., 4:6] / anchors[:, None]
            j = torch.max(r, 1 / r).max(2)[0] < anchor_t
            t = t[j]
            gxy = t[:, 2:4]
            gxi = gain[[2, 3]] - gxy
            j, k = ((gxy % 1 < g) & (gxy > 1)).T
            l, m = ((gxi % 1 < g) & (gxi > 1)).T
            j = torch.stack((torch.ones_like(j), j, k, l, m))
            t = t.repeat((5, 1, 1))[j]
            offsets = (torch.zeros_like(gxy)[None] + off[:, None])[j]
        else:
            t = t_all[0]
            offsets = 0
        bc, gxy, gwh, a = t.chunk(4, 1)
        a, (b, c) = a.long().view(-1), bc.long().T
        gij = (gxy - offsets).long()
        gi, gj = gij.T
        indices.append((b, a, gj.clamp_(0, shape[2] - 1),
                        gi.clamp_(0, shape[3] - 1)))
        tbox.append(torch.cat((gxy - gij, gwh), 1))
        anch.append(anchors[a])
        tcls.append(c)
    return tcls, tbox, indices, anch


def _loss_t(preds, rows, hyp, nc):
    """loss.py ComputeLoss.__call__ :121-175 (gr=1, no focal/autobal)."""
    anchors_grid = [torch.tensor(a, dtype=torch.float32) / s
                    for a, s in zip(ANCHORS, STRIDES)]
    cp, cn = smooth_bce(hyp.label_smoothing)
    balance = [4.0, 1.0, 0.4]
    lcls = torch.zeros(1)
    lbox = torch.zeros(1)
    lobj = torch.zeros(1)
    tcls, tbox, indices, anchors = _build_targets_t(
        [p.shape for p in preds], rows, anchors_grid, hyp.anchor_t)
    bce_c = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([hyp.cls_pw]))
    bce_o = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([hyp.obj_pw]))
    for i, pi in enumerate(preds):
        b, a, gj, gi = indices[i]
        tobj = torch.zeros(pi.shape[:4], dtype=pi.dtype)
        n = b.shape[0]
        if n:
            pxy, pwh, _, pcls = pi[b, a, gj, gi].split((2, 2, 1, nc), 1)
            pxy = pxy.sigmoid() * 2 - 0.5
            pwh = (pwh.sigmoid() * 2) ** 2 * anchors[i]
            pbox = torch.cat((pxy, pwh), 1)
            iou = _ciou_t(pbox, tbox[i]).squeeze()
            lbox += (1.0 - iou).mean()
            tobj[b, a, gj, gi] = iou.detach().clamp(0).type(tobj.dtype)
            if nc > 1:
                t = torch.full_like(pcls, cn)
                t[range(n), tcls[i]] = cp
                lcls += bce_c(pcls, t)
        lobj += bce_o(pi[..., 4], tobj) * balance[i]
    lbox *= hyp.box
    lobj *= hyp.obj
    lcls *= hyp.cls
    bs = tobj.shape[0]
    return ((lbox + lobj + lcls) * bs,
            dict(box=lbox.item(), obj=lobj.item(), cls=lcls.item()))


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _fixture(seed=0):
    rng = np.random.RandomState(seed)
    B = 2
    grids = [(IMG // s, IMG // s) for s in STRIDES]
    raw = [rng.randn(B, h, w, 3 * (5 + NC)).astype(np.float32) * 0.5
           for (h, w) in grids]
    # spread-out boxes: distinct cells at every scale
    targets = np.zeros((B, 3, 5), np.float32)
    targets[0, 0] = [1, 0.30, 0.40, 0.20, 0.30]
    targets[0, 1] = [3, 0.72, 0.61, 0.40, 0.35]
    targets[1, 0] = [0, 0.22, 0.68, 0.30, 0.20]
    valid = np.zeros((B, 3), bool)
    valid[0, :2] = True
    valid[1, 0] = True
    return raw, targets, valid


def _torch_rows(targets, valid):
    rows = []
    for b in range(targets.shape[0]):
        for t in range(targets.shape[1]):
            if valid[b, t]:
                rows.append([b, targets[b, t, 0], *targets[b, t, 1:]])
    return torch.tensor(rows, dtype=torch.float32)


def _torch_preds(raw):
    # (B, H, W, na*(5+nc)) -> (B, na, H, W, 5+nc)
    return [torch.tensor(r).reshape(r.shape[0], r.shape[1], r.shape[2],
                                    3, 5 + NC).permute(0, 3, 1, 2, 4)
            for r in raw]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_ciou_matches_torch():
    rng = np.random.RandomState(1)
    b1 = rng.uniform(1, 10, (16, 4)).astype(np.float32)
    b2 = rng.uniform(1, 10, (16, 4)).astype(np.float32)
    ours = np.asarray(bbox_ciou(jnp.asarray(b1), jnp.asarray(b2)))
    ref = _ciou_t(torch.tensor(b1), torch.tensor(b2)).squeeze(-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_build_targets_matches_torch():
    raw, targets, valid = _fixture()
    grids = [(r.shape[1], r.shape[2]) for r in raw]
    ours = build_targets(jnp.asarray(targets), jnp.asarray(valid),
                         ANCHORS, STRIDES, grids, anchor_t=4.0)
    anchors_grid = [torch.tensor(a, dtype=torch.float32) / s
                    for a, s in zip(ANCHORS, STRIDES)]
    tcls, tbox, indices, anch = _build_targets_t(
        [p.shape for p in _torch_preds(raw)], _torch_rows(targets, valid),
        anchors_grid, 4.0)
    for i in range(3):
        m = np.asarray(ours[i].mask)
        got = sorted(zip(np.asarray(ours[i].b)[m].tolist(),
                         np.asarray(ours[i].a)[m].tolist(),
                         np.asarray(ours[i].gj)[m].tolist(),
                         np.asarray(ours[i].gi)[m].tolist(),
                         np.asarray(ours[i].tcls)[m].tolist(),
                         [tuple(r) for r in
                          np.round(np.asarray(ours[i].tbox)[m], 4).tolist()]))
        b, a, gj, gi = indices[i]
        want = sorted(zip(b.tolist(), a.tolist(), gj.tolist(), gi.tolist(),
                          tcls[i].tolist(),
                          [tuple(r) for r in
                           np.round(tbox[i].numpy(), 4).tolist()]))
        assert got == want, f"layer {i} assignment mismatch"


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_loss_matches_torch(smoothing):
    raw, targets, valid = _fixture()
    hyp = scale_hyp(YoloHyp(label_smoothing=smoothing),
                    nl=3, nc=NC, imgsz=IMG)
    total, items = yolo_loss([jnp.asarray(r) for r in raw],
                             jnp.asarray(targets), jnp.asarray(valid),
                             ANCHORS, STRIDES, hyp, NC)
    ref_total, ref_items = _loss_t(_torch_preds(raw),
                                   _torch_rows(targets, valid), hyp, NC)
    assert np.allclose(float(total), ref_total.item(), atol=1e-4)
    for k in ("box", "obj", "cls"):
        assert np.allclose(float(items[k]), ref_items[k], atol=1e-5), k


def test_loss_no_targets_finite():
    raw, targets, valid = _fixture()
    valid[:] = False
    total, items = yolo_loss([jnp.asarray(r) for r in raw],
                             jnp.asarray(targets), jnp.asarray(valid),
                             ANCHORS, STRIDES, YoloHyp(), NC)
    assert np.isfinite(float(total))
    assert float(items["box"]) == 0.0 and float(items["cls"]) == 0.0
    assert float(items["obj"]) > 0.0


def test_hyp_scaling_matches_reference_formulas():
    h = scale_hyp(YoloHyp(), nl=3, nc=80, imgsz=640)
    assert h.box == pytest.approx(0.05)
    assert h.cls == pytest.approx(0.5)
    assert h.obj == pytest.approx(1.0)
    h2 = scale_hyp(YoloHyp(), nl=3, nc=4, imgsz=320)
    assert h2.cls == pytest.approx(0.5 * 4 / 80)
    assert h2.obj == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# segmentation criterion (utils/segment/loss.py, non-overlap mode)
# ---------------------------------------------------------------------------

NM = 8


def _build_targets_seg_t(pshapes, rows, anchors_grid, anchor_t):
    """segment/loss.py build_targets :118-190 (overlap=False): the
    detection assignment plus per-candidate target index and
    normalized xywh."""
    na, nt = 3, rows.shape[0]
    tcls, tbox, indices, anch, tidxs, xywhn = [], [], [], [], [], []
    gain = torch.ones(8)
    ai = torch.arange(na).float().view(na, 1).repeat(1, nt)
    ti = torch.arange(nt).float().view(1, nt).repeat(na, 1)
    t_all = torch.cat((rows.repeat(na, 1, 1), ai[..., None], ti[..., None]), 2)
    g = 0.5
    off = torch.tensor([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]]).float() * g
    for i in range(len(pshapes)):
        anchors, shape = anchors_grid[i], pshapes[i]
        gain[2:6] = torch.tensor(shape)[[3, 2, 3, 2]].float()
        t = t_all * gain
        if nt:
            r = t[..., 4:6] / anchors[:, None]
            j = torch.max(r, 1 / r).max(2)[0] < anchor_t
            t = t[j]
            gxy = t[:, 2:4]
            gxi = gain[[2, 3]] - gxy
            j, k = ((gxy % 1 < g) & (gxy > 1)).T
            l, m = ((gxi % 1 < g) & (gxi > 1)).T
            j = torch.stack((torch.ones_like(j), j, k, l, m))
            t = t.repeat((5, 1, 1))[j]
            offsets = (torch.zeros_like(gxy)[None] + off[:, None])[j]
        else:
            t = t_all[0]
            offsets = 0
        bc, gxy, gwh, at = t.chunk(4, 1)
        (a, tidx), (b, c) = at.long().T, bc.long().T
        gij = (gxy - offsets).long()
        gi, gj = gij.T
        indices.append((b, a, gj.clamp_(0, shape[2] - 1),
                        gi.clamp_(0, shape[3] - 1)))
        tbox.append(torch.cat((gxy - gij, gwh), 1))
        anch.append(anchors[a])
        tcls.append(c)
        tidxs.append(tidx)
        xywhn.append(torch.cat((gxy, gwh), 1) / gain[2:6])
    return tcls, tbox, indices, anch, tidxs, xywhn


def _crop_mask_t(masks, boxes):
    """segment/general.py crop_mask :7-22."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = torch.chunk(boxes[:, :, None], 4, 1)
    r = torch.arange(w, dtype=x1.dtype)[None, None, :]
    c = torch.arange(h, dtype=x1.dtype)[None, :, None]
    return masks * ((r >= x1) * (r < x2) * (c >= y1) * (c < y2))


def _single_mask_loss_t(gt_mask, pred, proto, xyxy, area):
    """segment/loss.py single_mask_loss :112-116."""
    nm = proto.shape[0]
    pred_mask = (pred @ proto.view(nm, -1)).view(-1, *proto.shape[1:])
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        pred_mask, gt_mask, reduction="none")
    return (_crop_mask_t(loss, xyxy).mean(dim=(1, 2)) / area).mean()


def _seg_loss_t(preds, proto, rows, masks, hyp, nc, nm):
    """segment/loss.py ComputeLoss.__call__ :44-110, overlap=False.
    preds: list of (B, na, H, W, 5+nc+nm); proto (B, nm, h, w);
    masks (nt, h, w) one GT mask per target row, proto resolution."""
    anchors_grid = [torch.tensor(a, dtype=torch.float32) / s
                    for a, s in zip(ANCHORS, STRIDES)]
    cp, cn = smooth_bce(hyp.label_smoothing)
    balance = [4.0, 1.0, 0.4]
    bs, _, mask_h, mask_w = proto.shape
    lcls = torch.zeros(1)
    lbox = torch.zeros(1)
    lobj = torch.zeros(1)
    lseg = torch.zeros(1)
    tcls, tbox, indices, anchors, tidxs, xywhn = _build_targets_seg_t(
        [p.shape for p in preds], rows, anchors_grid, hyp.anchor_t)
    bce_c = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([hyp.cls_pw]))
    bce_o = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([hyp.obj_pw]))
    for i, pi in enumerate(preds):
        b, a, gj, gi = indices[i]
        tobj = torch.zeros(pi.shape[:4], dtype=pi.dtype)
        n = b.shape[0]
        if n:
            pxy, pwh, _, pcls, pmask = pi[b, a, gj, gi].split(
                (2, 2, 1, nc, nm), 1)
            pxy = pxy.sigmoid() * 2 - 0.5
            pwh = (pwh.sigmoid() * 2) ** 2 * anchors[i]
            pbox = torch.cat((pxy, pwh), 1)
            iou = _ciou_t(pbox, tbox[i]).squeeze()
            lbox += (1.0 - iou).mean()
            tobj[b, a, gj, gi] = iou.detach().clamp(0).type(tobj.dtype)
            if nc > 1:
                t = torch.full_like(pcls, cn)
                t[range(n), tcls[i]] = cp
                lcls += bce_c(pcls, t)
            marea = xywhn[i][:, 2:].prod(1)
            sc = torch.tensor([mask_w, mask_h, mask_w, mask_h]).float()
            mxy = xywhn[i] * sc
            mxyxy = torch.cat([mxy[:, :2] - mxy[:, 2:] / 2,
                               mxy[:, :2] + mxy[:, 2:] / 2], 1)
            for bi in b.unique():
                j = b == bi
                mask_gti = masks[tidxs[i]][j]
                lseg += _single_mask_loss_t(mask_gti, pmask[j], proto[bi],
                                            mxyxy[j], marea[j])
        lobj += bce_o(pi[..., 4], tobj) * balance[i]
    lbox *= hyp.box
    lobj *= hyp.obj
    lcls *= hyp.cls
    lseg *= hyp.box / bs
    return ((lbox + lobj + lcls + lseg) * bs,
            dict(box=lbox.item(), obj=lobj.item(), cls=lcls.item(),
                 seg=lseg.item()))


def _seg_fixture(seed=3):
    rng = np.random.RandomState(seed)
    B = 2
    grids = [(IMG // s, IMG // s) for s in STRIDES]
    raw = [rng.randn(B, h, w, 3 * (5 + NC + NM)).astype(np.float32) * 0.5
           for (h, w) in grids]
    proto = (rng.randn(B, IMG // 4, IMG // 4, NM) * 0.5).astype(np.float32)
    targets = np.zeros((B, 3, 5), np.float32)
    targets[0, 0] = [1, 0.30, 0.40, 0.20, 0.30]
    targets[0, 1] = [3, 0.72, 0.61, 0.40, 0.35]
    targets[1, 0] = [0, 0.22, 0.68, 0.30, 0.20]
    valid = np.zeros((B, 3), bool)
    valid[0, :2] = True
    valid[1, 0] = True
    gt_masks = (rng.rand(B, 3, IMG // 4, IMG // 4) > 0.5).astype(np.float32)
    return raw, proto, targets, valid, gt_masks


def _torch_seg_preds(raw):
    return [torch.tensor(r).reshape(r.shape[0], r.shape[1], r.shape[2],
                                    3, 5 + NC + NM).permute(0, 3, 1, 2, 4)
            for r in raw]


def test_seg_loss_matches_torch():
    from cross_modal_video_engine_tpu.losses.yolo import yolo_seg_loss
    raw, proto, targets, valid, gt_masks = _seg_fixture()
    hyp = scale_hyp(YoloHyp(), nl=3, nc=NC, imgsz=IMG)
    total, items = yolo_seg_loss(
        [jnp.asarray(r) for r in raw], jnp.asarray(proto),
        jnp.asarray(targets), jnp.asarray(valid), jnp.asarray(gt_masks),
        ANCHORS, STRIDES, hyp, NC, nm=NM, mask_cap=64)
    rows = _torch_rows(targets, valid)
    masks_rows = torch.tensor(np.stack(
        [gt_masks[b, t] for b in range(2) for t in range(3) if valid[b, t]]))
    ref_total, ref_items = _seg_loss_t(
        _torch_seg_preds(raw), torch.tensor(proto).permute(0, 3, 1, 2),
        rows, masks_rows, hyp, NC, NM)
    assert int(items["seg_dropped"]) == 0
    assert np.allclose(float(total), ref_total.item(), atol=1e-4)
    for k in ("box", "obj", "cls", "seg"):
        assert np.allclose(float(items[k]), ref_items[k], atol=1e-5), k


def test_seg_loss_cap_drops_counted():
    """mask_cap smaller than the positive count: the overflow is
    reported in seg_dropped and the loss stays finite."""
    from cross_modal_video_engine_tpu.losses.yolo import yolo_seg_loss
    raw, proto, targets, valid, gt_masks = _seg_fixture()
    total, items = yolo_seg_loss(
        [jnp.asarray(r) for r in raw], jnp.asarray(proto),
        jnp.asarray(targets), jnp.asarray(valid), jnp.asarray(gt_masks),
        ANCHORS, STRIDES, scale_hyp(YoloHyp(), nl=3, nc=NC, imgsz=IMG),
        NC, nm=NM, mask_cap=2)
    assert int(items["seg_dropped"]) > 0
    assert np.isfinite(float(total))
