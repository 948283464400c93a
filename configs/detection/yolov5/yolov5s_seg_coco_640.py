# YOLOv5s-seg COCO instance-segmentation recipe (reference
# MCT/yolov5/segment/train.py defaults: models/segment/yolov5s-seg.yaml
# = yolov5s + Segment head with nm=32 mask coefficients / npr=256
# prototypes, img 640, --mask-ratio 4, hyp.scratch-low.yaml).
# Labels are yolov5-seg polygon rows: `cls x1 y1 x2 y2 ...` normalized.
_base_ = 'yolov5s_coco_640.py'
model = dict(masks=32, protos=256)
data = dict(mask_ratio=4)
loss = dict(box=0.05, cls=0.5, obj=1.0)   # + seg gain fixed inside
loss_mask_cap = 128     # static per-step mask budget (overlap cap)
