# YOLOv5s COCO training recipe (reference MCT/yolov5/train.py defaults:
# models/yolov5s.yaml depth 0.33 / width 0.50, img 640, SGD lr0 0.01
# one-cycle to lr0*lrf, hyp.scratch-low.yaml loss gains, EMA 0.9999).
# Dataset is yolov5 directory format: images/ + labels/*.txt with
# normalized `cls cx cy w h` rows.
model = dict(num_classes=80, depth_multiple=0.33, width_multiple=0.50,
             img_size=640)
data = dict(
    train=dict(img_dir='data/coco/images/train2017',
               label_dir='data/coco/labels/train2017'),
    val=dict(img_dir='data/coco/images/val2017',
             label_dir='data/coco/labels/val2017'),
    batch_size=16, max_targets=128)
aug = dict(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0.0, translate=0.1,
           scale=0.5, shear=0.0, perspective=0.0, flipud=0.0, fliplr=0.5,
           mosaic=1.0, mixup=0.0)
optimizer = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
                 warmup_epochs=3.0, warmup_momentum=0.8,
                 warmup_bias_lr=0.1, cos_lr=False)
loss = dict(box=0.05, cls=0.5, obj=1.0, cls_pw=1.0, obj_pw=1.0,
            anchor_t=4.0, label_smoothing=0.0)
bf16 = True       # mixed-precision step (the reference's amp autocast)
total_epochs = 300
eval_interval = 1
