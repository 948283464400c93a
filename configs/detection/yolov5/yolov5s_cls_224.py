# YOLOv5s-cls classification recipe (reference MCT/yolov5/classify/
# train.py defaults: yolov5s backbone + Classify head, img 224,
# lr0 0.001 with the linear per-epoch schedule to lr0*lrf, label
# smoothing 0.1, decay 5e-5, EMA; fitness = top-1 accuracy).
# Dataset: ImageFolder layout root/{train,val}/<class>/*.jpg.
model = dict(num_classes=1000, depth_multiple=0.33, width_multiple=0.50,
             img_size=224)
data = dict(train_dir='data/imagenet/train', val_dir='data/imagenet/val',
            batch_size=64)
aug = dict(fliplr=0.5)
optimizer = dict(lr0=0.001)
lrf = 0.01
weight_decay = 5e-5
label_smoothing = 0.1
bf16 = True
total_epochs = 90
eval_interval = 1
