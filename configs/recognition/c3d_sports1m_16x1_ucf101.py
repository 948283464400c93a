# C3D (sports1m-pretrained recipe shape) 16x1x1 on UCF-101 (reference
# configs/recognition/c3d/c3d_sports1m_16x1x1_45e_ucf101_rgb.py:
# 112x112 crops, SGD lr 0.001 / 45 epochs).
_base_ = ['../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='C3D', fc_dim=4096),
    num_classes=101)
data = dict(
    train=dict(ann_file='data/ucf101/train_list.txt',
               data_prefix='data/ucf101/videos'),
    val=dict(ann_file='data/ucf101/val_list.txt',
             data_prefix='data/ucf101/videos'),
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=16, frame_interval=1,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 128)),
        dict(type='CenterCrop', crop_size=112),
        dict(type='Normalize', mean=[104.0, 117.0, 128.0],
             std=[1.0, 1.0, 1.0]),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=8)
optimizer = dict(optimizer='sgd', learning_rate=0.001, momentum=0.9,
                 weight_decay=5e-4, grad_clip=40.0)
total_epochs = 45
