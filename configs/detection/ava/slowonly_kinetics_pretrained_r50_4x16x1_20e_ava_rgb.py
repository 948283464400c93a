# SlowOnly-R50 4x16 AVA detection (reference configs/detection/ava/
# slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py: FastRCNN with
# ResNet3dSlowOnly spatial_strides=(1,2,2,1) + AVARoIHead output_size=8,
# BBoxHeadAVA num_classes=81 dropout 0.5, MaxIoUAssignerAVA
# pos_iou_thr=0.9, action_thr=0.002, SGD lr 0.2 / 20 epochs).
_base_ = ['../../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='SlowOnly', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3],
                  stage_spatial_strides=[1, 2, 2, 1]),
    roi_head=dict(num_classes=81, in_channels=2048, roi_size=8,
                  sampling_ratio=2, temporal_pool='avg',
                  spatial_pool='max', dropout=0.5),
    train_cfg=dict(pos_iou_thr=0.9, max_boxes=32),
    test_cfg=dict(action_thr=0.002))
data = dict(
    train=dict(ann_file='data/ava/annotations/ava_train_v2.1.csv',
               data_prefix='data/ava/videos',
               proposal_file=None),
    val=dict(ann_file='data/ava/annotations/ava_val_v2.1.csv',
             data_prefix='data/ava/videos'),
    fps=30, timestamp_start=900,
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleAVAFrames', clip_len=4, frame_interval=16),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(256, 256), keep_ratio=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=8)
optimizer = dict(optimizer='sgd', learning_rate=0.2, momentum=0.9,
                 weight_decay=1e-5, grad_clip=40.0, warmup_steps=1000)
total_epochs = 20
