# TRN-R50 1x1x8 on Something-Something v1 (reference
# configs/recognition/trn/trn_r50_1x1x8_50e_sthv1_rgb.py: plain ResNet50
# per-frame + TRNMultiScale relation head, SGD lr 0.002 / 50 epochs).
_base_ = ['../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='TSN', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    head=dict(type='TRNHead', num_segments=8, hidden_dim=256,
              bottleneck_dim=256, dropout_ratio=0.8,
              relation_type='TRNMultiScale'),
    num_classes=174)
data = dict(
    train=dict(ann_file='data/sthv1/train_list.txt',
               data_prefix='data/sthv1/videos'),
    val=dict(ann_file='data/sthv1/val_list.txt',
             data_prefix='data/sthv1/videos'),
    pipeline=[
        dict(type='DecordInit'),
        # the reference 1x1x8 segment protocol (one frame per uniform
        # segment), folded into the temporal axis by MergeClips
        dict(type='SampleFrames', clip_len=1, frame_interval=1,
             num_clips=8),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
        dict(type='MergeClips'),
    ],
    videos_per_gpu=16)
optimizer = dict(optimizer='sgd', learning_rate=0.002, momentum=0.9,
                 weight_decay=5e-4, grad_clip=40.0)
total_epochs = 50
