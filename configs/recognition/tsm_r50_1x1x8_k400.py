# TSM-R50 1x1x8 (reference configs/recognition/tsm/
# tsm_r50_1x1x8_50e_kinetics400_rgb.py: ResNetTSM shift_div=8, TSNHead
# consensus over 8 segments, SGD lr 0.01 / 50 epochs).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='TSM', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, shift_div=8),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        # the reference 1x1x8 segment protocol: one frame per uniform
        # video segment; MergeClips folds the 8 segments into the
        # trainer's static (B, T=8, H, W, C) temporal axis, which is
        # exactly the shift axis ResNetTSM expects (num_segments=8)
        dict(type='SampleFrames', clip_len=1, frame_interval=1,
             num_clips=8),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
        dict(type='MergeClips'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=20.0)
total_epochs = 50
