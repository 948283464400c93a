# TIN-R50 1x1x8 on Something-Something v2 (reference configs/recognition/
# tin/tin_r50_1x1x8_40e_sthv2_rgb.py: ResNetTIN shift_div=4 with the
# exact OffsetNet/WeightNet interlace, TSNHead consensus).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='TINExact', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, num_segments=8, shift_div=4),
    num_classes=174)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        # the reference 1x1x8 segment protocol: one frame per uniform
        # video segment; MergeClips folds segments into the trainer's
        # static (B, T=8, H, W, C) temporal axis (the TIN shift axis)
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
    videos_per_gpu=6)
optimizer = dict(optimizer='sgd', learning_rate=0.02, momentum=0.9,
                 weight_decay=5e-4, grad_clip=20.0)
total_epochs = 40
