# TSN-R50 1x1x3 (reference configs/recognition/tsn/
# tsn_r50_1x1x3_100e_kinetics400_rgb.py: plain ResNet50 per-frame,
# TSNHead mean consensus over 3 segments, SGD lr 0.01 / 100 epochs).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='TSN', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        # the reference 1x1x3 segment protocol: one frame per uniform
        # video segment; MergeClips folds the 3 segments into the
        # trainer's static (B, T=3, H, W, C) temporal axis
        dict(type='SampleFrames', clip_len=1, frame_interval=1,
             num_clips=3),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
        dict(type='MergeClips'),
    ],
    videos_per_gpu=32)
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
