# TANet-R50 (reference configs/recognition/tanet/
# tanet_r50_dense_1x1x8_100e_kinetics400_rgb.py: dense 1x1x8 sampling
# from a 64-frame window, TSNHead consensus over 8 segments).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='TANet', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        # dense 1x1x8: one frame per segment of a random 64-frame
        # window; MergeClips folds the 8 segments into the temporal axis
        dict(type='DenseSampleFrames', clip_len=1, frame_interval=1,
             num_clips=8, sample_range=64),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
        dict(type='MergeClips'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
