# I3D-R50 32x2x1 (reference configs/recognition/i3d/
# i3d_r50_32x2x1_100e_kinetics400_rgb.py + _base_/models/i3d_r50.py:
# inflated ResNet3d, conv1 (5,7,7) stride-2 temporal, pool1 stride 2,
# SGD lr 0.01 / 100 epochs).  mmaction inflates alternate blocks;
# this recipe inflates per-stage (temporal kernel 3 at every stage),
# the closest static-config equivalent.
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='ResNet3D', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, conv1_kernel_t=5, conv1_stride_t=2,
                  pool1_stride_t=2,
                  stage_temporal_kernels=[3, 3, 3, 3]),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=32, frame_interval=2,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
