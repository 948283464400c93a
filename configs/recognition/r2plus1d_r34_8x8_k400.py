# R(2+1)D-34 8x8x1 (reference configs/recognition/r2plus1d/
# r2plus1d_r34_8x8x1_180e_kinetics400_rgb.py: factorized conv ResNet34,
# SGD lr 0.1 cosine / 180 epochs).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='R2Plus1D', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=8, frame_interval=8,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 180
