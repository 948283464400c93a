# SlowFast-R50 4x16 AVA detection (reference configs/detection/ava/
# slowfast_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py: dual-pathway
# ResNet3dSlowFast, RoI head in_channels 2304 = 2048 slow + 256 fast,
# with_temporal_pool=True pools each pathway before the channel concat).
_base_ = ['./slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py']
model = dict(
    backbone=dict(_delete_=True, type='SlowFast',
                  depth_blocks=[3, 4, 6, 3], alpha=8, beta_inv=8,
                  base_channels=64,
                  # AVA keeps the last stage unstrided for stride-16
                  # RoI maps (reference spatial_strides=(1, 2, 2, 1))
                  spatial_strides=[1, 2, 2, 1]),
    roi_head=dict(num_classes=81, in_channels=2304, roi_size=8,
                  sampling_ratio=2, temporal_pool='avg',
                  spatial_pool='max', dropout=0.5))
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleAVAFrames', clip_len=32, frame_interval=2),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(256, 256), keep_ratio=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
