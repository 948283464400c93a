# SlowFast-R50 4x16 (reference configs/recognition/slowfast/
# slowfast_r50_4x16x1_256e_kinetics400_rgb.py)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='SlowFast', depth_blocks=[3, 4, 6, 3], alpha=8,
                  beta_inv=8, base_channels=64, lateral_kernel_t=5,
                  # exact-math space-to-depth fast stem (ops/s2d_stem.py):
                  # same params/outputs/grads, measured +6.3% step
                  # throughput on chip (BENCH_PROFILE_r4, docs/PERF.md)
                  fast_s2d_stem=True),
    num_classes=400)
data = dict(pipeline=[
    dict(type='DecordInit'),
    dict(type='SampleFrames', clip_len=32, frame_interval=2, num_clips=1,
         test_mode=True),
    dict(type='DecordDecode'),
    dict(type='Resize', scale=(-1, 256)),
    dict(type='CenterCrop', crop_size=224),
    dict(type='Normalize', mean=[127.5] * 3, std=[127.5] * 3),
    dict(type='FormatShape', input_format='NTHWC'),
])
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0, warmup_steps=500)
total_epochs = 256
