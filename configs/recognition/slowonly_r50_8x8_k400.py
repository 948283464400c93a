# SlowOnly-R50 8x8 (reference configs/recognition/slowonly/
# slowonly_r50_8x8x1_256e_kinetics400_rgb.py)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='ResNet3D', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3]),
    num_classes=400)
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0, warmup_steps=500)
total_epochs = 256
