# TPN-SlowOnly-R50 8x8 (reference configs/recognition/tpn/
# tpn_slowonly_r50_8x8x1_150e_kinetics_rgb.py over
# _base_/models/tpn_slowonly_r50.py: out_indices (2, 3) -> TPN neck
# in_channels (1024, 2048), temporal scales (8, 8), aux head weight 0.5).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='ResNet3D', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3]),
    neck=dict(type='TPN', in_channels=[1024, 2048], out_channels=1024,
              mid_channels=1024, lf_out_channels=2048,
              fusion_channels=2048, downsample_scales=[8, 8],
              aux_loss_weight=0.5),
    num_classes=400)
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0, warmup_steps=500)
total_epochs = 150
