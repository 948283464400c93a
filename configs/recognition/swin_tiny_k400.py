# Video Swin-T (reference configs/recognition/swin/
# swin_tiny_patch244_window877_kinetics400_1k.py)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='Swin3D', embed_dim=96, depths=[2, 2, 6, 2],
                  num_heads=[3, 6, 12, 24], window_size=[8, 7, 7],
                  patch_size=[2, 4, 4]),
    num_classes=400)
optimizer = dict(optimizer='adamw', learning_rate=1e-3,
                 weight_decay=0.05, grad_clip=40.0, warmup_steps=1000)
total_epochs = 30
