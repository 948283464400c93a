# MViT-S (reference configs/recognition/mvit)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='MViT', embed_dim=96, depths=[1, 2, 11, 2],
                  num_heads=[1, 2, 4, 8], patch_size=[2, 4, 4]),
    num_classes=400)
optimizer = dict(optimizer='adamw', learning_rate=1e-3,
                 weight_decay=0.05, grad_clip=40.0, warmup_steps=1000)
total_epochs = 100
