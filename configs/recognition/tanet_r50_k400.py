# TANet-R50 (reference configs/recognition/tanet)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='TANet', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    num_classes=400)
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
