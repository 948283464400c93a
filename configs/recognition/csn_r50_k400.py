# ir-CSN-R50 (reference configs/recognition/csn)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='CSN', stage_blocks=[3, 4, 6, 3],
                  base_channels=64, mode='ir'),
    num_classes=400)
optimizer = dict(optimizer='sgd', learning_rate=0.08, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 180
