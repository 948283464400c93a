# X3D-M (reference configs/recognition/x3d/x3d_m_16x5x1_facebook_kinetics400_rgb.py)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='X3D', stage_blocks=[3, 5, 11, 7],
                  stage_channels=[24, 48, 96, 192], expansion=2.25,
                  feat_dim=432),
    num_classes=400)
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=5e-5, grad_clip=40.0)
total_epochs = 300
