# CLIP ViT-B/32 mean-pooling recognizer (reference configs/recognition/
# clip/clip_mean_pooling_8x32x1_15e_video_kinetics400_rgb.py:
# Recognizer3D_CLIP — frame features from the CLIP vision tower,
# time-mean pooled, linear head; import tower weights with
# `convert clip` before training).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='CLIP', embed_dim=512, image_resolution=224,
                  vision_width=768, vision_layers=12, vision_heads=12,
                  patch_size=32),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=8, frame_interval=32,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[127.5] * 3, std=[127.5] * 3),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 15
