# VideoMAE ViT-B 16x4x1 fine-tune (reference configs/recognition/
# videomae/videomae_B_16x5x3_kinetics400_rgb.py: ViT-B/16 tubelet-2
# encoder, SGD lr 0.005 / 15 epochs).
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='VideoMAEViT', num_frames=16, img_size=224,
                  patch_size=16, tubelet_size=2, embed_dims=768,
                  num_heads=12, num_layers=12),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=16, frame_interval=4,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.005, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 15
