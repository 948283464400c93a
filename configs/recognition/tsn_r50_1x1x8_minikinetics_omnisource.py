# OmniSource joint training: TSN-R50 on mini-Kinetics + web auxiliary
# sources (reference configs/recognition/omnisource/
# tsn_r50_1x1x8_100e_minikinetics/*_omnisource_rgb.py: `omnisource =
# True`, apis/train.py train_ratio alternation over googleimage /
# webimage / insvideo / kineticsraw sources).  Aux sources here are
# video lists; image-source recipes repeat stills into clips at prep
# time (data_tools build_file_list).
_base_ = ['../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='TSN', stage_blocks=[3, 4, 6, 3],
                  base_channels=64),
    num_classes=200)
data = dict(
    train=dict(ann_file='data/omnisource/k200_train.txt',
               data_prefix='data/omnisource/k200_train'),
    val=dict(ann_file='data/omnisource/k200_val.txt',
             data_prefix='data/omnisource/k200_val'),
    pipeline=[
        dict(type='DecordInit'),
        # the reference 1x1x8 segment protocol (one frame per uniform
        # segment), folded into the temporal axis by MergeClips
        dict(type='SampleFrames', clip_len=1, frame_interval=1,
             num_clips=8),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
        dict(type='MergeClips'),
    ],
    videos_per_gpu=8)
# 2 main steps per aux wave, 1 batch per aux source per wave
# (the reference's train_ratio=[2, 1, 1])
omnisource = dict(
    train_ratio=[2, 1, 1],
    aux=[
        dict(ann_file='data/omnisource/webimage_200.txt',
             data_prefix='data/omnisource/web'),
        dict(ann_file='data/omnisource/insvideo_200.txt',
             data_prefix='data/omnisource/insvideo_200'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
