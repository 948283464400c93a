# Kinetics-style video dataset skeleton.  Point ann_file/data_prefix at
# your split lists (`filename label` lines; build with
# `data_tools build_file_list`).
data = dict(
    train=dict(ann_file='data/kinetics400/train_list.txt',
               data_prefix='data/kinetics400/videos_train'),
    val=dict(ann_file='data/kinetics400/val_list.txt',
             data_prefix='data/kinetics400/videos_val'),
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=8, frame_interval=8,
             num_clips=1, test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[127.5] * 3, std=[127.5] * 3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=8)
