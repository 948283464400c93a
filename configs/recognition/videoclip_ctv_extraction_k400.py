# VideoCLIP pooled-feature recognizer (reference configs/recognition/
# videoclip/ctv_extraction.py: Recognizer3D over the frozen VideoCLIP
# video encoder; the reference wraps the un-vendored fairseq MMPT
# package — this recipe drives the in-tree TPU rebuild, models/
# videoclip.py).  Also the backbone recipe for CTV extraction via
# cli/ctv_build.py.
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='VideoCLIP', fps=4, s3d_channels=64, width=256,
                  layers=4, heads=4),
    num_classes=400)
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=32, frame_interval=2,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[127.5] * 3, std=[127.5] * 3),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
optimizer = dict(optimizer='sgd', learning_rate=0.005, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 15
