# X3D-M + RNN decoder label-sequence generation (reference
# configs/seq_generate/x3d/cav_x3d_m_16x5x1_facebook_contact_rgb.py:
# RNNDecoderHead in_channels=432, 16x2 sampling).
_base_ = ['./i3d_relseq.py']
model = dict(
    backbone=dict(_delete_=True, type='X3D',
                  stage_blocks=[3, 5, 11, 7],
                  stage_channels=[24, 48, 96, 192], feat_dim=432),
    decoder=dict(in_channels=432))
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=16, frame_interval=2,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
