# I3D-R50 + RNN decoder label-sequence generation (reference
# configs/seq_generate/i3d/cav_i3d_r50_32x2x1_100e_contact_rgb.py:
# ResNet3d 32x2x1 backbone, RNNDecoderHead in_channels=2048;
# trains with cli/caption_train).
_base_ = ['./timesformer_relseq.py']
model = dict(
    backbone=dict(_delete_=True, type='ResNet3D',
                  stage_blocks=[3, 4, 6, 3], base_channels=64,
                  conv1_kernel_t=5, conv1_stride_t=2, pool1_stride_t=2,
                  stage_temporal_kernels=[3, 3, 3, 3]),
    decoder=dict(in_channels=2048))
data = dict(
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=32, frame_interval=1,
             num_clips=1),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(-1, 256)),
        dict(type='CenterCrop', crop_size=224),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type='FormatShape', input_format='NTHWC'),
    ])
