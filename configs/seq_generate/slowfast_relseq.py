# SlowFast-R50 + RNN decoder label-sequence generation (reference
# configs/seq_generate/slowfast/cav_slowfast_r50_contact.py:
# RNNDecoderHead in_channels=2304 = slow 2048 + fast 256).
_base_ = ['./i3d_relseq.py']
model = dict(
    backbone=dict(_delete_=True, type='SlowFast',
                  depth_blocks=[3, 4, 6, 3], alpha=4, beta_inv=8),
    decoder=dict(in_channels=2304))
