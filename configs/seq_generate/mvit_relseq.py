# MViT + RNN decoder label-sequence generation (reference
# configs/seq_generate/mvit/mvit_B_32x3_conv_contact_rgb.py:
# RNNDecoderHead in_channels=768 — the final MViT stage width,
# embed_dim 96 doubled across 4 stages).
_base_ = ['./i3d_relseq.py']
model = dict(
    backbone=dict(_delete_=True, type='MViT', embed_dim=96,
                  depths=[1, 2, 11, 2], num_heads=[1, 2, 4, 8]),
    decoder=dict(in_channels=768))
