# VideoMAE ViT-B + RNN decoder label-sequence generation (reference
# configs/seq_generate/videomae/cav_videomae_B_16x5x3_contact_rgb.py:
# RNNDecoderHead in_channels=768, 16-frame tubelet-2 sampling).
_base_ = ['./x3d_relseq.py']
model = dict(
    backbone=dict(_delete_=True, type='VideoMAEViT', num_frames=16,
                  img_size=224, patch_size=16, tubelet_size=2,
                  embed_dims=768, num_heads=12, num_layers=12),
    decoder=dict(in_channels=768))
