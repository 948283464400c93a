# TSM-R50 (per-frame backbone) + RNN decoder label-sequence generation.
# Exercises the temporal-mean adapter path in cli/caption_train.py:
# (B, T, C) per-frame features are mean-pooled to the (B, C) encoder
# feature the RNNDecoderHead consumes (the reference's CNN encoder_type
# pooling, seq_generate configs loss_cls=BCELoss_seq).
_base_ = ['./timesformer_relseq.py']
model = dict(
    backbone=dict(_delete_=True, type='TSM',
                  stage_blocks=[3, 4, 6, 3], base_channels=64,
                  shift_div=8),
    decoder=dict(in_channels=2048))
