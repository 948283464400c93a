# TimeSformer + RNN decoder label-sequence generation (reference
# configs/seq_generate/timesformer_*; trains with cli/caption_train)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(num_frames=8, img_size=224, patch_size=16,
                  embed_dims=768, num_heads=12, num_layers=12,
                  attention_type='divided_space_time'),
    decoder=dict(num_classes=36, in_channels=768, max_len=5,
                 threshold=0.5))
data = dict(
    train=dict(ann_file='data/relseq/train_relseq.txt',
               data_prefix='data/relseq/videos'),
    val=dict(ann_file='data/relseq/val_relseq.txt',
             data_prefix='data/relseq/videos'))
optimizer = dict(optimizer='sgd', learning_rate=0.005, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 15
