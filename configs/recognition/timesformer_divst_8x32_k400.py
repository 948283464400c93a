# TimeSformer divided space-time 8x32x1 (reference
# configs/recognition/timesformer/timesformer_divST_8x32x1_15e_kinetics400_rgb.py)
_base_ = ['../_base_/default_runtime.py', '../_base_/kinetics_video.py']
model = dict(
    backbone=dict(type='TimeSformer', num_frames=8, img_size=224,
                  patch_size=16, embed_dims=768, num_heads=12,
                  num_layers=12, attention_type='divided_space_time'),
    num_classes=400)
optimizer = dict(optimizer='sgd', learning_rate=0.005, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 15
