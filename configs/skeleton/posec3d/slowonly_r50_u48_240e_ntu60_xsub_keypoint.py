# PoseC3D: SlowOnly-R50 over GeneratePoseTarget keypoint pseudo-heatmaps
# (reference configs/skeleton/posec3d/slowonly_r50_u48_240e_ntu60_xsub_
# keypoint.py: heatmap input 17 channels, sigma 0.6, 56x56, uniform-48
# clips, SGD lr 0.2 / 240 epochs).
_base_ = ['../../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='PoseC3D', stage_blocks=[4, 6, 3],
                  base_channels=32, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 3, 3],
                  stage_spatial_strides=[1, 2, 2]),
    num_classes=60)
data = dict(
    train=dict(ann_file='data/posec3d/ntu60_xsub_train.pkl'),
    val=dict(ann_file='data/posec3d/ntu60_xsub_val.pkl'),
    clip_len=48, batch_size=8, stream='joint',
    heatmap=dict(sigma=0.6, img_shape=[56, 56], use_score=True,
                 with_kp=True, with_limb=False))
optimizer = dict(optimizer='sgd', learning_rate=0.2, momentum=0.9,
                 weight_decay=3e-4, grad_clip=40.0, warmup_steps=500)
total_epochs = 240
