# 2s-AGCN joint stream on NTU60-XSub (reference configs/skeleton/2s-agcn/
# 2sagcn_80e_ntu60_xsub_keypoint_3d.py); run again with
# --cfg-options data.stream=bone for the bone stream, then late-fuse
# the two models' scores (the reference's two-stream recipe).
_base_ = ['../../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='AGCN', num_joints=25, in_channels=3,
                  layout='ntu-rgb+d'),
    num_classes=60)
data = dict(
    train=dict(ann_file='data/posec3d/ntu60_xsub_train.pkl'),
    val=dict(ann_file='data/posec3d/ntu60_xsub_val.pkl'),
    clip_len=100, batch_size=16, stream='joint',
    num_persons=2)   # NTU two-person clips, STGCNHead num_person=2
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 80
