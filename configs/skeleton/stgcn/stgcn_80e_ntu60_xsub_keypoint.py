# ST-GCN on NTU60-XSub 2D keypoints (reference configs/skeleton/stgcn/
# stgcn_80e_ntu60_xsub_keypoint.py: STGCN in_channels=3, graph
# 'coco', SGD lr 0.1 / 80 epochs, bs 16x2).
_base_ = ['../../_base_/default_runtime.py']
model = dict(
    backbone=dict(type='STGCN', num_joints=17, in_channels=3,
                  layout='coco'),
    num_classes=60)
data = dict(
    train=dict(ann_file='data/posec3d/ntu60_xsub_train.pkl'),
    val=dict(ann_file='data/posec3d/ntu60_xsub_val.pkl'),
    clip_len=100, batch_size=16, stream='joint',
    num_persons=2)   # NTU two-person clips, STGCNHead num_person=2
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 80
