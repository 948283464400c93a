# BSN stage 3: Proposal Evaluation Module over PGM artifacts
# (reference configs/localization/bsn/
# bsn_pem_400x100_1x16_20e_activitynet_feature.py + _base_/models/
# bsn_pem.py: pem_feat_dim=32, pem_hidden_dim=256, u ratios 1/2, iou
# thresholds 0.6/0.2, soft-NMS alpha 0.75, top-100 post-processing;
# _base_/schedules/adam_20e.py: Adam lr 0.01 wd 1e-5, 20 epochs,
# 16 videos/gpu).  PGM dirs come from `cli.misc_tools bsn_pgm` run
# over the TEM stage's curves.
_base_ = ['../_base_/default_runtime.py']
model = dict(type='PEM', feat_dim=32, hidden=256, top_k=500,
             u_ratio_m=1.0, u_ratio_l=2.0,
             high_iou_threshold=0.6, low_iou_threshold=0.2,
             soft_nms_alpha=0.75, post_process_top_k=100)
work_dir_base = 'work_dirs/bsn_400x100_anet'
data = dict(
    train=dict(ann_file='data/ActivityNet/anet_train.json',
               pgm_proposals_dir=f'{work_dir_base}/pgm_proposals',
               pgm_features_dir=f'{work_dir_base}/pgm_features'),
    val=dict(ann_file='data/ActivityNet/anet_val.json',
             pgm_proposals_dir=f'{work_dir_base}/pgm_proposals',
             pgm_features_dir=f'{work_dir_base}/pgm_features'),
    videos_per_gpu=16)
optimizer = dict(optimizer='adam', learning_rate=0.01,
                 weight_decay=1e-5)
total_epochs = 20
batch_size = 16
