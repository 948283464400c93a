# SSN over THUMOS14 snippet features (reference configs/localization/
# ssn/ssn_r50_450e_thumos14_rgb_train.py: 20 classes, sampler 1 pos /
# 6 incomplete / 1 background per video with iou thresholds 0.7 /
# 0.3 / 0.01 and background coverage 0.02, STPP stages (1, 1, 1) ->
# parts here, comp/reg loss weights 0.1, SGD lr 0.001 momentum 0.9,
# 450 epochs).  The TPU route pools precomputed snippet features with
# host-built STPP matrices (models/ssn.py) instead of re-running the
# R50 backbone per proposal crop — exact structured-loss math,
# MXU-shaped compute.
_base_ = ['../_base_/default_runtime.py']
model = dict(type='SSN', temporal_dim=100, feat_dim=400,
             num_classes=20, parts=[1, 2, 1], hidden=256)
sampler = dict(positive_per_video=1, incomplete_per_video=6,
               background_per_video=1, positive_iou=0.7,
               background_iou=0.01, incomplete_iou=0.3,
               incomplete_overlap=0.01, background_coverage=0.02)
ssn = dict(comp_loss_weight=0.1, reg_loss_weight=0.1)
data = dict(
    train=dict(ann_file='data/thumos14/thumos14_tag_val_proposal_list.txt',
               feature_prefix='data/thumos14/features'),
    val=dict(ann_file='data/thumos14/thumos14_tag_test_proposal_list.txt',
             feature_prefix='data/thumos14/features'),
    videos_per_gpu=1)
optimizer = dict(optimizer='sgd', learning_rate=0.001, momentum=0.9,
                 weight_decay=1e-6)
total_epochs = 450
batch_size = 4
