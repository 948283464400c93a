# BSN stage 1: Temporal Evaluation Module over ActivityNet features
# (reference configs/localization/bsn/
# bsn_tem_400x100_1x16_20e_activitynet_feature.py + _base_/models/
# bsn_tem.py: tem_feat_dim=400, tem_hidden_dim=512, Adam lr 0.001
# wd 1e-4, 20 epochs, 16 videos/gpu).  Stage 2 (PGM) runs via
# `cli.misc_tools bsn_pgm`; stage 3 via bsn_pem_400x100_anet.py.
_base_ = ['../_base_/default_runtime.py']
model = dict(type='TEM', temporal_dim=100, feat_dim=400, hidden=512)
data = dict(
    train=dict(ann_file='data/ActivityNet/anet_train.json',
               feature_prefix='data/ActivityNet/features'),
    val=dict(ann_file='data/ActivityNet/anet_val.json',
             feature_prefix='data/ActivityNet/features'),
    videos_per_gpu=16)
optimizer = dict(optimizer='adam', learning_rate=0.001,
                 weight_decay=1e-4)
total_epochs = 20
batch_size = 16
