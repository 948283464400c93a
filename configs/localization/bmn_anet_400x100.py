# BMN over ActivityNet features (reference
# configs/localization/bmn/bmn_400x100_2x8_9e_activitynet_feature.py)
_base_ = ['../_base_/default_runtime.py']
model = dict(type='BMN', feat_dim=400, temporal_dim=100,
             max_duration=100)
data = dict(
    train=dict(ann_file='data/ActivityNet/anet_train.json',
               feature_prefix='data/ActivityNet/features'),
    val=dict(ann_file='data/ActivityNet/anet_val.json',
             feature_prefix='data/ActivityNet/features'),
    videos_per_gpu=8)
optimizer = dict(optimizer='adamw', learning_rate=1e-3)
total_epochs = 9
