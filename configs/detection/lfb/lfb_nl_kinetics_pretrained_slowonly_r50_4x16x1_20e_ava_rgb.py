# SlowOnly-R50 + FBONonLocal long-term feature bank (reference
# configs/detection/lfb/lfb_nl_kinetics_pretrained_slowonly_r50_4x16x1_20e_ava_rgb.py:
# FBOHead(lfb window_size=60, max_num_sampled_feat=5,
# fbo=non_local latent 512, 2 layers), bbox head in_channels doubles to
# 2048+512 after the concat).
_base_ = ['../ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py']
model = dict(
    # the reference LFB base is slowonly_r50_nl: non-local blocks after
    # flagged bottlenecks (_base_/models/slowonly_r50_nl.py non_local)
    backbone=dict(non_local=[[0, 0, 0], [1, 0, 1, 0],
                             [1, 0, 1, 0, 1, 0], [0, 0, 0]]),
    shared_head=dict(type='FBO', fbo_type='non_local',
                     latent_channels=512, num_non_local_layers=2),
    lfb=dict(path=None, window_size=60, capacity=5))
