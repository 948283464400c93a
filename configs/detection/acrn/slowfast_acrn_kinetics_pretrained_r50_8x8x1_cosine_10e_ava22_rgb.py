# SlowOnly + ACRN actor-centric relation head (reference
# configs/detection/acrn/slowfast_acrn_kinetics_pretrained_r50_8x8x1_cosine_10e_ava22_rgb.py:
# shared_head=ACRNHead(in_channels=4608, out_channels=2304); here the
# single-pathway SlowOnly variant keeps the recipe runnable without the
# dual-path feature concat).
_base_ = ['../ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py']
model = dict(
    shared_head=dict(type='ACRN', out_channels=2048, stride=1,
                     num_convs=1))
optimizer = dict(optimizer='sgd', learning_rate=0.1, momentum=0.9,
                 weight_decay=1e-5, grad_clip=40.0, warmup_steps=1000)
total_epochs = 10
