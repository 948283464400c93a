# Audio-only recognition over precomputed log-mel features (reference
# configs/recognition_audio/audioonly/
# audioonly_r50_64x1x1_100e_kinetics400_audio_feature.py: ResNetAudio
# r50 depth -> the deeper channel ladder here, clip_len 64, SGD lr 2.0
# (8 gpus) momentum 0.9 wd 1e-4, grad clip 40, cosine schedule, 100
# epochs, 160 videos/gpu).  Single-chip lr follows the reference's
# linear-scaling note: 2.0 * 1/8 = 0.25.
_base_ = ['../_base_/default_runtime.py']
model = dict(num_classes=400, channels=[64, 128, 256, 512], n_mels=80)
data = dict(
    train=dict(ann_file='data/kinetics400/audio_feature_train.txt',
               data_prefix='data/kinetics400/audio_feature_train'),
    val=dict(ann_file='data/kinetics400/audio_feature_val.txt',
             data_prefix='data/kinetics400/audio_feature_val'),
    pipeline=[
        dict(type='LoadAudioFeature'),
        dict(type='SampleFrames', clip_len=64, frame_interval=1,
             num_clips=1, test_mode=True),
        dict(type='AudioFeatureSelector', fixed_length=128),
    ],
    videos_per_gpu=160)
optimizer = dict(optimizer='sgd', learning_rate=0.25, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
