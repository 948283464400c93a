# Audio-only recognition over log-mel features (reference
# configs/recognition_audio/resnet/tsn_r18_64x1x1_100e_kinetics400_audio_feature.py
# role; trains with cli/audio_train)
_base_ = ['../_base_/default_runtime.py']
model = dict(num_classes=400, channels=[32, 64, 128], n_mels=80)
data = dict(
    train=dict(ann_file='data/kinetics400/audio_train.txt',
               data_prefix='data/kinetics400/audio_features'),
    val=dict(ann_file='data/kinetics400/audio_val.txt',
             data_prefix='data/kinetics400/audio_features'),
    pipeline=[
        dict(type='LoadAudioFeature'),
        dict(type='SampleFrames', clip_len=64, frame_interval=1,
             num_clips=1, test_mode=True),
        dict(type='AudioFeatureSelector', fixed_length=128),
    ],
    videos_per_gpu=16)
optimizer = dict(optimizer='sgd', learning_rate=0.01, momentum=0.9,
                 weight_decay=1e-4, grad_clip=40.0)
total_epochs = 100
