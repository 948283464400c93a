# I3D-R50 + non-local (embedded gaussian) 32x2x1 (reference
# configs/recognition/i3d/i3d_nl_embedded_gaussian_r50_32x2x1_100e_
# kinetics400_rgb.py: NonLocal3d after alternate blocks of stages 2-3).
_base_ = ['./i3d_r50_32x2_k400.py']
model = dict(
    backbone=dict(
        non_local=[[0, 0, 0], [0, 1, 0, 1], [0, 1, 0, 1, 0, 1],
                   [0, 0, 0]]))
