# SlowFast + multigrid schedule (reference
# configs/recognition/slowfast + utils/multigrid/longshortcyclehook.py;
# bucketed fixed-shape redesign, train/multigrid.py)
_base_ = ['./slowfast_r50_4x16_k400.py']
multigrid = dict(
    buckets=[[64, 4, 112], [32, 8, 112], [16, 8, 224], [8, 8, 224]],
    long_cycle_epochs=2,
    base_batch=8,
    base_lr=0.1,
    final_epochs=2)
