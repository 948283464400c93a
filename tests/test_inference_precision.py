"""bf16 checkpoints must run a bf16 inference program.

Families that rely on input dtype (TimeSformer's FFN, BN backbones) get
promoted back to f32 by ``Dense(dtype=None)`` whenever the loaded params
are f32 — api.init_recognizer therefore casts the tree when the backbone
config says dtype='bfloat16' (utils/precision.cast_inference_variables,
the torch .half() analogue).  Same bug class as the bench-builder fix in
tests/test_bench_builders.py, on the inference side."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.api import init_recognizer
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint
from cross_modal_video_engine_tpu.utils.precision import (
    cast_inference_variables)
from cross_modal_video_engine_tpu.utils.roofline import op_costs

TS_KW = dict(num_frames=4, img_size=32, patch_size=8, embed_dims=64,
             num_heads=2, num_layers=2, drop_path_max=0.0)


def test_cast_skips_integer_leaves():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "ids": jnp.arange(3, dtype=jnp.int32)}
    out = cast_inference_variables(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32
    # f32 target is the identity
    assert cast_inference_variables(tree, jnp.float32) is tree


def test_bf16_checkpoint_loads_bf16_and_runs_bf16(tmp_path):
    cfg = TimeSformerConfig(dtype="bfloat16", **TS_KW)
    model0 = Recognizer3D(cfg, num_classes=5)
    clips = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model0.init(jax.random.key(0), clips)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, variables,
                    {"backbone": dict(TS_KW, dtype="bfloat16"),
                     "num_classes": 5})

    model, v2, _ = init_recognizer(ckpt)
    leaves = jax.tree.leaves(v2)
    assert leaves and all(l.dtype == jnp.bfloat16 for l in leaves
                          if jnp.issubdtype(l.dtype, jnp.floating))

    # the traced inference program must spend its MXU FLOPs on bf16
    costs = [c for c in op_costs(
        lambda v, x: model.apply(v, x), v2,
        jax.ShapeDtypeStruct((1, 4, 32, 32, 3), jnp.float32)) if c.flops]
    total = sum(c.flops for c in costs)
    bf16 = sum(c.flops for c in costs if c.dtypes == ("bfloat16",))
    assert total and bf16 / total >= 0.98, \
        (bf16 / total, [(c.label, c.dtypes) for c in costs
                        if c.dtypes != ("bfloat16",)][:6])

    # and stay numerically close to the f32 run
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    s16 = np.asarray(model.apply(v2, x), np.float32)
    s32 = np.asarray(model0.apply(variables, x), np.float32)
    np.testing.assert_allclose(s16, s32, atol=0.15)
    assert np.isfinite(s16).all()
