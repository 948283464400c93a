"""Orbax sharded checkpointing on the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cross_modal_video_engine_tpu.parallel.mesh import make_mesh
from cross_modal_video_engine_tpu.train.orbax_ckpt import ShardedCheckpointer

rng = np.random.default_rng(887)


@pytest.mark.full    # full lane: the driver multichip dryrun re-runs a sharded orbax round-trip every round (__graft_entry__.py)
def test_sharded_save_restore_roundtrip(tmp_path):
    mesh = make_mesh(n_data=4, n_model=2)
    shard = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    params = {
        "w": jax.device_put(
            rng.standard_normal((16, 8)).astype(np.float32), shard),
        "b": jax.device_put(np.arange(8, dtype=np.float32), repl),
    }
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    state = {"params": params, "opt": opt_state,
             "step": jnp.asarray(7, jnp.int32)}

    ckpt = ShardedCheckpointer(str(tmp_path / "ckpts"), max_to_keep=2)
    ckpt.save(7, state, {"epoch": 3, "best": 1.5})
    ckpt.save(9, state)
    ckpt.wait()
    assert ckpt.latest_step() == 9

    template = jax.tree.map(jnp.zeros_like, state)
    template["params"] = jax.device_put(template["params"],
                                        {"w": shard, "b": repl})
    restored, loop, step = ckpt.restore(template, step=7)
    assert step == 7 and loop == {"epoch": 3, "best": 1.5}
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]),
                                  np.asarray(params["b"]))
    # restored leaves keep the requested sharding
    assert restored["params"]["w"].sharding.spec == P("data", None)
    assert int(restored["step"]) == 7

    # rolling retention: a third save evicts the oldest
    ckpt.save(11, state)
    ckpt.wait()
    steps = sorted(ckpt.manager.all_steps())
    assert len(steps) == 2 and 7 not in steps
    ckpt.close()
