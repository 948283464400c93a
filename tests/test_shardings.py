"""Parameter/optimizer sharding rules over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cross_modal_video_engine_tpu.parallel.mesh import make_mesh
from cross_modal_video_engine_tpu.parallel.shardings import (
    partition_params, opt_state_shardings)


def _params():
    return {
        "block": {
            "q_proj": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros((8,))},
            "out_proj": {"kernel": jnp.zeros((8, 8)),
                         "bias": jnp.zeros((8,))},
        },
        "head": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))},
    }


def test_partition_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    sh = partition_params(_params(), mesh)
    assert sh["block"]["q_proj"]["kernel"].spec == P(None, "model")
    assert sh["block"]["out_proj"]["kernel"].spec == P("model", None)
    assert sh["block"]["q_proj"]["bias"].spec == P()
    assert sh["head"]["kernel"].spec == P()


def test_opt_state_shardings_match_structure_and_place():
    mesh = make_mesh(n_data=4, n_model=2)
    params = _params()
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    osh = opt_state_shardings(opt_state, params, mesh)
    # identical treedef -> usable as jit in_/out_shardings
    assert (jax.tree_util.tree_structure(osh)
            == jax.tree_util.tree_structure(opt_state))
    placed = jax.device_put(opt_state, osh)
    # mu mirrors the param partitioning
    mu = placed[0].mu
    assert mu["block"]["q_proj"]["kernel"].sharding.spec == P(None, "model")
    assert mu["block"]["out_proj"]["kernel"].sharding.spec == P("model", None)
    # count is replicated
    assert placed[0].count.sharding.spec == P()
    # and an update step runs under those shardings
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, placed, jax.device_put(
        params, partition_params(params, mesh)))
    assert np.isfinite(
        float(jnp.sum(updates["head"]["kernel"])))
