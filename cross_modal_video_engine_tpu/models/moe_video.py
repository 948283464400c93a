"""Expert-parallel MoE video classifier — the model-zoo consumer of
`parallel.moe.expert_parallel_mlp`.

A transformer over per-frame features whose FFN layers alternate dense
and switch-routed MoE (top-1, capacity-limited, load-balance aux loss):
the scaling recipe that grows model capacity without growing per-token
FLOPs.  The reference has no MoE (SURVEY §2.4) — this is TPU-native
headroom wired into a trainable classifier rather than a bare op: the
expert weights live as ordinary flax params with a leading expert axis,
sharded over the mesh's 'expert' axis by
`parallel.shardings.moe_param_shardings`, and each forward runs the two
all_to_all exchanges inside one shard_map program.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh

from ..parallel.moe import expert_parallel_mlp


@dataclasses.dataclass(frozen=True)
class MoEVideoConfig:
    num_classes: int = 400
    width: int = 256
    num_heads: int = 4
    num_layers: int = 4
    n_experts: int = 4
    expert_hidden: int = 512
    moe_every: int = 2            # every k-th layer's FFN is MoE
    capacity_factor: float = 1.25
    aux_loss_weight: float = 0.01


class _Attn(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        D, H = self.width, self.heads
        hd = D // H
        q = nn.Dense(D, name="q_proj")(x)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)
        B, L, _ = x.shape
        q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(
            jnp.einsum("bhld,bhsd->bhls", q, k,
                       preferred_element_type=jnp.float32)
            / np.sqrt(hd), axis=-1)
        o = jnp.einsum("bhls,bhsd->bhld", w, v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, name="out_proj")(o)


class MoEVideoClassifier(nn.Module):
    """(B, T, F) frame features -> (scores (B, C), aux losses).

    `mesh` must carry an 'expert' axis whose size equals
    cfg.n_experts; call under that mesh (jit handles the resharding of
    replicated activations into the shard_map)."""

    cfg: MoEVideoConfig
    mesh: Mesh

    @nn.compact
    def __call__(self, frames: jnp.ndarray, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, dict]:
        cfg = self.cfg
        B, T, _ = frames.shape
        D = cfg.width
        x = nn.Dense(D, name="input_proj")(frames)
        x = x + self.param("pos_embed",
                           nn.initializers.truncated_normal(0.02),
                           (1, T, D))
        aux_total = 0.0
        dropped = 0.0
        for i in range(cfg.num_layers):
            h = nn.LayerNorm(name=f"ln_attn_{i}")(x)
            x = x + _Attn(D, cfg.num_heads, name=f"attn_{i}")(h)
            h = nn.LayerNorm(name=f"ln_ffn_{i}")(x)
            if (i + 1) % cfg.moe_every == 0:
                router = self.param(f"router_{i}",
                                    nn.initializers.normal(0.02),
                                    (D, cfg.n_experts))
                w1 = self.param(f"moe_w1_{i}",
                                nn.initializers.normal(0.02),
                                (cfg.n_experts, D, cfg.expert_hidden))
                w2 = self.param(f"moe_w2_{i}",
                                nn.initializers.normal(0.02),
                                (cfg.n_experts, cfg.expert_hidden, D))
                tokens = h.reshape(B * T, D)
                out, aux = expert_parallel_mlp(
                    tokens, router, w1, w2, self.mesh,
                    capacity_factor=cfg.capacity_factor)
                x = x + out.reshape(B, T, D)
                aux_total = aux_total + aux["load_balance_loss"]
                dropped = jnp.maximum(dropped, aux["dropped_fraction"])
            else:
                f = nn.Dense(cfg.expert_hidden, name=f"ffn_fc1_{i}")(h)
                x = x + nn.Dense(D, name=f"ffn_fc2_{i}")(nn.relu(f))
        x = nn.LayerNorm(name="ln_out")(x)
        scores = nn.Dense(cfg.num_classes, name="head")(x.mean(axis=1))
        n_moe = max(1, cfg.num_layers // cfg.moe_every)
        return scores, {"load_balance_loss": aux_total / n_moe,
                        "dropped_fraction": dropped}


def moe_param_shardings(params, mesh: Mesh, axis: str = "expert"):
    """NamedShardings: expert-stacked leaves (moe_w1/w2) shard their
    leading expert axis over `axis`; everything else replicates."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def rule(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "moe_w1" in names or "moe_w2" in names:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def make_moe_train_step(model: MoEVideoClassifier, tx):
    """CE + load-balance-aux train step; call under the expert mesh."""
    import optax

    def loss_fn(params, frames, labels):
        scores, aux = model.apply({"params": params}, frames)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        loss = ce + model.cfg.aux_loss_weight * aux["load_balance_loss"]
        acc = (scores.argmax(-1) == labels).mean()
        return loss, (acc, aux)

    def step(params, opt_state, frames, labels):
        (loss, (acc, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, frames, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "top1_acc": acc, **aux}

    return jax.jit(step)
