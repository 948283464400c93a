"""In-batch contrastive losses.

* `info_nce_logits` + `clip_contrastive_loss`: the batch-contrastive CE the
  MultiFusion combiner trains with (combiner_train.py:368-370: logits from
  Combiner.forward, target = arange(B)).
* Supports a `num_shards`-aware variant for a mesh-sharded global batch:
  embeddings are all-gathered along the data axis before the logit matmul —
  the TPU analogue of MultiFusion's `concat_all_gather`
  (src/model/model.py:550-560).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def info_nce_logits(pred: jnp.ndarray, target: jnp.ndarray,
                    logit_scale: float = 100.0) -> jnp.ndarray:
    """pred, target: L2-normalized (B, d) -> (B, B) scaled logits."""
    return logit_scale * jnp.dot(pred, target.T, preferred_element_type=jnp.float32)


def clip_contrastive_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """CE against the diagonal."""
    labels = jnp.arange(logits.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def sharded_contrastive_loss(pred: jnp.ndarray, target: jnp.ndarray,
                             axis_name: str, logit_scale: float = 100.0) -> jnp.ndarray:
    """Inside shard_map/pjit with a data axis: gather all targets over ICI,
    compute local-queries x global-targets logits, CE against the global
    diagonal offset of this shard."""
    all_targets = jax.lax.all_gather(target, axis_name, axis=0, tiled=True)
    logits = logit_scale * jnp.dot(pred, all_targets.T,
                                   preferred_element_type=jnp.float32)
    shard = jax.lax.axis_index(axis_name)
    labels = shard * pred.shape[0] + jnp.arange(pred.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
