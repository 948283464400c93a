"""Concept-bottleneck model head.

Rebuild of MCT/tools/ctvs/ctv_analysis/concept_bottleneck_model/
train_cbm.py:69-94 (`Residual_Head`): classify from concept-score logits
with a residual fusion of the raw embedding.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ConceptBottleneckConfig:
    embed_dim: int = 768
    n_concepts: int = 64
    num_classes: int = 400
    hidden: int = 256


class ResidualHead(nn.Module):
    cfg: ConceptBottleneckConfig

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, concept_scores: jnp.ndarray,
                 *, train: bool = False):
        """embedding: (B, D); concept_scores: (B, n_concepts).
        Returns (class_logits, concept_branch_logits)."""
        cfg = self.cfg
        concept_logits = nn.Dense(cfg.num_classes, name="concept_fc")(
            nn.relu(nn.Dense(cfg.hidden, name="concept_hidden")(
                concept_scores)))
        emb_logits = nn.Dense(cfg.num_classes, name="embed_fc")(embedding)
        return concept_logits + emb_logits, concept_logits
