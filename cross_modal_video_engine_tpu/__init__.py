"""Cross-Modal-Video-Engine, rebuilt TPU-native on JAX/XLA/Pallas/pjit.

A single framework providing the four capabilities of the reference
WWWindrunner/Cross-Modal-Video-Engine (see SURVEY.md):

1. Text -> video retrieval (LINAS-engine equivalent: support-set distilled
   dual encoder over frame features).
2. Composed text+video retrieval (MultiFusion equivalent: CLIP dual tower +
   Combiner fusion head).
3. Explainable video recognition (MCT equivalent: TimeSformer backbone +
   concept-vector interpretation).
4. Video caption / label-sequence generation (RNN decoder head over the
   recognition backbone).

Unlike the reference (four disjoint PyTorch/CUDA stacks), everything here
shares one TPU runtime: jit/pjit compute over a `jax.sharding.Mesh`,
Pallas kernels for the hot preprocessing / retrieval ops, and XLA
collectives over ICI instead of NCCL.
"""

__version__ = "0.1.0"
