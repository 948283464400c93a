"""Single-query text->video retrieval CLI.

Parity surface for LINAS-engine/inference.py:46-82:
  * loads the checkpoint (config embedded) and rebuilds the model;
  * builds/caches the full video-embedding index (the reference caches to
    `video_data.pt`, inference.py:57-67; we cache `video_index.npz`);
  * embeds the query through the student text path (embed_txt_distill,
    inference.py:77);
  * prints the top-K video ids.

Usage:
  python -m cross_modal_video_engine_tpu.cli.retrieval_inference \
      --checkpoint CKPT_DIR --rootpath ROOT --collection C \
      --visual_feature F --input "a man riding a horse" --topK 10
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import jax
import numpy as np

from ..data.provider import LinasDataset
from ..retrieval.evaluation import encode_batched
from ..retrieval.index import RetrievalIndex
from .common import load_dataset, restore_dual_encoding


@functools.lru_cache(maxsize=4)
def _embed_vis_fn(model):
    """One compiled video embedder per model, variables as an ARGUMENT
    (a per-call closure inlines params into the HLO — rejected >~100MB
    by the remote compile service — and recompiles every call)."""
    return jax.jit(lambda v, x: model.apply(v, x,
                                            method="embed_vis_distill"))


def build_video_index(model, variables, dataset: LinasDataset,
                      batch_size: int = 64, cache: str | None = None,
                      mesh=None, dtype=None,
                      capacity: int | None = None) -> RetrievalIndex:
    """dtype: stored-row precision (float32 default; 'bfloat16'/'int8'
    are the serving configurations — see RetrievalIndex).  capacity:
    index slot count (default 2x rows for incremental add headroom;
    pass the row count for a frozen corpus to halve index HBM)."""
    import jax.numpy as jnp
    dtype = jnp.dtype(dtype) if dtype else jnp.float32
    if cache and os.path.exists(cache):
        data = np.load(cache, allow_pickle=True)
        return RetrievalIndex(data["emb"], ids=list(data["ids"]),
                              mesh=mesh, dtype=dtype, capacity=capacity)
    embed = _embed_vis_fn(model)
    chunks, names = [], []
    for batch, n in dataset.video_batches(batch_size):
        chunks.append(np.asarray(embed(variables, batch))[:n])
    names = dataset.video_ids
    emb = np.concatenate(chunks, axis=0)
    if cache:
        np.savez(cache, emb=emb, ids=np.array(names))
    return RetrievalIndex(emb, ids=names, mesh=mesh, dtype=dtype,
                          capacity=capacity)


def embed_query(model, variables, dataset: LinasDataset, query: str):
    from ..models.dual_encoding import make_text_batch
    bow, ids = dataset.process_cap(query)
    batch = make_text_batch([ids[: dataset.max_words]], bow[None, :],
                            dataset.max_words)
    emb = model.apply(variables, batch, method="embed_txt_distill")
    return np.asarray(emb)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--rootpath", required=True)
    parser.add_argument("--collection", required=True)
    parser.add_argument("--visual_feature", required=True)
    parser.add_argument("--input", required=True, help="text query")
    parser.add_argument("--topK", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--index_cache", default=None,
                        help="npz cache of the video index")
    args = parser.parse_args(argv)

    model, state = restore_dual_encoding(args.checkpoint)
    dataset = load_dataset(args.rootpath, args.collection, args.visual_feature)
    index = build_video_index(model, state["variables"], dataset,
                              args.batch_size, args.index_cache)
    q = embed_query(model, state["variables"], dataset, args.input)
    scores, id_rows = index.search_ids(q, k=args.topK)
    for vid, score in zip(id_rows[0], scores[0]):
        print(f"{vid}\t{score:.4f}")
    return id_rows[0]


if __name__ == "__main__":
    main()
