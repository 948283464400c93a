"""Sharded retrieval index tests on the 8-device CPU mesh."""

import numpy as np
import jax

from cross_modal_video_engine_tpu.retrieval import RetrievalIndex
from cross_modal_video_engine_tpu.parallel import make_mesh

rng = np.random.default_rng(11)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_topk_matches_bruteforce():
    n, d, q, k = 103, 16, 7, 5   # n deliberately not divisible by 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    idx = RetrievalIndex(emb, mesh=make_mesh())
    vals, ids = idx.search(queries, k)

    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ embn.T
    brute = np.argsort(-sims, axis=1)[:, :k]
    np.testing.assert_array_equal(ids, brute)
    np.testing.assert_allclose(vals, np.take_along_axis(sims, brute, axis=1),
                               rtol=1e-4, atol=1e-5)


def test_padding_rows_never_returned():
    n, d = 9, 8   # pads to 16 over 8 shards
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx = RetrievalIndex(emb, mesh=make_mesh())
    _, ids = idx.search(rng.standard_normal((3, d)).astype(np.float32), k=9)
    assert ids.max() < n


def test_k_larger_than_shard_rows():
    n, d = 16, 8  # 2 rows per shard
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx = RetrievalIndex(emb, mesh=make_mesh())
    vals, ids = idx.search(rng.standard_normal((2, d)).astype(np.float32), k=2)
    assert ids.shape == (2, 2)


def test_k_larger_than_index():
    n, d = 10, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx = RetrievalIndex(emb, mesh=make_mesh())
    vals, ids = idx.search(rng.standard_normal((2, d)).astype(np.float32), k=50)
    # clamped to n, no padding rows, no -inf scores
    assert ids.shape == (2, n)
    assert ids.max() < n and np.isfinite(vals).all()
    assert sorted(ids[0]) == list(range(n))


def test_search_ids_and_full_errors():
    n, d = 24, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    names = [f"v{i}" for i in range(n)]
    idx = RetrievalIndex(emb, ids=names, mesh=make_mesh())
    q = emb[:2] + 0.01 * rng.standard_normal((2, d)).astype(np.float32)
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows == [["v0"], ["v1"]]
    errs = idx.full_errors(q)
    assert errs.shape == (2, n)
    assert errs[0].argmin() == 0 and errs[1].argmin() == 1


def test_index_add_remove():
    n, d = 20, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    names = [f"v{i}" for i in range(n)]
    idx = RetrievalIndex(emb, ids=names, mesh=make_mesh())
    new = rng.standard_normal((3, d)).astype(np.float32)
    idx.add(new, ids=["n0", "n1", "n2"])
    assert idx.n == 23
    q = new[1:2] + 0.001 * rng.standard_normal((1, d)).astype(np.float32)
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows == [["n1"]]
    idx.remove([21])                      # drop n1
    assert idx.n == 22 and "n1" not in idx.ids
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows[0][0] != "n1"
