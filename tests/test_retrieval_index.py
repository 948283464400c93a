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
    cap0 = idx.capacity
    new = rng.standard_normal((3, d)).astype(np.float32)
    idx.add(new, ids=["n0", "n1", "n2"])
    # within capacity: in-place (no re-place, no growth)
    assert idx.n == 23 and idx.n_active == 23 and idx.capacity == cap0
    q = new[1:2] + 0.001 * rng.standard_normal((1, d)).astype(np.float32)
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows == [["n1"]]
    idx.remove([21])                      # tombstone n1 in place
    assert idx.n == 23 and idx.n_active == 22
    assert idx.ids[21] is None
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows[0][0] != "n1"
    # tombstones score +inf in the dense matrix
    errs = idx.full_errors(q)
    assert np.isinf(errs[0, 21])
    # compaction reclaims the slot
    idx.compact()
    assert idx.n == 22 and idx.n_active == 22 and "n1" not in idx.ids
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows[0][0] != "n1"


def test_index_growth_past_capacity():
    n, d = 6, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx = RetrievalIndex(emb, ids=[f"v{i}" for i in range(n)],
                         mesh=make_mesh(), capacity=8)
    idx.remove([2])
    cap0 = idx.capacity
    new = rng.standard_normal((10, d)).astype(np.float32)
    idx.add(new, ids=[f"n{i}" for i in range(10)])
    assert idx.capacity > cap0
    assert idx.n == 16 and idx.n_active == 15   # tombstone survives growth
    q = new[3:4]
    _, id_rows = idx.search_ids(q, k=1)
    assert id_rows == [["n3"]]
    # the pre-growth tombstone is still dead
    _, ids_all = idx.search(rng.standard_normal((1, d)).astype(np.float32),
                            k=idx.n_active)
    assert 2 not in ids_all[0]


def test_index_add_many_small_batches_stays_in_place():
    """The serving pattern the old rebuild-on-add penalized: many tiny
    appends. Capacity never changes and results stay exact."""
    d = 8
    emb = rng.standard_normal((4, d)).astype(np.float32)
    idx = RetrievalIndex(emb, mesh=make_mesh(), capacity=64)
    all_rows = [emb]
    for i in range(10):
        new = rng.standard_normal((2, d)).astype(np.float32)
        idx.add(new)
        all_rows.append(new)
    assert idx.capacity == 64 and idx.n == 24
    full = np.concatenate(all_rows)
    fn = full / np.linalg.norm(full, axis=1, keepdims=True)
    q = rng.standard_normal((3, d)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    brute = np.argsort(-(qn @ fn.T), axis=1)[:, :5]
    _, ids = idx.search(q, k=5)
    np.testing.assert_array_equal(ids, brute)


def test_search_exact_on_large_index_partial_reduce_path():
    """N > 4096 routes through lax.approx_max_k; recall_target=1.0 must
    stay EXACT vs a numpy argsort."""
    g = np.random.default_rng(123)
    emb = g.standard_normal((8192, 32)).astype(np.float32)
    index = RetrievalIndex(emb, capacity=8192)
    q = g.standard_normal((5, 32)).astype(np.float32)
    vals, idx = index.search(q, k=7)

    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ embn.T
    want = np.argsort(-sims, axis=1)[:, :7]
    np.testing.assert_array_equal(np.sort(idx, 1), np.sort(want, 1))
    np.testing.assert_allclose(
        vals, np.take_along_axis(sims, idx, 1), rtol=1e-5, atol=1e-5)


def test_int8_index_recall_scores_and_serving_updates():
    """dtype=int8: symmetric 127-scale rows + in-jit query quantization.
    Top-k recall vs the exact f32 index stays high, returned scores
    approximate cosine within quantization error, and the serving
    add/remove/compact paths re-encode correctly."""
    import jax.numpy as jnp

    g = np.random.default_rng(7)
    emb = g.standard_normal((2048, 256)).astype(np.float32)
    q = g.standard_normal((16, 256)).astype(np.float32)
    exact = RetrievalIndex(emb, capacity=2048)
    quant = RetrievalIndex(emb, capacity=4096, dtype=jnp.int8)
    assert np.asarray(quant.emb).dtype == np.int8

    ev, ei = exact.search(q, k=10)
    qv, qi = quant.search(q, k=10)
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(ei, qi)])
    assert recall >= 0.9, recall
    # scores approximate the exact cosine of the SAME returned row
    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    true_of_returned = np.take_along_axis(qn @ embn.T, qi, 1)
    np.testing.assert_allclose(qv, true_of_returned, atol=0.02)

    # add() quantizes appended rows; a strong match is found at rank 1
    probe = qn[:1] * 0.99 + 0.01 * g.standard_normal((1, 256))
    quant.add(probe)
    v2, i2 = quant.search(q[:1], k=3)
    assert i2[0, 0] == 2048 and v2[0, 0] > 0.95
    # remove + compact round-trips through the decode path
    quant.remove([2048])
    quant.compact()
    _, i3 = quant.search(q[:1], k=3)
    assert 2048 not in i3[0]
    # full_errors decodes int8 rows back to ~cosine errors
    err = quant.full_errors(q[:1])
    np.testing.assert_allclose(err[0, : 2048], -(qn[:1] @ embn.T)[0],
                               atol=0.02)


def test_growth_without_tombstones_keeps_n_active_exact():
    """Regression: the growth path of add() double-counted the appended
    rows in n_active when the old index had no tombstones, making
    search(k) return -inf padding slots and search_ids crash."""
    d = 16
    emb = rng.standard_normal((4, d)).astype(np.float32)
    idx = RetrievalIndex(emb, ids=[f"v{i}" for i in range(4)],
                         capacity=8, mesh=make_mesh())
    new = rng.standard_normal((8, d)).astype(np.float32)
    idx.add(new, ids=[f"n{i}" for i in range(8)])   # forces regrowth
    assert idx.n == 12 and idx.n_active == 12
    q = rng.standard_normal((2, d)).astype(np.float32)
    vals, ids = idx.search_ids(q, k=50)             # clamps to n_active
    assert np.isfinite(vals).all()
    assert all(len(row) == 12 for row in ids)


def test_add_respects_index_normalize_flag():
    """add() must default to the index's own normalize setting: a raw
    (dot-product) index must not silently L2-normalize appended rows."""
    d = 8
    emb = 3.0 * np.eye(4, d).astype(np.float32)     # rows of norm 3
    idx = RetrievalIndex(emb, normalize=False, capacity=16,
                         mesh=make_mesh())
    row = np.zeros((1, d), np.float32)
    row[0, 5] = 3.0
    idx.add(row)                                    # must stay norm 3
    q = np.zeros((1, d), np.float32)
    q[0, 5] = 1.0
    vals, ids = idx.search(q, k=1)
    assert ids[0, 0] == 4
    np.testing.assert_allclose(vals[0, 0], 3.0, rtol=1e-5)
