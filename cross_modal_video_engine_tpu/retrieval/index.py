"""Sharded embedding index with distributed top-k retrieval.

The TPU replacement for the reference's retrieval hot path
(LINAS evaluation.cal_error + np.argsort, inference.py:79-82;
MultiFusion validate.py:44-101 batched index scoring):

* the (capacity, d) embedding matrix lives row-sharded over the mesh
  'data' axis (HBM of all chips holds the index, N scales with the pod,
  not the chip);
* a query batch is replicated, each shard computes (Q, cap/shards)
  similarities with one MXU matmul and reduces them to a local top-k;
* the k*n_shards candidates ride ICI via the out-sharding all-gather and
  a final `lax.top_k` merges them — O(Q * k * shards) instead of
  O(Q * N) crossing the interconnect.

Incremental updates are SERVING-grade: the matrix is allocated at a
capacity (default 2x the build size, growable), a device-resident
validity mask marks live rows, `add` is one donated dynamic-update-slice
(no host round-trip, no recompile — row validity is data, not shape) and
`remove` tombstones rows in the mask.  Growth past capacity doubles and
re-places (amortized O(1) per appended row).

`vs_baseline`: the reference argsorts the full row on host (O(N log N),
evaluation.py:17-22); here sorting never leaves the device and never sees
more than k*shards candidates.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import data_sharding, make_mesh, shard_rows


def _l2n(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


class RetrievalIndex:
    """Normalized-embedding retrieval index, optionally mesh-sharded.

    ``dtype`` sets the stored-row precision: float32, bfloat16 (the
    serving default in bench_extra — halves HBM traffic) or **int8**
    (halves it again and runs the scoring matmul on the MXU's native
    int8 path).  int8 rows are symmetric-quantized with a PER-ROW
    scale (amax/127, 4 bytes/row — unit-norm d-dim rows have max
    components ~1/sqrt(d), so a global scale would waste most of the
    int8 range); queries quantize per-row inside the jit and the int32
    scores rescale by query-scale x row-scale to approximate cosine.
    Quantization can reorder near-ties — measured recall@10 vs the
    exact index is reported alongside the bench row (docs/PERF.md)."""

    def __init__(self, embeddings: np.ndarray, ids: Optional[list] = None,
                 mesh: Optional[Mesh] = None, normalize: bool = True,
                 dtype=jnp.float32, capacity: Optional[int] = None,
                 recall_target: float = 1.0):
        emb = np.asarray(embeddings, dtype=np.float32)
        if normalize:
            emb = _l2n(emb)
        self.dim = emb.shape[1]
        self.ids = list(ids) if ids is not None else None
        self.mesh = mesh if mesh is not None else make_mesh()
        # on a multi-slice (dcn, data, model) mesh rows shard jointly
        # over ('dcn', 'data') — matching mesh.data_sharding — so the
        # shard count and in-shard base offsets must span both axes
        self.lead_axes = (("dcn", "data")
                          if "dcn" in self.mesh.axis_names else ("data",))
        self.n_shards = int(np.prod([self.mesh.shape[a]
                                     for a in self.lead_axes]))
        self.dtype = jnp.dtype(dtype)
        self.int8 = self.dtype == jnp.dtype(jnp.int8)
        self.normalize = normalize
        self.recall_target = recall_target
        self._place(emb, capacity)
        self._search = self._build()

    # -- row codecs (int8 symmetric quantization, per-row amax scale) -------
    def _encode(self, emb_f32: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        if self.int8:
            amax = np.maximum(np.abs(emb_f32).max(axis=1), 1e-12)
            scales = (amax / 127.0).astype(np.float32)
            stored = np.clip(np.round(emb_f32 / scales[:, None]),
                             -127, 127).astype(np.int8)
            return stored, scales
        stored = emb_f32.astype(self.dtype)
        return stored, np.ones(emb_f32.shape[0], np.float32)

    def _decode(self, stored: np.ndarray, scales: np.ndarray) -> np.ndarray:
        x = np.asarray(stored, np.float32)
        return x * np.asarray(scales, np.float32)[:, None] if self.int8 else x

    # -- placement ----------------------------------------------------------
    def _place(self, emb: np.ndarray, capacity: Optional[int]) -> None:
        n = emb.shape[0]
        cap = max(capacity or 2 * n, n, self.n_shards)
        cap += (-cap) % self.n_shards             # shard-divisible
        pad = cap - n
        if pad:
            emb = np.pad(emb, ((0, pad), (0, 0)))
        emb, scales = self._encode(np.asarray(emb, np.float32))
        valid = np.zeros(cap, np.float32)
        valid[:n] = 1.0
        self.n = n                                 # slots used (tail watermark)
        self.n_active = n                          # live (non-tombstoned) rows
        self.capacity = cap
        self.emb = jax.device_put(emb, data_sharding(self.mesh, 2))
        self.scales = jax.device_put(scales, data_sharding(self.mesh, 1))
        self.valid = jax.device_put(valid, data_sharding(self.mesh, 1))
        self.rows_per_shard = cap // self.n_shards

    # -- compiled search ----------------------------------------------------
    def _build(self):
        mesh = self.mesh
        rows = self.rows_per_shard
        dtype = self.dtype
        int8 = self.int8
        lead_axes = self.lead_axes
        axis_sizes = tuple(mesh.shape[a] for a in lead_axes)

        recall_target = self.recall_target

        def local_topk(k, q, qscale, emb_shard, scales_shard, valid_shard):
            if int8:
                # int8 x int8 -> int32 on the MXU's native low-precision
                # path; positive query x row scale rescale restores
                # ~cosine magnitudes (and per-query it cannot touch the
                # ranking beyond the row-scale correction itself)
                sims = jax.lax.dot_general(
                    q, emb_shard, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * qscale * scales_shard[None, :]
            else:
                sims = jnp.dot(q, emb_shard.T,
                               preferred_element_type=jnp.float32)
            # linear shard id over the (possibly joint) leading axes,
            # mesh-major — the same order device_put splits rows in
            shard = 0
            for ax, size in zip(lead_axes, axis_sizes):
                shard = shard * size + jax.lax.axis_index(ax)
            base = shard * rows
            sims = jnp.where(valid_shard[None, :] > 0, sims, -jnp.inf)
            # TPU PartialReduce top-k (lax.approx_max_k).  With
            # recall_target=1.0 (the default) the reduction keeps enough
            # candidates for EXACT results; at 1M rows this measured
            # 5.7 ms vs 32 ms for a grouped lax.top_k (sort-based) and
            # 10 ms for k iterative argmax passes — see docs/PERF.md.
            # Serving can trade recall for speed (0.95 -> 3.4 ms,
            # measured recall@10 0.97).
            R = sims.shape[1]
            if R > 4096 and k <= 512:
                vals, idx = jax.lax.approx_max_k(
                    sims, k, recall_target=recall_target)
            else:
                vals, idx = jax.lax.top_k(sims, k)
            return vals, idx + base

        # emb/valid are jit ARGUMENTS: closing over them would inline the
        # (possibly multi-GB) index into the HLO as a constant.
        @functools.partial(jax.jit, static_argnames=("k",))
        def search(emb, scales, valid, q, k):
            kk = min(k, rows)
            if int8:
                amax = jnp.maximum(
                    jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
                qq = jnp.clip(jnp.round(q / amax * 127.0), -127,
                              127).astype(jnp.int8)
                qscale = amax / 127.0
            else:
                qq = q.astype(dtype)
                qscale = jnp.ones((q.shape[0], 1), jnp.float32)
            lead = lead_axes if len(lead_axes) > 1 else lead_axes[0]
            f = shard_map(
                functools.partial(local_topk, kk),
                mesh=mesh,
                in_specs=(P(), P(), P(lead, None), P(lead), P(lead)),
                out_specs=(P(None, lead), P(None, lead)),
                check_vma=False,
            )
            vals, idx = f(qq, qscale, emb, scales, valid)  # (Q, kk*shards)
            if vals.shape[1] > k:
                mvals, pos = jax.lax.top_k(vals, k)
                midx = jnp.take_along_axis(idx, pos, axis=1)
                return mvals, midx
            return vals, idx

        # dense scorer for full_errors: built once here so repeated
        # calls reuse one compiled program (a per-call @jax.jit closure
        # would re-trace every time)
        @jax.jit
        def dense(qq, emb, scales, valid):
            rows_f = emb.astype(jnp.float32)
            if int8:
                rows_f = rows_f * scales[:, None]
            e = -jnp.dot(qq, rows_f.T, preferred_element_type=jnp.float32)
            return jnp.where(valid[None, :] > 0, e, jnp.inf)

        self._dense = dense
        return search

    def search(self, queries: np.ndarray, k: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (scores, indices): top-k cosine scores per query row."""
        k = min(k, self.n_active)     # never return padding/tombstones
        qh = np.asarray(queries, np.float32)
        nq = qh.shape[0]
        if nq < 8:
            # M<8 GEMV pathology: XLA lays a single-query dot against a
            # multi-GB row matrix out so badly it measured ~4x slower
            # than a whole 8-row wave (bench_serve r5) — pad every
            # caller to the MXU sublane here, not just the serve route
            qh = np.concatenate(
                [qh, np.zeros((8 - nq, qh.shape[1]), np.float32)])
        q = jnp.asarray(qh)
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        vals, idx = self._search(self.emb, self.scales, self.valid, qn, k)
        return np.asarray(vals)[:nq], np.asarray(idx)[:nq]

    def search_ids(self, queries: np.ndarray, k: int = 10):
        vals, idx = self.search(queries, k)
        assert self.ids is not None, "index built without ids"
        return vals, [[self.ids[j] for j in row] for row in idx]

    def searcher(self):
        """The compiled (emb, scales, valid, queries, k) -> (vals, idx)
        search program, exposed for composition into a LARGER jit:
        serving fuses the text tower and this search into ONE device
        program so the query embedding never round-trips to the host
        (cli/serve.py).  Queries must be L2-normalized rows; cap k with
        min(k, n_active) on the host, as `search` does."""
        return self._search

    # -- incremental updates (serving path) --------------------------------
    def add(self, embeddings: np.ndarray, ids: Optional[list] = None,
            normalize: Optional[bool] = None) -> None:
        """Append rows IN PLACE: one donated dynamic-update-slice into the
        capacity-padded device matrix — no host fetch of the index, no
        recompile.  Growth past capacity doubles and re-places.
        normalize defaults to the index's own normalize setting so
        appended rows score on the same scale as built rows."""
        new = np.asarray(embeddings, np.float32)
        if self.normalize if normalize is None else normalize:
            new = _l2n(new)
        m = new.shape[0]
        if self.ids is not None:
            assert ids is not None and len(ids) == m
        if self.n + m > self.capacity:
            current = self._decode(jax.device_get(self.emb),
                                   jax.device_get(self.scales))[: self.n]
            mat = np.concatenate([current, new], 0)
            tomb = np.asarray(jax.device_get(self.valid))[: self.n] == 0
            old_n = self.n
            self._place(mat, max(2 * self.capacity, mat.shape[0]))
            # _place marked all old_n + m rows live (n_active = n);
            # re-apply tombstones after regrowth
            if tomb.any():
                self.valid = _tombstone(self.valid,
                                        jnp.asarray(np.nonzero(tomb)[0]))
                self.n_active = old_n - int(tomb.sum()) + m
            self._search = self._build()
        else:
            stored, scales = self._encode(new)
            self.emb, self.scales, self.valid = _insert(
                self.emb, self.scales, self.valid, jnp.asarray(stored),
                jnp.asarray(scales), jnp.asarray(self.n, jnp.int32))
            self.n += m
            self.n_active += m
        if self.ids is not None:
            self.ids = list(self.ids) + list(ids)

    def remove(self, row_indices: Sequence[int]) -> None:
        """Tombstone rows IN PLACE via the device validity mask (no
        rebuild); tombstoned rows can never be returned.  Call `compact`
        to reclaim the slots."""
        idx = np.unique(np.asarray(list(row_indices), np.int64))
        assert (idx < self.n).all()
        live = np.asarray(jax.device_get(self.valid))[idx] > 0
        self.valid = _tombstone(self.valid, jnp.asarray(idx))
        self.n_active -= int(live.sum())
        if self.ids is not None:
            for i in idx:
                self.ids[int(i)] = None

    def compact(self) -> None:
        """Rebuild without tombstones (host-side; use sparingly)."""
        emb = self._decode(jax.device_get(self.emb),
                           jax.device_get(self.scales))[: self.n]
        valid = np.asarray(jax.device_get(self.valid))[: self.n] > 0
        if self.ids is not None:
            self.ids = [i for i, v in zip(self.ids, valid) if v]
        self._place(emb[valid], self.capacity)
        self._search = self._build()

    def full_errors(self, queries: np.ndarray) -> np.ndarray:
        """Dense (Q, N) error matrix (for metric parity paths that need the
        full ranking, like tester.py's pred_errors_matrix).  Tombstoned
        rows score +inf."""
        q = jnp.asarray(np.asarray(queries, np.float32))
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        out = self._dense(qn, self.emb, self.scales, self.valid)
        return np.asarray(out)[:, : self.n]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _insert(emb, scales, valid, new, new_scales, start):
    emb = jax.lax.dynamic_update_slice(emb, new, (start, 0))
    scales = jax.lax.dynamic_update_slice(scales, new_scales, (start,))
    ones = jnp.ones((new.shape[0],), valid.dtype)
    valid = jax.lax.dynamic_update_slice(valid, ones, (start,))
    return emb, scales, valid


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone(valid, idx):
    return valid.at[idx].set(0.0)
