"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute` — exact cosine top-k: the (small) query matrix is normalized
  once, ``ray.put`` into the object store, and every ``map_batches`` task does one
  float64 numpy matmul per batch, emitting only its batch-local top-k rows. The
  final global top-k reduces ``queries x k x num_batches`` rows — tiny — via a
  plain sort/limit per query on the driver. Nothing ever gathers the full
  embedding table.
* :class:`IVFIndex` — the scale path: a driver-side k-means (on a sample) gives
  centroids; assignment is one more map_batches; queries probe only ``nprobe``
  nearest clusters. Same batch-local top-k reduction, over a pruned candidate set.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


class _BatchTopK:
    """map_batches callable: queries broadcast once per actor via object ref."""

    def __init__(self, query_ref, k: int, emb_col: str, id_col: str):
        import ray

        self.query_ids, q = ray.get(query_ref)
        self.q = _normalize(q)
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, self.emb_col))
        sims = self.q @ m.T  # (nq, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            if row.size > k:
                idx = np.argpartition(-row, k - 1)[:k]
            else:
                idx = np.arange(row.size)
            out_q.append(np.full(idx.size, self.query_ids[qi], dtype=np.int64))
            out_n.append(ids[idx])
            out_s.append(row[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def knn_brute(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k for each query row; returns (query_id, neighbor_id, sim)
    sorted by (query_id, sim desc, neighbor_id)."""
    import ray

    query_ref = ray.put((np.asarray(query_ids, np.int64), np.asarray(query_matrix)))
    partial = ds.map_batches(
        _BatchTopK,
        fn_constructor_args=(query_ref, k, emb_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    t = partial.to_arrow_refs()
    tables = [ray.get(r) for r in t]
    allt = pa.concat_tables([tb for tb in tables if tb.num_rows])
    qs = allt["query_id"].to_numpy()
    ns = allt["neighbor_id"].to_numpy()
    ss = allt["sim"].to_numpy()
    out_q, out_n, out_s, out_r = [], [], [], []
    for q in np.unique(qs):
        m = qs == q
        order = np.lexsort((ns[m], -ss[m]))[:k]
        out_q.append(np.full(order.size, q))
        out_n.append(ns[m][order])
        out_s.append(ss[m][order])
        out_r.append(np.arange(1, order.size + 1))
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "sim": pa.array(np.concatenate(out_s)),
            "rank": pa.array(np.concatenate(out_r).astype(np.int64)),
        }
    )


def embedding_near_dups(
    ds,
    threshold: float = 0.95,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 4096,
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (a < b, sim >= threshold).

    Block-matmul sweep: the dataset streams once; each batch is compared (float64
    numpy matmul) against every later block, which the driver holds one at a time
    — O(N^2/2) similarity work with O(block) memory. At real scale, route blocks
    through :class:`IVFIndex` clusters first so only same/neighbor-cluster blocks
    multiply (the candidate-pruned variant of the same kernel).
    """
    blocks = []
    for batch in ds.iter_batches(batch_size=block_rows, batch_format="pyarrow"):
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        blocks.append((ids, m))
    out_a, out_b, out_s = [], [], []
    for i, (ids_i, m_i) in enumerate(blocks):
        for j in range(i, len(blocks)):
            ids_j, m_j = blocks[j]
            sims = m_i @ m_j.T
            if i == j:
                sims = np.triu(sims, k=1)
            ai, bj = np.nonzero(sims >= threshold)
            if ai.size:
                a = ids_i[ai]
                b = ids_j[bj]
                swap = a > b
                a2 = np.where(swap, b, a)
                b2 = np.where(swap, a, b)
                out_a.append(a2)
                out_b.append(b2)
                out_s.append(sims[ai, bj])
    if not out_a:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a)),
            "b": pa.array(np.concatenate(out_b)),
            "sim": pa.array(np.concatenate(out_s)),
        }
    )


class IVFIndex:
    """Inverted-file ANN: k-means centroids from a driver-side sample, cluster
    assignment as a map_batches pass, probe-limited search."""

    def __init__(self, n_clusters: int = 16, n_iter: int = 10, seed: int = 42):
        self.n_clusters = n_clusters
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None
        self._assigned = None  # Dataset of (vec_id, cluster, embedding)

    def fit(self, ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
            sample_limit: int = 20000):
        sample = ds.limit(sample_limit).to_pandas()
        m = _normalize(np.stack(sample[emb_col].to_numpy()))
        rng = np.random.default_rng(self.seed)
        k = min(self.n_clusters, m.shape[0])
        cents = m[rng.choice(m.shape[0], k, replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(m @ cents.T, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    v = m[mask].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cents[c] = v / n
        self.centroids = cents

        import ray

        cent_ref = ray.put(cents)

        def assign_batch(batch: pa.Table) -> pa.Table:
            import ray as _ray

            cc = _ray.get(cent_ref) if isinstance(cent_ref, _ray.ObjectRef) else cent_ref
            mm = _normalize(_emb_matrix(batch, emb_col))
            cl = np.argmax(mm @ cc.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cl))

        self._assigned = ds.map_batches(assign_batch, batch_format="pyarrow").materialize()
        self._emb_col, self._id_col = emb_col, id_col
        return self

    def search(self, query_ids, query_matrix, k: int = 10, nprobe: int = 4) -> pa.Table:
        assert self._assigned is not None, "call fit() first"
        q = _normalize(np.asarray(query_matrix))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted({int(c) for row in probes for c in row})
        import pyarrow.compute as pc

        wanted_arr = pa.array(wanted, pa.int32())
        sub = self._assigned.map_batches(
            lambda t: t.filter(pc.is_in(t["cluster"], value_set=wanted_arr)),
            batch_format="pyarrow",
        )
        return knn_brute(
            sub, query_ids, query_matrix, k,
            emb_col=self._emb_col, id_col=self._id_col,
        )
