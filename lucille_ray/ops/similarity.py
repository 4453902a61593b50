"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute` — exact cosine top-k: the (small) query matrix is normalized
  once, ``ray.put`` into the object store, and every ``map_batches`` task does one
  float64 numpy matmul per batch, emitting only its batch-local top-k rows. The
  final global top-k reduces ``queries x k x num_batches`` rows — tiny — via a
  plain sort/limit per query on the driver. Nothing ever gathers the full
  embedding table.
* :func:`embedding_near_dups` — EXACT all-pairs cosine threshold sweep as a
  distributed block self-join: normalized blocks live in the object store, one
  Ray task per block pair does the matmul, the driver only ever receives the
  (small) matching pairs. O(B^2) tasks is inherent to the exact contract; the
  approximate scale path is :func:`embedding_near_dups_ann` (IVF-bucketed).
* :class:`IVFIndex` — the ANN scale path: k-means centroids from a random
  sample, assignment as one map_batches pass that writes CLUSTER-PARTITIONED
  parquet, search reads only the probed cluster partitions (pruned at the read,
  never re-scanning the whole table).
"""

from __future__ import annotations

import os
from typing import Optional

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
        nq, nb = sims.shape
        k = min(self.k, nb)
        if nb > k:
            idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]  # vectorized per-query
        else:
            idx = np.broadcast_to(np.arange(nb), (nq, nb)).copy()
        rows = np.repeat(self.query_ids, idx.shape[1])
        return pa.table(
            {
                "query_id": pa.array(rows),
                "neighbor_id": pa.array(ids[idx.ravel()]),
                "sim": pa.array(np.take_along_axis(sims, idx, axis=1).ravel()),
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
    tables = [tb for tb in (ray.get(r) for r in t) if tb.num_rows]
    if not tables:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    allt = pa.concat_tables(tables)
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


def _pair_block(
    ti: pa.Table, tj: pa.Table, same: bool, threshold: float
) -> Optional[pa.Table]:
    """Matmul one block pair; return only the matching (a<b) rows."""
    ids_i = ti["ids"].to_numpy(zero_copy_only=False)
    ids_j = tj["ids"].to_numpy(zero_copy_only=False)
    m_i = _emb_matrix(ti, "emb")
    m_j = _emb_matrix(tj, "emb")
    sims = m_i @ m_j.T
    if same:
        sims = np.triu(sims, k=1)
    ai, bj = np.nonzero(sims >= threshold)
    if not ai.size:
        return None
    a, b = ids_i[ai], ids_j[bj]
    swap = a > b
    return pa.table(
        {
            "a": pa.array(np.where(swap, b, a)),
            "b": pa.array(np.where(swap, a, b)),
            "sim": pa.array(sims[ai, bj]),
        }
    )


def embedding_near_dups(
    ds,
    threshold: float = 0.95,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 4096,
    max_rows: int = 1_000_000,
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (a < b, sim >= threshold), EXACT.

    Distributed block self-join: one streaming pass normalizes each block into
    the object store; then B*(B+1)/2 Ray tasks each pull two blocks (zero-copy
    object-store reads) and emit only their matching pairs. The driver holds
    block *references* and the final (small) pair set — never the embeddings.
    Exact all-pairs is O(N^2) similarity work by contract; ``max_rows`` makes
    a 100x scale-up fail LOUDLY before any quadratic task is scheduled —
    for web-scale near-dup dedup use :func:`embedding_near_dups_ann`
    (or raise the bound explicitly if you really mean exact all-pairs).
    """
    import ray

    def prep(batch: pa.Table):
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        dim = m.shape[1]
        out = pa.table(
            {
                "ids": pa.array(ids),
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), pa.float64()), dim
                ),
            }
        )
        # one output table per block_rows slice -> keeps pair tasks bounded
        for off in range(0, out.num_rows, block_rows):
            yield out.slice(off, block_rows)

    blocks = ds.map_batches(
        prep, batch_size=block_rows, batch_format="pyarrow"
    ).materialize()
    n_rows = blocks.count()  # free on a materialized dataset
    if n_rows > max_rows:
        raise ValueError(
            f"embedding_near_dups is EXACT all-pairs (O(N^2)): input has "
            f"{n_rows} rows > max_rows={max_rows}. Use "
            f"embedding_near_dups_ann for large inputs, or raise max_rows "
            f"to schedule the quadratic task grid deliberately."
        )
    refs = blocks.to_arrow_refs()

    pair_task = ray.remote(num_cpus=1)(_pair_block)
    pending = [
        pair_task.remote(refs[i], refs[j], i == j, threshold)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    out = []
    while pending:
        done, pending = ray.wait(pending, num_returns=min(len(pending), 32))
        for r in ray.get(done):
            if r is not None:
                out.append(r)
    if not out:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    t = pa.concat_tables(out)
    order = pa.compute.sort_indices(
        t, sort_keys=[("a", "ascending"), ("b", "ascending")]
    )
    return t.take(order)


def embedding_near_dups_ann(
    ds,
    threshold: float = 0.95,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    path: Optional[str] = None,
) -> pa.Table:
    """Approximate near-dup pairs: IVF-assign each vector to its ``nprobe``
    nearest clusters (multi-probe closes most boundary misses), shuffle on
    cluster id, all-pairs only WITHIN a cluster. Work drops from O(N^2) to
    sum over clusters of O(|c|^2); recall < 1.0 by design (pairs whose members
    share no probed cluster are missed).
    """
    import ray

    idx = IVFIndex(n_clusters=n_clusters, n_iter=8, seed=seed, path=path)
    cents = idx._fit_centroids(ds, emb_col=emb_col)
    cent_ref = ray.put(cents)
    nprobe = min(nprobe, len(cents))

    def assign_multi(batch: pa.Table):
        cc = ray.get(cent_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        dim = m.shape[1]
        top = np.argsort(-(m @ cc.T), axis=1)[:, :nprobe].astype(np.int32)
        rep_ids = np.repeat(ids, nprobe)
        rep_emb = np.repeat(m, nprobe, axis=0)
        return pa.table(
            {
                "cluster": pa.array(top.ravel()),
                "ids": pa.array(rep_ids),
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(rep_emb.ravel(), pa.float64()), dim
                ),
            }
        )

    assigned = ds.map_batches(assign_multi, batch_format="pyarrow")

    def per_cluster(group: pa.Table) -> pa.Table:
        r = _pair_block(group, group, True, threshold)
        if r is None:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return r

    pairs = assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )
    t = pa.concat_tables(
        [tb for tb in (ray.get(r) for r in pairs.to_arrow_refs()) if tb.num_rows]
        or [
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ]
    )
    # multi-probe duplicates the same pair in up to nprobe clusters -> dedup
    import pyarrow.compute as pc

    order = pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    t = t.take(order)
    if t.num_rows:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        t = t.filter(pa.array(keep))
    return t


class IVFIndex:
    """Inverted-file ANN over cluster-partitioned parquet.

    ``fit`` learns spherical k-means centroids from a RANDOM sample (not the
    first N rows — sorted inputs would bias centroids), assigns every vector in
    one ``map_batches`` pass, and writes the assigned table as parquet
    partitioned by cluster id. ``search`` lists only the probed cluster
    directories and reads just those — partition-pruned at the read, no filter
    re-scan of the whole table. Resumable/serveable: the parquet store IS the
    index; a fresh process can attach with :meth:`load`.
    """

    def __init__(
        self,
        n_clusters: int = 16,
        n_iter: int = 10,
        seed: int = 42,
        path: Optional[str] = None,
    ):
        self.n_clusters = n_clusters
        self.n_iter = n_iter
        self.seed = seed
        self.path = path
        self.centroids: Optional[np.ndarray] = None
        self._emb_col = "embedding"
        self._id_col = "vec_id"

    # -- internals --

    def _sample(self, ds, emb_col: str, sample_limit: int) -> np.ndarray:
        n = ds.count()
        if n <= sample_limit:
            sample = ds.to_pandas()
        else:
            frac = min(1.0, (sample_limit * 1.25) / max(n, 1))
            sample = ds.random_sample(frac, seed=self.seed).limit(sample_limit).to_pandas()
        return _normalize(np.stack(sample[emb_col].to_numpy()))

    def _fit_centroids(
        self, ds, *, emb_col: str = "embedding", sample_limit: int = 20000
    ) -> np.ndarray:
        m = self._sample(ds, emb_col, sample_limit)
        rng = np.random.default_rng(self.seed)
        k = min(self.n_clusters, m.shape[0])
        cents = m[rng.choice(m.shape[0], k, replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(m @ cents.T, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    v = m[mask].mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        cents[c] = v / nv
        self.centroids = cents
        return cents

    def fit(
        self,
        ds,
        *,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
        sample_limit: int = 20000,
    ):
        import ray

        cents = self._fit_centroids(ds, emb_col=emb_col, sample_limit=sample_limit)
        cent_ref = ray.put(cents)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cc = ray.get(cent_ref)
            mm = _normalize(_emb_matrix(batch, emb_col))
            cl = np.argmax(mm @ cc.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cl))

        if self.path is None:
            import tempfile

            self.path = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
        store = os.path.join(self.path, "clusters")
        ds.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
            store, partition_cols=["cluster"]
        )
        np.save(os.path.join(self.path, "centroids.npy"), cents)
        self._emb_col, self._id_col = emb_col, id_col
        return self

    @classmethod
    def load(cls, path: str, *, emb_col: str = "embedding", id_col: str = "vec_id"):
        idx = cls(path=path)
        idx.centroids = np.load(os.path.join(path, "centroids.npy"))
        idx.n_clusters = len(idx.centroids)
        idx._emb_col, idx._id_col = emb_col, id_col
        return idx

    def search(self, query_ids, query_matrix, k: int = 10, nprobe: int = 4) -> pa.Table:
        assert self.centroids is not None and self.path is not None, "call fit() first"
        import ray.data

        q = _normalize(np.asarray(query_matrix))
        nprobe = min(nprobe, len(self.centroids))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted({int(c) for row in probes for c in row})
        store = os.path.join(self.path, "clusters")
        import glob as _glob

        paths = [
            f
            for c in wanted
            for f in sorted(
                _glob.glob(os.path.join(store, f"cluster={c}", "*.parquet"))
            )
        ]
        if not paths:
            return knn_brute(
                ray.data.from_arrow(
                    pa.table({self._id_col: pa.array([], pa.int64()),
                              self._emb_col: pa.array([], pa.list_(pa.float64()))})
                ),
                query_ids, query_matrix, k,
                emb_col=self._emb_col, id_col=self._id_col,
            )
        sub = ray.data.read_parquet(paths, columns=[self._id_col, self._emb_col])
        return knn_brute(
            sub, query_ids, query_matrix, k,
            emb_col=self._emb_col, id_col=self._id_col,
        )
