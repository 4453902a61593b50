"""The composed end-to-end curation pipeline — the shape a real LLM
training-data job runs: language filter -> quality filter -> PII redaction ->
exact-dedup keep-one -> deterministic sample, as ONE streaming dataflow.

Composition notes (the point of this module):

* Stages 1-3 FUSE into a single ``map_batches`` pass — the text tokenizes
  once and never leaves the batch; only survivors pay for redaction. No
  shuffle happens until the corpus is already filtered down.
* Dedup is the only exchange: ``groupby(md5)`` elects each duplicate
  cluster's min doc id, and a partitioned hash join brings the election back
  to the surviving rows (broadcastable at small scale, join-scaled at web
  scale).
* The final sample is hash-deterministic (:mod:`.sampling`), so the curated
  set is identical under any partitioning, resume, or rerun.

Every stage reuses the exact kernels of its standalone op, so the composed
SQL twin is just the standalone twins chained as CTEs — bit-exact end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import arrow_tokenize
from .dedup import _md5_low_mod
from .pii import EMAIL_RE, IPV4_RE
from .textstats import LANG_MARKERS


def curate(
    ds, *, min_quality: int = 2, sample_pct: int = 50,
    text_col: str = "text", id_col: str = "doc_id", num_partitions=None,
    attach_pii=None,
):
    """documents -> curated (id, n_tokens, quality_bucket, redacted).

    ``attach_pii``: optional callable(batch)->batch applied to SURVIVORS
    before redaction (the driver entry plants deterministic fake PII there
    since the shared corpus has none)."""
    from ray.data.aggregate import Min

    from .joins import auto_num_partitions

    if num_partitions is None:
        num_partitions = auto_num_partitions()
    markers = pa.array(sorted(LANG_MARKERS["en"]))

    def fused(batch: pa.Table) -> pa.Table:
        import polars as pl

        toks = arrow_tokenize(batch[text_col])
        ntok = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_uniq = (
            pl.from_arrow(pa.table({"t": toks}))["t"].list.n_unique()
        ).to_numpy().astype(np.int64)
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        is_marker = pc.is_in(flat, value_set=markers)
        hits = np.zeros(len(batch), dtype=np.int64)
        pk = parents.filter(is_marker).to_numpy(zero_copy_only=False)
        if len(pk):
            u, c = np.unique(pk, return_counts=True)
            hits[u] = c
        bucket = (
            (ntok >= 20).astype(np.int64)
            + (ntok >= 5).astype(np.int64)
            + (2 * n_uniq >= ntok).astype(np.int64)
        )
        keep = (100 * hits > 8 * ntok) & (bucket >= min_quality)
        sub = pa.table(
            {
                id_col: batch[id_col].filter(pa.array(keep)),
                text_col: pc.fill_null(batch[text_col], "").filter(
                    pa.array(keep)
                ),
                "n_tokens": pa.array(ntok[keep]),
                "quality_bucket": pa.array(bucket[keep]),
            }
        )
        if attach_pii is not None:
            sub = attach_pii(sub)
        red = pc.replace_substring_regex(sub[text_col], EMAIL_RE, "[EMAIL]")
        red = pc.replace_substring_regex(red, IPV4_RE, "[IP]")
        if isinstance(red, pa.ChunkedArray):
            red = red.combine_chunks()
        h = pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in red.to_pylist()]
        )
        return pa.table(
            {
                id_col: sub[id_col],
                "n_tokens": sub["n_tokens"],
                "quality_bucket": sub["quality_bucket"],
                "redacted": red,
                "h": h,
            }
        )

    rows = ds.map_batches(fused, batch_format="pyarrow")
    keepers = (
        rows.groupby("h")
        .aggregate(Min(id_col))
        .map_batches(
            lambda t: pa.table({"keep_id": pc.cast(t[f"min({id_col})"], pa.int64())}),
            batch_format="pyarrow",
        )
    )
    kept = rows.join(
        keepers, join_type="inner", num_partitions=num_partitions,
        on=(id_col,), right_on=("keep_id",),
    )

    def sample(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch[id_col].to_pylist()]
        hv = _md5_low_mod(keys, mod=None) % np.uint64(100)
        out = batch.filter(pa.array(hv < np.uint64(sample_pct)))
        return out.select([id_col, "n_tokens", "quality_bucket", "redacted"])

    return kept.map_batches(sample, batch_format="pyarrow")
