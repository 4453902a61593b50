"""Bulk query scoring as a Ray Data pipeline: queries-as-data.

For workloads where the queries themselves are a Dataset (relevance labeling,
training-data curation sweeps, offline eval), ``score_query_dataset`` runs an
actor-pool ``map_batches`` where each actor pins a full in-process
:class:`SearchEngine` once (``__init__``) and scores its query batches locally —
the canonical stateful-stage shape, complementing the per-query
``SearchEngine.search`` path (driver-latency-oriented, pinned scorer actors).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


class QueryScorerStage:
    """map_batches callable class: one pinned engine per actor."""

    def __init__(self, index_dir: str, k: int = 10, query_col: str = "query"):
        from .engine import SearchEngine

        self.engine = SearchEngine(index_dir, parallel=False)
        self.k = k
        self.query_col = query_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..query.parser import ParseError

        queries = batch[self.query_col].to_pylist()
        out_q, out_rank, out_doc, out_score, out_err = [], [], [], [], []
        for qs in queries:
            try:
                t = self.engine.search(qs, k=self.k, with_meta=False)
                n = t.num_rows
                out_q.extend([qs] * n)
                out_rank.extend(range(1, n + 1))
                out_doc.extend(t["doc_id"].to_pylist())
                out_score.extend(t["score"].to_pylist())
                out_err.extend([""] * n)
            except ParseError as e:
                out_q.append(qs)
                out_rank.append(0)
                out_doc.append(-1)
                out_score.append(0.0)
                out_err.append(str(e).splitlines()[0])
        return pa.table(
            {
                "query": pa.array(out_q, pa.string()),
                "rank": pa.array(out_rank, pa.int32()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "score": pa.array(out_score, pa.float64()),
                "error": pa.array(out_err, pa.string()),
            }
        )


def score_query_dataset(
    index_dir: str,
    queries_ds,
    *,
    k: int = 10,
    query_col: str = "query",
    concurrency=(1, 4),
    batch_size: Optional[int] = 64,
):
    """Dataset of query strings -> Dataset of (query, rank, doc_id, score, error)."""
    return queries_ds.map_batches(
        QueryScorerStage,
        fn_constructor_args=(index_dir, k, query_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
