"""Deterministic sampling and mergeable distinct-count sketches.

Both ops ride the repo's exact integer hash contract (DuckDB's
``md5_number_lower`` = little-endian int of md5 digest bytes [8:16], folded
mod P31 — see ops/dedup.py), so their outputs are bit-reproducible in SQL and
across any partitioning/order of the input:

* :func:`hash_sample` — hash-based row sampling (the train/eval-split
  primitive): a row's fate depends only on its key, never on partitioning,
  so a re-run, a resumed run, and a differently-sharded run all select the
  SAME sample.
* :func:`kmv_distinct` — K-Minimum-Values distinct-count sketch per group.
  The mergeable-sketch pattern for distributed COUNT(DISTINCT): each batch
  contributes its k smallest distinct key hashes (shuffle volume is
  O(groups x k) per batch, never the key set), partials union losslessly,
  and the estimate ``(k-1) / kth_min_normalized`` is deterministic — unlike
  probabilistic HLL implementations, every intermediate here is an exact
  integer, which is what makes the driver's bit-exact SQL check possible.
  Groups with fewer than k distinct keys degrade to the EXACT count (the
  unioned partials then contain every distinct hash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import P31, _md5_low_mod


def hash_sample(ds, pct: int = 10, *, key_col: str = "doc_id", mod: int = 100):
    """Keep rows whose ``md5_number_lower(str(key)) % mod < pct`` —
    a deterministic, partition-independent ``pct/mod`` sample."""

    def filt(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch[key_col].to_pylist()]
        hv = _md5_low_mod(keys, mod=None) % np.uint64(mod)
        return batch.filter(pa.array(hv < np.uint64(pct)))

    return ds.map_batches(filt, batch_format="pyarrow")


def hash_sample_sql(
    pct: int = 10, *, table: str = "documents", key_col: str = "doc_id",
    mod: int = 100, columns: str = "*",
) -> str:
    return (
        f"SELECT {columns} FROM {table} "
        f"WHERE md5_number_lower(CAST({key_col} AS VARCHAR)) % {mod} < {pct}"
    )


def kmv_distinct(ds, k: int = 64, *, group_col: str = "event_type",
                 key_col: str = "user_id"):
    """Per-group KMV distinct-count sketch over ``key_col``.

    Output: ``(group_col, kth_hash, est_distinct_r)`` — the k-th smallest
    distinct key hash and the rounded estimate ``(k-1) * P31 / (kth + 1)``
    (exact count when a group has fewer than k distinct keys).
    """

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = (
            pl.from_arrow(batch.select([group_col, key_col]))
            .unique(maintain_order=False)
        )
        keys = [str(v) for v in t[key_col].to_list()]
        uniq, inv = np.unique(np.asarray(keys, dtype=object), return_inverse=True)
        hv = _md5_low_mod(list(uniq), mod=P31).astype(np.int64)[inv]
        return (
            pl.DataFrame({group_col: t[group_col], "hv": hv})
            .unique()  # two keys in a group may collide to one hash
            .sort([group_col, "hv"])
            .group_by(group_col, maintain_order=True)
            .head(k)
            .to_arrow()
        )

    def finish(g):
        import pandas as pd

        hv = np.unique(g["hv"].to_numpy().astype(np.int64))
        m = min(k, hv.size)
        kth = int(hv[m - 1])
        if m < k:
            est = float(hv.size)
        else:
            est = (k - 1) * float(P31) / (kth + 1)
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "kth_hash": np.array([kth], np.int64),
                "est": np.array([est], np.float64),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finish, batch_format="pandas")
    )

    def round4(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                group_col: t[group_col],
                "kth_hash": t["kth_hash"],
                "est_distinct_r": pc.round(t["est"], 4),
            }
        )

    return out.map_batches(round4, batch_format="pyarrow")


def kmv_distinct_sql(
    k: int = 64, *, table: str = "events", group_col: str = "event_type",
    key_col: str = "user_id",
) -> str:
    return f"""WITH h AS (
  SELECT DISTINCT {group_col},
         CAST(md5_number_lower(CAST({key_col} AS VARCHAR)) % {P31} AS BIGINT) AS hv
  FROM {table}
),
r AS (
  SELECT {group_col}, hv,
         row_number() OVER (PARTITION BY {group_col} ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY {group_col}) AS nd
  FROM h
)
SELECT {group_col},
       CAST(max(hv) AS BIGINT) AS kth_hash,
       round(CASE WHEN count(*) < {k} THEN CAST(max(nd) AS DOUBLE)
                  ELSE ({k} - 1) * {float(P31)!r} / (max(hv) + 1) END, 4)
         AS est_distinct_r
FROM r WHERE rn <= {k}
GROUP BY {group_col}"""


def stratified_sample(ds, rates: dict, default_pct: int = 5, *,
                      group_col: str = "event_type", key_col: str = "event_id",
                      mod: int = 100):
    """Per-stratum deterministic hash sampling — downsample over-represented
    strata while keeping rare ones (the class-rebalancing primitive): a row
    survives iff ``hash(key) % mod < rates.get(its group, default_pct)``.
    Same partition-independence guarantee as :func:`hash_sample`; the rate
    lookup is vectorized over the batch."""

    def filt(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch[key_col].to_pylist()]
        hv = _md5_low_mod(keys, mod=None) % np.uint64(mod)
        groups = batch[group_col].to_pylist()
        pct = np.fromiter(
            (rates.get(g, default_pct) for g in groups), np.uint64, len(groups)
        )
        return batch.filter(pa.array(hv < pct))

    return ds.map_batches(filt, batch_format="pyarrow")


def stratified_sample_sql(rates: dict, default_pct: int = 5, *,
                          table: str = "events", group_col: str = "event_type",
                          key_col: str = "event_id", mod: int = 100,
                          columns: str = "*") -> str:
    whens = " ".join(
        f"WHEN '{g}' THEN {p}" for g, p in sorted(rates.items())
    )
    return (
        f"SELECT {columns} FROM {table} "
        f"WHERE md5_number_lower(CAST({key_col} AS VARCHAR)) % {mod} "
        f"< CASE {group_col} {whens} ELSE {default_pct} END"
    )
