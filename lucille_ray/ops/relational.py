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

    def per_key(g):
        import pandas as pd

        g = g.sort_values([val_col, id_col], ascending=[False, True],
                          kind="stable").head(k)
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                id_col: g[id_col].to_numpy(),
                "rk": np.arange(1, len(g) + 1, dtype=np.int64),
                val_col: g[val_col].to_numpy(),
            }
        )

    return (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
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
                    val_col: str = "value"):
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: the sorted element at index ``ceil(q*n) - 1``).

    Scale shape: ``groupby(group).map_groups`` with one vectorized sort per
    group — bounded by the group's row count, the same partitioning contract
    as sessionize/joins. (A group too big for one worker would switch to a
    distributed sort + rank select, or a mergeable KLL sketch for approximate
    quantiles; the event-type groups here are nowhere near that.)"""
    import math

    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[val_col].to_numpy())
        n = v.size
        row = {
            group_col: [g[group_col].iloc[0]],
            "n": np.array([n], np.int64),
        }
        for q in qs:
            row[f"q{int(round(q * 100))}"] = np.array(
                [v[min(n - 1, math.ceil(q * n) - 1)]]
            )
        return pd.DataFrame(row)

    return ds.groupby(group_col).map_groups(per_key, batch_format="pandas")


GROUP_QUANTILES_SQL = """
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
       quantile_disc({val_col}, 0.5) AS q50,
       quantile_disc({val_col}, 0.95) AS q95
FROM {table}
GROUP BY {group_col}
""".strip()
