"""Relational aggregate showcase: a TPC-H Q1-shaped pricing summary.

Demonstrates the canonical scale pattern for wide aggregations: a vectorized
``map_batches`` PARTIAL aggregate (one row per group per batch) feeding a tiny
final ``groupby`` — the shuffle moves #groups x #batches rows, not the table.

Money math is integer-exact (cents / basis points), so partial sums are
ORDER-FREE and the DuckDB oracle matches bit-for-bit: TPC-H prices/discounts/
taxes are 2-decimal, so ``extprice*(1-disc)`` in units of 1e-4 and
``extprice*(1-disc)*(1+tax)`` in units of 1e-6 are exact int64 products.
(At 10^12-row scale the 1e-6-unit sums would need a hugeint/decimal128
accumulator; int64 holds to ~10^9 rows per group.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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
        )
        return g.to_arrow()

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("q"), Sum("bp"), Sum("dp"), Sum("ch"), Sum("n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bp = t["sum(bp)"].to_numpy(zero_copy_only=False).astype(np.int64)
        dp = t["sum(dp)"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = t["sum(ch)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.cast(t["sum(q)"], pa.int64()),
                "sum_base_price": pa.array(bp / 100.0),
                "sum_disc_price": pa.array(dp / 10000.0),
                "sum_charge": pa.array(ch / 1000000.0),
                "count_order": pc.cast(t["sum(n)"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


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
