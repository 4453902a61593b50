"""Windowed/stateful event operators: gap-based sessionization.

The canonical "custom operator the Dataset API lacks" (SURVEY.md §2.E): a
per-key ordered stateful pass, expressed as ``groupby(user_id).map_groups`` with
a vectorized in-group kernel. The partitioning assumption it relies on: one
group sees ALL events of a user (Ray's groupby guarantees it); skewed users are
bounded by per-user event counts, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(
    ds,
    gap_seconds: int = 6 * 3600,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """events -> one row per (user, session): a new session starts when the gap
    since the user's previous event exceeds ``gap_seconds``.

    Output: (user_id, session_idx, n_events, start_ts, end_ts, total_value_r).
    Events are ordered by (ts, event_id) within a user — the same deterministic
    order the SQL oracle's window uses.
    """

    import pyarrow.compute as pc

    def per_user(g: pa.Table) -> pa.Table:
        # Arrow-native (no per-group pandas conversion, VERDICT r02 #4): sort
        # once, then sessions are contiguous runs -> segment reductions.
        order = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        ts = g[ts_col].combine_chunks().cast(pa.timestamp("us"))
        ts_np = ts.to_numpy(zero_copy_only=False)
        val = g[value_col].to_numpy(zero_copy_only=False)
        # same truncation semantics as the SQL twin's epoch() on this corpus
        gaps = np.diff(ts_np).astype("timedelta64[s]").astype(np.int64)
        new_session = np.concatenate([[0], (gaps > gap_seconds).astype(np.int64)])
        sid = np.cumsum(new_session)
        starts = np.flatnonzero(np.concatenate([[1], new_session[1:]]))
        ends = np.append(starts[1:], len(sid))
        # per-session sequential sum (reduceat walks left-to-right in ts order,
        # the same accumulation order as the oracle's scan)
        total = np.add.reduceat(val, starts)
        return pa.table(
            {
                user_col: g[user_col].take(pa.array(starts)),
                "session_idx": pa.array(sid[starts].astype(np.int64)),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "start_ts": pa.array(ts_np[starts], pa.timestamp("us")),
                "end_ts": pa.array(ts_np[ends - 1], pa.timestamp("us")),
                "total_value_r": pa.array(np.round(total, 4)),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


def tumbling_window_agg(
    ds,
    window_seconds: int = 3600,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Tumbling-window aggregate: one row per (user, epoch-aligned window) with
    event count and value sum. The window key is computed INSIDE map_batches
    (cheap, vectorized) so the only wide step is the final groupby - and the
    per-batch partial pre-aggregation means the shuffle moves one row per
    (user, window, batch), not per event.

    Values are summed as integer CENTS (exact, ORDER-FREE - float partial sums
    reassociate across batches and can flip a rounded digit vs the oracle)."""
    import pyarrow.compute as pc_

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        ts_us = batch[ts_col].cast(pa.timestamp("us"))  # unit-normalize (ns inputs)
        epoch = ts_us.cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        win = (epoch // window_seconds) * window_seconds
        cents = np.rint(
            batch[value_col].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                user_col: batch[user_col],
                "window_start": pa.array(win.astype(np.int64)),
                "n": pa.array(np.ones(len(batch), np.int64)),
                "vc": pa.array(cents),
            }
        )
        g = (
            pl.from_arrow(t)
            .group_by([user_col, "window_start"])
            .agg(pl.col("n").sum(), pl.col("vc").sum())
        )
        return g.to_arrow()

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([user_col, "window_start"])
        .aggregate(Sum("n"), Sum("vc"))
    )

    def finish(t: pa.Table) -> pa.Table:
        cents = t["sum(vc)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                user_col: t[user_col],
                "window_start": t["window_start"],
                "n_events": pc_.cast(t["sum(n)"], pa.int64()),
                "total_value_r": pa.array(cents / 100.0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


TUMBLING_WINDOW_SQL = """
SELECT user_id,
       CAST(floor(epoch(ts) / {w}) AS BIGINT) * {w} AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value_r
FROM events
GROUP BY user_id, CAST(floor(epoch(ts) / {w}) AS BIGINT) * {w}
""".strip()


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts - lag(ts) OVER w) > {gap} THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       round(sum(value), 4) AS total_value_r
FROM numbered
GROUP BY user_id, session_idx
""".strip()
