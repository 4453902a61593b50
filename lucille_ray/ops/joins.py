"""Ordered join operators the Dataset API lacks: per-key AS-OF (previous-event)
join and bounded interval (range) join.

Both are expressed as ``groupby(key).map_groups`` with a vectorized in-group
kernel — the same partitioning contract as :mod:`.sessions`: ONE group sees all
rows of a key (Ray's groupby shuffle guarantees it), so correctness needs no
global sort, and the per-group kernel is ``searchsorted``/``shift`` over numpy
arrays, never a Python row loop. Skew is bounded by per-key row counts, not
corpus size; a pathological key can be salted upstream by windowing time.

At a 100 TB event stream the same kernels apply unchanged: the groupby is the
single all-to-all, moving only the projected join columns (prune at read).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def asof_prev_event(ds, *, key_col: str = "user_id", ts_col: str = "ts"):
    """AS-OF self-join: each event matched with the same user's most recent
    STRICTLY earlier event (inner semantics: a user's first event emits no row).

    Output: (event_id, user_id, ts, prev_event_id, prev_ts, prev_type, gap_us)
    with ``gap_us`` the exact int64 microsecond gap. Ties are impossible under
    the (user, ts)-unique events contract; order within a user is (ts, event_id)
    like the SQL oracle's ASOF JOIN.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[1:],
                key_col: g[key_col].to_numpy()[1:],
                ts_col: ts[1:],
                "prev_event_id": g["event_id"].to_numpy()[:-1],
                "prev_ts": ts[:-1],
                "prev_type": g["event_type"].to_numpy()[:-1],
                "gap_us": (ts[1:] - ts[:-1]).astype(np.int64),
            }
        )
        out["event_id"] = out["event_id"].astype("int64")
        out["prev_event_id"] = out["prev_event_id"].astype("int64")
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def range_count_nearby(
    ds, window_seconds: int = 21_600, *, key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Bounded interval (range) self-join: for every event, the count of the
    same user's events within ``±window_seconds`` (inclusive, self included).

    The in-group kernel is two ``searchsorted`` calls over the user's sorted
    timestamps — O(n log n) per group versus the O(n²) pair blow-up a naive
    range join materializes.
    """
    w = np.timedelta64(int(window_seconds), "s").astype("timedelta64[us]")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].to_numpy().astype("datetime64[us]"))
        mine = g[ts_col].to_numpy().astype("datetime64[us]")
        n = (
            np.searchsorted(ts, mine + w, side="right")
            - np.searchsorted(ts, mine - w, side="left")
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy().astype("int64"),
                "n_nearby": n.astype("int64"),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


ASOF_PREV_EVENT_SQL = """
SELECT a.event_id, a.user_id, a.ts,
       b.event_id AS prev_event_id, b.ts AS prev_ts, b.event_type AS prev_type,
       CAST(date_diff('microsecond', b.ts, a.ts) AS BIGINT) AS gap_us
FROM events a ASOF JOIN events b
  ON a.user_id = b.user_id AND b.ts < a.ts
""".strip()


RANGE_COUNT_NEARBY_SQL = """
SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_nearby
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL {w} SECOND AND a.ts + INTERVAL {w} SECOND
GROUP BY a.event_id
""".strip()
