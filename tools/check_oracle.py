"""Local mirror of the driver's correctness gate: run every __ray_entry__ query
AND its DuckDB oracle on one sf dir, compare row count, schema (column names) and
order-insensitive values. Usage:  python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_table(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    return obj.to_arrow_refs and _ds_to_table(obj)


def _ds_to_table(ds):
    import pyarrow as pa
    import ray

    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    live = [t for t in tables if t.num_rows]
    return pa.concat_tables(live) if live else tables[0]


def canon(t):
    """Sort columns by name, rows by all columns -> comparable pandas frame."""
    t = to_table(t)
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main():
    import duckdb
    import ray

    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv  # mimic the driver: bit-exact dtypes + values
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray pipeline raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ray_s = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows, cols={list(got.columns)} ({ray_s:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetch_arrow_table())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        try:
            import pandas.testing as pdt

            if strict:
                pdt.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
            else:
                pdt.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-12)
            print(f"OK   {name}: {len(got)} rows ({ray_s:.1f}s)")
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
