"""Resumable partitioned parquet output.

The pattern the 100 TB brief asks for: output lands as one directory per
partition key, with a manifest recording COMPLETED partitions — a failed run
re-executes only the missing partitions, and stale half-written partition dirs
(crashed mid-write, so absent from the manifest) are wiped before the retry so
parquet appends can never duplicate rows.

The index build has its own per-segment manifests (index/build.py); this is the
generic helper for operator outputs (dedup pair sets, window aggregates, ...).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List

import pyarrow as pa


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_PARTITIONS.json")


def completed_partitions(path: str) -> List[str]:
    try:
        with open(_manifest_path(path)) as f:
            return list(json.load(f)["done"])
    except (OSError, json.JSONDecodeError, KeyError):
        return []


def resumable_write(ds, path: str, partition_col: str) -> List[str]:
    """Write ``ds`` as parquet partitioned by ``partition_col``, skipping
    partitions a previous (possibly crashed) run already completed.

    Returns the full list of completed partition values (as the string form
    hive partitioning uses). Safe to re-run: a no-op when everything is done.
    """
    os.makedirs(path, exist_ok=True)
    done = set(completed_partitions(path))

    # wipe half-written partitions (present on disk but not committed)
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if os.path.isdir(full) and name.startswith(f"{partition_col}="):
            value = name.split("=", 1)[1]
            if value not in done:
                shutil.rmtree(full)

    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(sorted(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            vals = pc.cast(batch[partition_col], pa.string())
            return batch.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    ds.write_parquet(path, partition_cols=[partition_col])

    now_done = sorted(
        name.split("=", 1)[1]
        for name in os.listdir(path)
        if os.path.isdir(os.path.join(path, name))
        and name.startswith(f"{partition_col}=")
    )
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"partition_col": partition_col, "done": now_done}, f, indent=1)
    os.replace(tmp, _manifest_path(path))  # atomic commit
    return now_done
