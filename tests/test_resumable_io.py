"""Resumable partitioned output: crashed partitions are wiped + rewritten,
completed partitions are skipped, and re-runs never duplicate rows."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from lucille_ray.io import completed_partitions, resumable_write


def _ds(n=1000):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([i % 4 for i in range(n)], pa.int32()),
                "v": pa.array(range(n), pa.int64()),
            }
        )
    )


def _read_all(path):
    t = pq.read_table(path)
    return sorted(t["v"].to_pylist())


def test_resumable_write_completes_and_is_idempotent(ray_session, tmp_path):
    out = str(tmp_path / "out")
    done = resumable_write(_ds(), out, "k")
    assert done == ["0", "1", "2", "3"]
    assert _read_all(out) == list(range(1000))
    # full re-run: everything skipped, zero duplicates
    resumable_write(_ds(), out, "k")
    assert _read_all(out) == list(range(1000))


def test_resumable_write_recovers_crashed_partition(ray_session, tmp_path):
    import json

    out = str(tmp_path / "out")
    resumable_write(_ds(), out, "k")
    # simulate a crash during partition k=2: files half-written, manifest
    # doesn't list it
    mf = os.path.join(out, "_PARTITIONS.json")
    m = json.load(open(mf))
    m["done"].remove("2")
    json.dump(m, open(mf, "w"))
    part = os.path.join(out, "k=2")
    for f in os.listdir(part)[1:]:
        os.remove(os.path.join(part, f))  # mangle the partition
    assert completed_partitions(out) == ["0", "1", "3"]
    resumable_write(_ds(), out, "k")
    assert _read_all(out) == list(range(1000))
    assert completed_partitions(out) == ["0", "1", "2", "3"]
