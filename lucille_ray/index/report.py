"""Structured build/index report: one JSON-able dict aggregating everything
the build and compaction record about an index — metadata, per-phase wall
times, per-segment manifests and live stats, on-disk footprint, lifecycle
state (tombstones, purges, appends).

This is the metrics/lineage surface: scaling and health claims should be
corroborated by these per-stage numbers (plus each segment's Ray Data
``stage_stats.txt``), not only end-to-end wall clock.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

_TIME_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}

_OP_RE = re.compile(
    r"^Operator \d+ (?P<name>.+?): (?P<tasks>\d+) tasks executed, "
    r"(?P<blocks>\d+) blocks produced in (?P<wall>[\d.]+)(?P<unit>us|ms|s)$"
)
_TOTAL_RE = re.compile(
    r"^\* (?P<what>Remote wall time|Remote cpu time|UDF time): .*?"
    r"(?P<total>[\d.]+)(?P<unit>us|ms|s) total$"
)
_ROWS_RE = re.compile(r"^\* Output num rows per block: .* (?P<total>\d+) total$")
_BYTES_RE = re.compile(r"^\* Output size bytes per block: .* (?P<total>\d+) total$")
_THROUGHPUT_RE = re.compile(r"^\* Ray Data throughput: (?P<v>[\d.eE+-]+) rows/s$")

_TOTAL_KEY = {
    "Remote wall time": "remote_wall_sec",
    "Remote cpu time": "remote_cpu_sec",
    "UDF time": "udf_sec",
}


def parse_stage_stats(text: str) -> list[dict]:
    """Parse Ray Data's ``ds.stats()`` text into one structured dict per
    operator: task/block counts, operator wall clock, total remote wall/cpu/
    UDF seconds, output rows/bytes, throughput, and the derived
    ``effective_parallelism`` (total remote wall / operator wall — the
    per-stage number scaling claims should cite)."""
    ops: list[dict] = []
    cur: Optional[dict] = None
    for raw in text.splitlines():
        line = raw.strip()
        m = _OP_RE.match(line)
        if m:
            cur = {
                "operator": m["name"],
                "tasks": int(m["tasks"]),
                "blocks": int(m["blocks"]),
                "wall_sec": round(float(m["wall"]) * _TIME_UNIT[m["unit"]], 6),
            }
            ops.append(cur)
            continue
        if cur is None:
            continue
        if line.startswith("Dataset throughput"):
            cur = None
            continue
        m = _TOTAL_RE.match(line)
        if m:
            cur[_TOTAL_KEY[m["what"]]] = round(
                float(m["total"]) * _TIME_UNIT[m["unit"]], 6
            )
            continue
        m = _ROWS_RE.match(line)
        if m:
            cur["output_rows"] = int(m["total"])
            continue
        m = _BYTES_RE.match(line)
        if m:
            cur["output_bytes"] = int(m["total"])
            continue
        m = _THROUGHPUT_RE.match(line)
        if m and "rows_per_sec" not in cur:
            cur["rows_per_sec"] = round(float(m["v"]), 1)
    for op in ops:
        wall = op.get("wall_sec") or 0.0
        if wall > 0 and "remote_wall_sec" in op:
            op["effective_parallelism"] = round(op["remote_wall_sec"] / wall, 2)
    return ops


def _aggregate_stages(per_segment: list[list[dict]]) -> list[dict]:
    """Sum each operator's numbers across segments (keyed by operator name,
    in first-seen order) — the index-level per-stage rollup."""
    order: list[str] = []
    agg: dict[str, dict] = {}
    for stages in per_segment:
        for op in stages:
            name = op["operator"]
            if name not in agg:
                order.append(name)
                agg[name] = {"operator": name, "segments": 0}
            a = agg[name]
            a["segments"] += 1
            for k in ("tasks", "blocks", "wall_sec", "remote_wall_sec",
                      "remote_cpu_sec", "udf_sec", "output_rows",
                      "output_bytes"):
                if k in op:
                    a[k] = round(a.get(k, 0) + op[k], 6)
    for a in agg.values():
        wall = a.get("wall_sec") or 0.0
        if wall > 0 and "remote_wall_sec" in a:
            a["effective_parallelism"] = round(a["remote_wall_sec"] / wall, 2)
    return [agg[n] for n in order]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def build_report(index_dir: str) -> dict:
    """Aggregate an index directory into one structured report dict."""
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        meta = json.load(f)

    metrics: Optional[dict] = None
    mpath = os.path.join(index_dir, "build_metrics.json")
    if os.path.isfile(mpath):
        with open(mpath) as f:
            metrics = json.load(f)

    segments = []
    seg_root = os.path.join(index_dir, "segments")
    total_posting_rows = 0
    total_purged = 0
    any_tombstones = False
    for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        seg_dir = os.path.join(seg_root, name)
        man_path = os.path.join(seg_dir, "MANIFEST.json")
        if not os.path.isfile(man_path):
            continue
        with open(man_path) as f:
            man = json.load(f)
        stats = {}
        st_path = os.path.join(seg_dir, "stats.json")
        if os.path.isfile(st_path):
            with open(st_path) as f:
                stats = json.load(f)
        tombstoned = os.path.exists(os.path.join(seg_dir, "deleted.npy"))
        any_tombstones = any_tombstones or tombstoned
        stages: list[dict] = []
        ss_path = os.path.join(seg_dir, "stage_stats.txt")
        if os.path.isfile(ss_path):
            try:
                with open(ss_path) as f:
                    stages = parse_stage_stats(f.read())
            except (OSError, ValueError):
                stages = []
        posting_rows = int(man.get("posting_rows") or 0)
        total_posting_rows += posting_rows
        purged = int(man.get("purged_docs") or 0)
        total_purged += purged
        seg = {
            "segment": name,
            "status": man.get("status"),
            "docs": int(man.get("doc_count") or stats.get("doc_count") or 0),
            "posting_rows": posting_rows,
            "compacted": bool(man.get("compacted")),
            "empty": bool(man.get("empty")),
            "tombstoned": tombstoned,
            "purged_docs": purged,
            "bytes": _dir_bytes(seg_dir),
            "input_path": man.get("input_path"),
        }
        if "live_docs" in stats:
            seg["live_docs"] = int(stats["live_docs"])
        if stages:
            seg["stages"] = stages
        segments.append(seg)

    stage_totals = _aggregate_stages(
        [s["stages"] for s in segments if "stages" in s]
    )
    report = {
        "index_dir": os.path.abspath(index_dir),
        "meta": meta,
        "build_metrics": metrics,
        "segments": segments,
        "stage_totals": stage_totals,
        "totals": {
            "segments": len(segments),
            "docs": sum(s["docs"] for s in segments),
            "posting_rows": total_posting_rows,
            "purged_docs": total_purged,
            "tombstoned_segments": any_tombstones,
            "index_bytes": _dir_bytes(index_dir),
        },
    }
    return report
