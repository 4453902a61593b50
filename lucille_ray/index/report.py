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
from typing import Optional


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
        segments.append(seg)

    report = {
        "index_dir": os.path.abspath(index_dir),
        "meta": meta,
        "build_metrics": metrics,
        "segments": segments,
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
