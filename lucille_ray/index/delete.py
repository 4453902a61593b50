"""Document deletes via per-segment tombstones (Lucene liveDocs semantics).

``delete_docs`` / ``delete_conversations`` mark docs deleted by writing a
sorted ``deleted.npy`` doc-id array into each affected COMMITTED segment
(atomic replace, idempotent, accumulative). Readers opened afterwards filter
tombstoned docs out of every decoded posting list at the segment read layer,
so they can never appear in results of any query shape — while df / norms /
avgdl statistics intentionally keep counting them until a rewrite, exactly
like Lucene's maxDoc-based stats before a merge: surviving docs' scores are
bit-identical before and after a delete.

Scale note: resolving conversations to doc ids scans each segment's docmapped
input with a conv_id predicate pushdown — per-segment, column-pruned reads.
At very large delete sets, broadcast the conv set (``ray.put``) and collect
matches with a ``map_batches`` sweep instead; the tombstone write path is
unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Sequence

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .build import INDEX_META_FILE, MANIFEST_FILE, _segment_dir


def _committed_segments(index_dir: str) -> list:
    with open(os.path.join(index_dir, INDEX_META_FILE)) as f:
        meta = json.load(f)
    out = []
    for s in range(int(meta["num_segments"])):
        seg_dir = _segment_dir(index_dir, s)
        with open(os.path.join(seg_dir, MANIFEST_FILE)) as f:
            manifest = json.load(f)
        if not manifest.get("empty"):
            out.append((seg_dir, manifest))
    return out


def delete_docs(index_dir: str, doc_ids: Sequence[int] | np.ndarray) -> int:
    """Tombstone the given global doc ids. Returns the number of NEWLY
    deleted docs (ids already tombstoned or out of range count zero)."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if ids.size == 0:
        return 0
    newly = 0
    for seg_dir, _manifest in _committed_segments(index_dir):
        with open(os.path.join(seg_dir, "stats.json")) as f:
            stats = json.load(f)
        lo = int(stats["doc_base"])
        hi = lo + int(stats["doc_count"])
        local = ids[(ids >= lo) & (ids < hi)]
        if local.size == 0:
            continue
        tomb = os.path.join(seg_dir, "deleted.npy")
        if os.path.exists(tomb):
            prev = np.load(tomb).astype(np.int64, copy=False)
            merged = np.union1d(prev, local)
            newly += int(merged.size - prev.size)
        else:
            merged = local
            newly += int(local.size)
        tmp = tomb + ".tmp"
        with open(tmp, "wb") as fh:
            np.save(fh, merged)
        os.replace(tmp, tomb)
    return newly


def delete_conversations(index_dir: str, conv_ids: Iterable[str]) -> int:
    """Tombstone every turn of the given conversations. Returns newly deleted
    doc count. Unknown conv_ids are ignored (delete-by-query semantics)."""
    convs = sorted(set(conv_ids))
    if not convs:
        return 0
    doc_ids: list = []
    for seg_dir, manifest in _committed_segments(index_dir):
        src = manifest["input_path"]
        if src.endswith(":fused"):
            # fused-docmap segment: the O(#convs) convmap resolves each
            # conversation to its dense doc range [base, base + cnt)
            import pyarrow.parquet as pq

            cm = pq.read_table(
                os.path.join(index_dir, "convmap.parquet"),
                columns=["conv_id", "base", "cnt"],
            ).filter(pc.field("conv_id").isin(convs))
            for base, cnt in zip(
                cm["base"].to_pylist(), cm["cnt"].to_pylist()
            ):
                doc_ids.extend(range(int(base), int(base) + int(cnt)))
            continue
        if not os.path.exists(src):
            raise ValueError(
                f"cannot resolve conversations: docmapped input {src} for "
                f"{seg_dir} is gone; use delete_docs with explicit doc ids"
            )
        t = pads.dataset(src).to_table(
            columns=["doc_id"],
            filter=pc.field("conv_id").isin(convs),
        )
        doc_ids.extend(t["doc_id"].to_pylist())
    return delete_docs(index_dir, doc_ids)
