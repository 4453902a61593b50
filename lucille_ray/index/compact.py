"""Segment compaction: merge the per-batch posting *pieces* written by the
shuffle-free ``doc_partitioned`` build into one consolidated row per
``(field, term)``.

This gives the best of both worlds at scale: the build streams with zero
all-to-all, then compaction — a ``groupby(field, term)`` over the already
block-compressed postings (a small fraction of input volume) — restores the
read-optimal layout of the ``term_partitioned`` path. Compaction is optional,
idempotent (atomic directory swap), and per-segment resumable like the build.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import INDEX_META_FILE, MANIFEST_FILE, NORMS_TERM, _limit_worker_threads
from .codec import POSTINGS_SCHEMA, decode_postings, encode_postings, sort_postings


#: max blocks per consolidated posting row (~32k postings, a few hundred KB):
#: a hot term's postings split across multiple doc-ordered rows (bucket = first
#: doc of the chunk) so one row cell can never grow to tens of MB — row-group
#: predicate pushdown then reads a bounded byte volume per term lookup instead
#: of a whole segment's postings for one hot term
ROW_BLOCK_CAP = 256


def _merge_pieces(
    group: pa.Table, *, norms_ref=None, doc_base: int = 0
) -> pa.Table:
    """All piece rows of one (field, term) -> doc-ordered consolidated rows of
    at most ROW_BLOCK_CAP blocks each.

    ``norms_ref`` (an ObjectRef to {field: per-doc dl array}) lets re-encoded
    blocks carry an exact per-block ``min_dl`` even though the merged block
    boundaries differ from the build-time pieces'; it is fetched zero-copy
    from the object store once per worker."""
    _limit_worker_threads()
    field = group["field"][0].as_py()
    term = group["term"][0].as_py()
    want_pos = term != NORMS_TERM
    blocks = []
    for row_blocks in group["blocks"].to_pylist():
        blocks.extend(row_blocks)
    docs, tfs, pos = decode_postings(blocks, want_positions=want_pos)
    docs, tfs, pos = sort_postings(docs, tfs, pos)
    dls = None
    if norms_ref is not None and term != NORMS_TERM:
        import ray

        arr = ray.get(norms_ref).get(field)
        if arr is not None and docs.size:
            dls = arr[docs - doc_base]
    merged = encode_postings(docs, tfs, pos, dls=dls)
    out_bucket, out_df, out_ttf, out_blocks = [], [], [], []
    from .codec import BLOCK_SIZE

    for c0 in range(0, max(len(merged), 1), ROW_BLOCK_CAP):
        chunk = merged[c0: c0 + ROW_BLOCK_CAP]
        d0 = c0 * BLOCK_SIZE
        d1 = min(d0 + ROW_BLOCK_CAP * BLOCK_SIZE, docs.size)
        out_bucket.append(int(docs[d0]) if docs.size else 0)
        out_df.append(int(d1 - d0))
        out_ttf.append(int(tfs[d0:d1].sum()) if docs.size else 0)
        out_blocks.append(chunk)
    return pa.table(
        {
            "field": pa.array([field] * len(out_blocks), pa.string()),
            "term": pa.array([term] * len(out_blocks), pa.string()),
            "bucket": pa.array(out_bucket, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
            "total_tf": pa.array(out_ttf, pa.int64()),
            "blocks": pa.array(
                out_blocks, pa.list_(POSTINGS_SCHEMA.field("blocks").type.value_type)
            ),
        }
    )


def _recover_interrupted_swap(postings_path: str) -> None:
    """The publish below is two renames; a crash in between leaves ``.bak``
    present and ``postings.parquet`` missing. Finish or roll back before
    compacting so a re-run always starts from a readable segment."""
    bak = postings_path + ".bak"
    tmp = postings_path + ".compact"
    if os.path.isdir(postings_path):
        return
    if os.path.isdir(tmp):
        # crashed between the two renames with the new dir complete: finish
        os.rename(tmp, postings_path)
        shutil.rmtree(bak, ignore_errors=True)
    elif os.path.isdir(bak):
        # crashed after moving the old dir aside but the new one is gone: restore
        os.rename(bak, postings_path)


def compact_index(index_dir: str, *, resume: bool = True) -> None:
    """Compact every segment's postings in place (atomic swap per segment;
    interrupted swaps from a previous crash are repaired on entry)."""
    import ray.data

    seg_root = os.path.join(index_dir, "segments")
    for name in sorted(os.listdir(seg_root)):
        seg_dir = os.path.join(seg_root, name)
        manifest_path = os.path.join(seg_dir, MANIFEST_FILE)
        if not os.path.isfile(manifest_path):
            continue
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("empty"):
            continue
        postings_path = os.path.join(seg_dir, "postings.parquet")
        _recover_interrupted_swap(postings_path)
        if resume and manifest.get("compacted") and os.path.isdir(postings_path):
            continue
        tmp_path = postings_path + ".compact"
        shutil.rmtree(tmp_path, ignore_errors=True)
        from .build import POSTINGS_WRITE_ARGS

        # broadcast the segment's norms once (ray.put, zero-copy reads in every
        # merge task) so re-cut blocks keep an exact min_dl for WAND bounds
        import functools

        import ray

        from .segment import SegmentReader

        reader = SegmentReader(seg_dir)
        norms_ref = ray.put(
            {f: reader.norms(f) for f in manifest.get("fields", [])}
        )
        merge_fn = functools.partial(
            _merge_pieces, norms_ref=norms_ref, doc_base=reader.doc_base
        )

        ds = ray.data.read_parquet(postings_path)
        # the final sort is what makes term lookups cheap: hash-groupby output
        # scatters terms across row groups, so every row group's term min/max
        # spans the whole vocabulary and predicate pushdown can never prune —
        # a cold hot-term lookup then reads EVERY posting blob in the segment.
        # Term-clustered row groups turn that into a few-row-group read.
        # min_rows_per_file coalesces the sort's many small output blocks at
        # write time (no extra pass): a term lookup opens every file's footer,
        # so hundreds of tiny files put a ~0.5 s floor under COLD lookups
        ds.groupby(["field", "term"]).map_groups(
            merge_fn, batch_format="pyarrow"
        ).sort(["field", "term", "bucket"]).write_parquet(
            tmp_path, min_rows_per_file=2048, **POSTINGS_WRITE_ARGS
        )
        # atomic publish: old dir moves aside, tmp takes its place
        bak = postings_path + ".bak"
        shutil.rmtree(bak, ignore_errors=True)
        os.rename(postings_path, bak)
        os.rename(tmp_path, postings_path)
        shutil.rmtree(bak)
        manifest["compacted"] = True
        manifest["posting_rows"] = sum(
            pq.read_metadata(os.path.join(postings_path, f)).num_rows
            for f in os.listdir(postings_path)
            if f.endswith(".parquet")
        )
        tmp_mf = manifest_path + ".tmp"
        with open(tmp_mf, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp_mf, manifest_path)
