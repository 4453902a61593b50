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


def _reencode(
    field: str, frag: list, want_pos: bool, norms, doc_base: int
) -> list:
    """Decode a group of piece blocks, doc-sort, and re-encode as full blocks
    (with exact min_dl when norms are at hand)."""
    docs, tfs, pos = decode_postings(frag, want_positions=want_pos)
    docs, tfs, pos = sort_postings(docs, tfs, pos)
    dls = None
    if norms is not None and want_pos:
        arr = norms.get(field)
        if arr is not None and docs.size:
            dls = arr[docs - doc_base]
    return encode_postings(docs, tfs, pos, dls=dls)


def _filter_deleted_run(docs, tfs, pos, deleted):
    """Drop tombstoned docs from one decoded run (positions stay aligned)."""
    idx = np.clip(np.searchsorted(deleted, docs), 0, deleted.size - 1)
    keep = deleted[idx] != docs
    if keep.all():
        return docs, tfs, pos
    if pos is not None and pos.size:
        pos = pos[np.repeat(keep, tfs)]
    return docs[keep], tfs[keep], pos


def _merge_run(
    field: str, term: str, blocks: list, norms, doc_base: int, out: dict,
    run_total_tf: int, deleted=None,
) -> None:
    """Merge one (field, term) run of piece blocks into consolidated rows of at
    most ROW_BLOCK_CAP blocks each, appended to the ``out`` column lists.

    Blocks are self-contained (each starts with an absolute doc id), so almost
    every block is copied VERBATIM without touching its payload bytes — an
    LSM-style block-preserving merge. Only runs of >=2 ADJACENT undersized
    piece-tail blocks decode, merging into full blocks so hot terms don't
    accumulate one splinter per piece. Blocks whose doc RANGES overlap (the
    few batches Ray assembled from tails of different doc-sorted input files)
    are kept as-is: every reader path either doc-sorts on decode or checks
    block ranges elementwise, exactly as it already must for the uncompacted
    piece layout, and re-packing them cost more one-time decode volume than
    their ~0.5% share ever costs queries.

    ``run_total_tf`` (from the piece rows' metadata) is recorded on the run's
    first output row: per-row total_tf is consumed nowhere, and this keeps the
    per-(field, term) aggregate exact without decoding any tf stream."""
    from .codec import BLOCK_SIZE

    want_pos = term != NORMS_TERM
    nb = len(blocks)
    if nb == 0:
        return
    if deleted is not None and want_pos:
        # purge path (tombstoned segment): every block decodes, tombstoned
        # docs drop, and per-row df/total_tf are re-derived from what remains —
        # the Lucene-merge moment where deletes actually reclaim space.
        # NORMS rows are exempt: the norms array must stay dense over maxDoc.
        docs, tfs, pos = decode_postings(blocks, want_positions=True)
        docs, tfs, pos = sort_postings(docs, tfs, pos)
        docs, tfs, pos = _filter_deleted_run(docs, tfs, pos, deleted)
        if docs.size == 0:
            return  # the term died with its last documents
        dls = None
        if norms is not None:
            arr = norms.get(field)
            if arr is not None:
                dls = arr[docs - doc_base]
        merged = encode_postings(docs, tfs, pos, dls=dls)
        first_row = True
        for c0 in range(0, len(merged), ROW_BLOCK_CAP):
            chunk = merged[c0: c0 + ROW_BLOCK_CAP]
            out["field"].append(field)
            out["term"].append(term)
            out["bucket"].append(int(chunk[0]["first_doc"]))
            out["df"].append(int(sum(b["n"] for b in chunk)))
            out["total_tf"].append(int(tfs.sum()) if first_row else 0)
            out["blocks"].append(chunk)
            first_row = False
        return
    firsts = np.fromiter((b["first_doc"] for b in blocks), np.int64, nb)
    if nb > 1 and (np.diff(firsts) < 0).any():
        order = np.argsort(firsts, kind="stable")
        blocks = [blocks[i] for i in order]
    ns = np.fromiter((b["n"] for b in blocks), np.int64, nb)

    merged: list = []
    frag_buf: list = []  # pending adjacent undersized blocks

    def flush_frags():
        if len(frag_buf) >= 2:
            merged.extend(_reencode(field, frag_buf, want_pos, norms, doc_base))
        else:
            merged.extend(frag_buf)
        frag_buf.clear()

    for i in range(nb):
        if ns[i] < BLOCK_SIZE:
            frag_buf.append(blocks[i])
        else:
            flush_frags()
            merged.append(blocks[i])
    flush_frags()

    first_row = True
    for c0 in range(0, max(len(merged), 1), ROW_BLOCK_CAP):
        chunk = merged[c0: c0 + ROW_BLOCK_CAP]
        out["field"].append(field)
        out["term"].append(term)
        out["bucket"].append(int(chunk[0]["first_doc"]) if chunk else 0)
        out["df"].append(int(sum(b["n"] for b in chunk)))
        out["total_tf"].append(int(run_total_tf) if first_row else 0)
        out["blocks"].append(chunk)
        first_row = False


def _merge_sorted_batch(
    batch: pa.Table, *, norms_ref=None, norms=None, doc_base: int = 0,
    deleted_ref=None,
) -> pa.Table:
    """One batch of the (field, term, bucket)-sorted piece stream -> merged
    rows, one (or a few, for hot terms past ROW_BLOCK_CAP) per (field, term)
    run present in the batch.

    Runs that straddle a batch boundary simply merge into one row per side —
    the reader concatenates a term's rows in bucket order (doc-sorting on the
    rare interleave), so partial merges are exactly as correct as full ones
    and compaction needs only ONE all-to-all (the sort) instead of the
    groupby-shuffle + re-sort pair.

    ``norms_ref`` (an ObjectRef to {field: per-doc dl array}) lets re-encoded
    blocks carry an exact per-block ``min_dl`` even though the merged block
    boundaries differ from the build-time pieces'; it is fetched zero-copy
    from the object store once per task."""
    _limit_worker_threads()
    if batch.num_rows == 0:
        return batch
    if norms is None and norms_ref is not None:
        import ray

        norms = ray.get(norms_ref)
    deleted = None
    if deleted_ref is not None:
        import ray

        deleted = ray.get(deleted_ref)
    fields = batch["field"].to_pylist()
    terms = batch["term"].to_pylist()
    blocks_col = batch["blocks"].to_pylist()
    ttfs = batch["total_tf"].to_pylist()
    out: dict = {k: [] for k in ("field", "term", "bucket", "df", "total_tf", "blocks")}
    run_f, run_t, run_blocks, run_ttf = fields[0], terms[0], [], 0
    for f, t, b, tt in zip(fields, terms, blocks_col, ttfs):
        if f != run_f or t != run_t:
            _merge_run(run_f, run_t, run_blocks, norms, doc_base, out, run_ttf,
                       deleted=deleted)
            run_f, run_t, run_blocks, run_ttf = f, t, [], 0
        run_blocks.extend(b)
        run_ttf += tt
    _merge_run(run_f, run_t, run_blocks, norms, doc_base, out, run_ttf,
               deleted=deleted)
    return pa.table(
        {
            "field": pa.array(out["field"], pa.string()),
            "term": pa.array(out["term"], pa.string()),
            "bucket": pa.array(out["bucket"], pa.int64()),
            "df": pa.array(out["df"], pa.int64()),
            "total_tf": pa.array(out["total_tf"], pa.int64()),
            "blocks": pa.array(
                out["blocks"], pa.list_(POSTINGS_SCHEMA.field("blocks").type.value_type)
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


def _retry_fs_import_race(fn):
    """Ray's path resolution probes ``fsspec.implementations.http`` on EVERY
    read/write; with aiohttp absent the import always fails, is evicted from
    ``sys.modules``, and is re-attempted next call — so two threads resolving
    paths at once can race the half-initialized module and surface a transient
    ``ImportError`` (Ray only catches ``ModuleNotFoundError``). Resolution runs
    before any execution or filesystem mutation, so retrying is safe."""
    import time

    for attempt in range(8):
        try:
            return fn()
        except ImportError as e:
            if "fsspec" not in str(e) and "HTTPFileSystem" not in str(e):
                raise
            time.sleep(0.05 * (attempt + 1))
    return fn()


def _compact_segment(seg_dir: str, manifest: dict, manifest_path: str) -> None:
    """Sort-merge one segment's postings and atomically publish the result."""
    import functools

    import ray
    import ray.data

    from .build import POSTINGS_WRITE_ARGS
    from .segment import SegmentReader

    postings_path = os.path.join(seg_dir, "postings.parquet")
    tmp_path = postings_path + ".compact"
    shutil.rmtree(tmp_path, ignore_errors=True)

    # broadcast the segment's norms once (ray.put, zero-copy reads in every
    # merge task) so re-cut blocks keep an exact min_dl for WAND bounds
    reader = SegmentReader(seg_dir)
    norms = {f: reader.norms(f) for f in manifest.get("fields", [])}
    norms_ref = ray.put(norms)
    # tombstoned segment: this merge is the purge — broadcast the deleted set
    deleted_ref = ray.put(reader.deleted) if reader.deleted is not None else None
    merge_fn = functools.partial(
        _merge_sorted_batch, norms_ref=norms_ref, doc_base=reader.doc_base,
        deleted_ref=deleted_ref,
    )

    ds = _retry_fs_import_race(lambda: ray.data.read_parquet(postings_path))
    # ONE all-to-all: sort by (field, term, bucket), then merge term runs
    # per sorted batch. The sort is what makes term lookups cheap — it
    # clusters each term into a handful of row groups so parquet min/max
    # stats prune the rest (hash-partitioned output would spread every row
    # group across the whole vocabulary and nothing could prune). A
    # groupby.map_groups would give per-term completeness but costs a
    # second full exchange (Ray's map_groups itself sorts), and the reader
    # doesn't need completeness — it already concatenates a term's rows in
    # bucket order. min_rows_per_file coalesces the sort's many small
    # output blocks at write time (no extra pass): a term lookup opens
    # every file's footer, so hundreds of tiny files put a ~0.5 s floor
    # under COLD lookups.
    merged = ds.sort(["field", "term", "bucket"]).map_batches(
        merge_fn, batch_size=2048, batch_format="pyarrow"
    )
    def _write():
        shutil.rmtree(tmp_path, ignore_errors=True)  # clean slate per attempt
        merged.write_parquet(
            tmp_path, min_rows_per_file=2048, **POSTINGS_WRITE_ARGS
        )

    _retry_fs_import_race(_write)
    # atomic publish: old dir moves aside, tmp takes its place
    bak = postings_path + ".bak"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(postings_path, bak)
    os.rename(tmp_path, postings_path)
    shutil.rmtree(bak)
    if reader.deleted is not None:
        # the postings above no longer contain the tombstoned docs: record
        # LIVE stats (numDocs/liveDl) next to the untouched maxDoc ones —
        # engine-level N and avgdl switch to them, like Lucene after a merge —
        # then drop the tombstone file so WAND re-enables. Crash between any
        # two steps re-runs this segment's compaction (manifest lands last)
        # and converges: re-filtering already-purged postings is a no-op.
        dead = reader.deleted
        stats_path = os.path.join(seg_dir, "stats.json")
        with open(stats_path) as f:
            stats = json.load(f)
        stats["live_docs"] = int(stats["doc_count"]) - int(dead.size)
        for f_, st in stats.get("fields", {}).items():
            arr = norms.get(f_)
            removed = int(arr[dead - reader.doc_base].sum()) if arr is not None else 0
            st["live_dl"] = int(st["total_dl"]) - removed
        tmp_st = stats_path + ".tmp"
        with open(tmp_st, "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(tmp_st, stats_path)
        os.remove(os.path.join(seg_dir, "deleted.npy"))
        manifest["purged_docs"] = int(
            manifest.get("purged_docs", 0)
        ) + int(dead.size)
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


def compact_index(index_dir: str, *, resume: bool = True) -> None:
    """Compact every segment's postings in place (atomic swap per segment;
    interrupted swaps from a previous crash are repaired on entry).

    Segments compact CONCURRENTLY (a few driver threads, each running one
    independent sort→merge→write Dataset pipeline): one segment's exchange
    rarely saturates the cluster on its own — its sort has a reduce fan-in
    barrier and a bounded task count — so overlapping segments keeps workers
    fed, and at small scale it hides the ~seconds of fixed per-pipeline
    overhead instead of paying it once per segment. Crash safety is unchanged:
    each segment still publishes via its own atomic swap, so a failure leaves
    every segment either compacted or untouched (per-segment resume)."""
    from concurrent.futures import ThreadPoolExecutor

    seg_root = os.path.join(index_dir, "segments")
    pending: list = []
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
        if (
            resume
            and manifest.get("compacted")
            and os.path.isdir(postings_path)
            # deletes after a previous compaction re-qualify the segment:
            # this pass is also the tombstone purge
            and not os.path.exists(os.path.join(seg_dir, "deleted.npy"))
        ):
            continue
        pending.append((seg_dir, manifest, manifest_path))
    if not pending:
        return
    if len(pending) == 1:
        _compact_segment(*pending[0])
        return
    with ThreadPoolExecutor(max_workers=min(4, len(pending))) as pool:
        futs = [pool.submit(_compact_segment, *args) for args in pending]
        for f in futs:
            f.result()
