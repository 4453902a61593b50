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
from .codec import (
    BLOCK_SIZE,
    POSTINGS_SCHEMA,
    RawBlocks,
    encode_postings,
    sort_postings,
)


#: max blocks per consolidated posting row (~32k postings, a few hundred KB):
#: a hot term's postings split across multiple doc-ordered rows (bucket = first
#: doc of the chunk) so one row cell can never grow to tens of MB — row-group
#: predicate pushdown then reads a bounded byte volume per term lookup instead
#: of a whole segment's postings for one hot term
ROW_BLOCK_CAP = 256


def _filter_deleted_run(docs, tfs, pos, deleted):
    """Drop tombstoned docs from one decoded run (positions stay aligned)."""
    idx = np.clip(np.searchsorted(deleted, docs), 0, deleted.size - 1)
    keep = deleted[idx] != docs
    if keep.all():
        return docs, tfs, pos
    if pos is not None and pos.size:
        pos = pos[np.repeat(keep, tfs)]
    return docs[keep], tfs[keep], pos


def _reencode_span(
    raw: RawBlocks, sel: np.ndarray, field: str, want_pos: bool, norms,
    doc_base: int, deleted,
) -> tuple:
    """Decode the ``sel`` blocks of ``raw``, doc-sort (dropping tombstoned
    docs on the purge path), and re-encode as full blocks with exact min_dl
    when norms are at hand. Returns (block dicts, total_tf | None)."""
    keep = np.zeros(len(raw), bool)
    keep[sel] = True
    docs, tfs, pos = raw.decode(want_positions=want_pos, keep=keep)
    docs, tfs, pos = sort_postings(docs, tfs, pos)
    if deleted is not None:
        docs, tfs, pos = _filter_deleted_run(docs, tfs, pos, deleted)
        if docs.size == 0:
            return [], 0  # the term died with its last documents
    dls = None
    if norms is not None and want_pos and docs.size:
        arr = norms.get(field)
        if arr is not None:
            dls = arr[docs - doc_base]
    return encode_postings(docs, tfs, pos, dls=dls), int(tfs.sum())


def _merge_sorted_batch(
    batch: pa.Table, *, norms_ref=None, norms=None, doc_base: int = 0,
    deleted_ref=None,
) -> pa.Table:
    """One batch of the (field, term, bucket)-sorted piece stream -> merged
    rows, one (or a few, for hot terms past ROW_BLOCK_CAP) per (field, term)
    run present in the batch.

    Blocks are self-contained (each starts with an absolute doc id), so almost
    every block is copied VERBATIM — an LSM-style block-preserving merge.
    The verbatim path never touches payload bytes at the Python layer: the
    batch's ``blocks`` column is viewed through :class:`RawBlocks` (numpy
    metadata views over the flattened struct children), the output block
    sequence is assembled as an int64 index vector, and ONE Arrow ``take``
    gathers the surviving blocks in C. Only runs of >=2 ADJACENT undersized
    piece-tail blocks decode + re-encode (merging splinters into full blocks),
    as does every block of a tombstoned segment (the purge moment, where
    deleted docs physically leave and per-row df/total_tf re-derive from what
    remains; NORMS rows are exempt — the norms array must stay dense over
    maxDoc). Blocks whose doc RANGES overlap (the few batches Ray assembled
    from tails of different doc-sorted input files) are kept as-is: every
    reader path either doc-sorts on decode or checks block ranges elementwise.

    Runs that straddle a batch boundary simply merge into one row per side —
    the reader concatenates a term's rows in bucket order (doc-sorting on the
    rare interleave), so partial merges are exactly as correct as full ones
    and compaction needs only ONE all-to-all (the sort) instead of the
    groupby-shuffle + re-sort pair. Each run's summed piece ``total_tf`` lands
    on its first output row (per-row total_tf is consumed nowhere; this keeps
    the per-(field, term) aggregate exact without decoding any tf stream).

    ``norms_ref`` (an ObjectRef to {field: per-doc dl array}) lets re-encoded
    blocks carry an exact per-block ``min_dl`` even though the merged block
    boundaries differ from the build-time pieces'; it is fetched zero-copy
    from the object store once per task."""
    import pyarrow.compute as pc

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

    lists = batch.column("blocks").combine_chunks()
    flat = lists.flatten()
    raw = RawBlocks(flat)
    nflat = len(raw)
    row_nb = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    row_off = np.zeros(row_nb.size + 1, np.int64)
    np.cumsum(row_nb, out=row_off[1:])

    fcol = batch.column("field").combine_chunks()
    tcol = batch.column("term").combine_chunks()
    f_idx = pc.dictionary_encode(fcol).indices.to_numpy(zero_copy_only=False)
    t_idx = pc.dictionary_encode(tcol).indices.to_numpy(zero_copy_only=False)
    ttfs = batch.column("total_tf").to_numpy(zero_copy_only=False).astype(np.int64)
    nrows = batch.num_rows
    change = np.flatnonzero((np.diff(f_idx) != 0) | (np.diff(t_idx) != 0)) + 1
    run_starts = np.concatenate([[0], change])
    run_ends = np.concatenate([change, [nrows]])
    run_ttf = np.add.reduceat(ttfs, run_starts)

    # per run: output block sequence as indices into [flat | new frag blocks]
    runs_out: list = []  # (field, term, seq_indices, total_tf)
    frag_dicts: list = []  # re-encoded replacement blocks (the small minority)

    for ri in range(run_starts.size):
        rs, re_ = int(run_starts[ri]), int(run_ends[ri])
        b0, b1 = int(row_off[rs]), int(row_off[re_])
        nb = b1 - b0
        if nb == 0:
            continue
        field = fcol[rs].as_py()
        term = tcol[rs].as_py()
        want_pos = term != NORMS_TERM
        ttf_val = int(run_ttf[ri])
        if deleted is not None and want_pos:
            # purge path (tombstoned segment): every block re-encodes
            new, ttf_val = _reencode_span(
                raw, np.arange(b0, b1), field, True, norms, doc_base, deleted
            )
            if not new:
                continue
            seq = nflat + np.arange(
                len(frag_dicts), len(frag_dicts) + len(new), dtype=np.int64
            )
            frag_dicts.extend(new)
            runs_out.append((field, term, seq, ttf_val))
            continue
        firsts = raw.firsts[b0:b1]
        if nb > 1 and (np.diff(firsts) < 0).any():
            order = np.argsort(firsts, kind="stable")
        else:
            order = np.arange(nb, dtype=np.int64)
        undersized = raw.ns[b0:b1][order] < BLOCK_SIZE
        if nb == 1 or not undersized.any():
            runs_out.append((field, term, b0 + order, ttf_val))
            continue
        # maximal runs of adjacent undersized blocks (in doc order) of length
        # >=2 re-encode; everything else copies verbatim
        d = np.diff(undersized.astype(np.int8))
        u_starts = np.flatnonzero(d == 1) + 1
        u_ends = np.flatnonzero(d == -1) + 1
        if undersized[0]:
            u_starts = np.concatenate([[0], u_starts])
        if undersized[-1]:
            u_ends = np.concatenate([u_ends, [nb]])
        seq_parts: list = []
        cursor = 0
        for a, b in zip(u_starts, u_ends):
            a, b = int(a), int(b)
            if a > cursor:
                seq_parts.append(b0 + order[cursor:a])
            if b - a >= 2:
                sel = np.sort(b0 + order[a:b])
                new, _ = _reencode_span(
                    raw, sel, field, want_pos, norms, doc_base, None
                )
                seq_parts.append(nflat + np.arange(
                    len(frag_dicts), len(frag_dicts) + len(new), dtype=np.int64
                ))
                frag_dicts.extend(new)
            else:
                seq_parts.append(b0 + order[a:b])
            cursor = b
        if cursor < nb:
            seq_parts.append(b0 + order[cursor:nb])
        runs_out.append((field, term, np.concatenate(seq_parts), ttf_val))

    # combined metadata for chunk-level df/bucket without decoding anything
    if frag_dicts:
        nfrag = len(frag_dicts)
        ns_comb = np.concatenate([
            raw.ns,
            np.fromiter((b["n"] for b in frag_dicts), np.int64, nfrag),
        ])
        firsts_comb = np.concatenate([
            raw.firsts,
            np.fromiter((b["first_doc"] for b in frag_dicts), np.int64, nfrag),
        ])
        frag_arr = pa.array(frag_dicts, type=flat.type)
        combined = pa.concat_arrays([flat, frag_arr])
    else:
        ns_comb, firsts_comb, combined = raw.ns, raw.firsts, flat

    out_field: list = []
    out_term: list = []
    out_bucket: list = []
    out_df: list = []
    out_ttf: list = []
    idx_parts: list = []
    row_lens: list = []
    for field, term, seq, ttf_val in runs_out:
        for c0 in range(0, len(seq), ROW_BLOCK_CAP):
            chunk = seq[c0: c0 + ROW_BLOCK_CAP]
            out_field.append(field)
            out_term.append(term)
            out_bucket.append(int(firsts_comb[chunk[0]]))
            out_df.append(int(ns_comb[chunk].sum()))
            out_ttf.append(ttf_val if c0 == 0 else 0)
            idx_parts.append(chunk)
            row_lens.append(len(chunk))

    if not idx_parts:
        return batch.schema.empty_table()
    taken = combined.take(pa.array(np.concatenate(idx_parts), pa.int64()))
    offs = np.zeros(len(row_lens) + 1, np.int64)
    np.cumsum(np.asarray(row_lens, np.int64), out=offs[1:])
    blocks_arr = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), taken)
    return pa.table(
        {
            "field": pa.array(out_field, pa.string()),
            "term": pa.array(out_term, pa.string()),
            "bucket": pa.array(out_bucket, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
            "total_tf": pa.array(out_ttf, pa.int64()),
            "blocks": blocks_arr,
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
    # Zipfian term keys collide the sort's sampled range boundaries, so the
    # sort emits some partitions as UNTYPED empty blocks; drop them by block
    # ref (the sort is a full barrier anyway, so this adds no extra pass) —
    # otherwise every downstream stage sees mixed-schema RefBundles
    from ..ops.joins import drop_empty_blocks

    merged = drop_empty_blocks(ds.sort(["field", "term", "bucket"])).map_batches(
        merge_fn, batch_size=2048, batch_format="pyarrow"
    )
    # NOTE: combining min_rows_per_file AND max_rows_per_file makes this Ray
    # version's parquet sink silently IGNORE row_group_size — the coalesced
    # file comes out as ONE row group, so a cold term lookup decodes the
    # segment's ENTIRE postings payload (min/max stats can't prune inside a
    # row group). min + row_group_size alone is honored; drop the max here
    # (file size is already bounded by the segment's own row count).
    write_args = {k: v for k, v in POSTINGS_WRITE_ARGS.items()
                  if k != "max_rows_per_file"}

    def _write():
        shutil.rmtree(tmp_path, ignore_errors=True)  # clean slate per attempt
        merged.write_parquet(tmp_path, min_rows_per_file=2048, **write_args)

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
