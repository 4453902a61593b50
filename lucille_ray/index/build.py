"""Ray-Data-native inverted-index build over transcript turns.

Pipeline (all stages stream with backpressure; no full materialization):

Phase 0 — docmap (one pass over the input, no shuffle)
  batch-level partial conversation counts -> driver prefix-sums conversation base
  offsets (broadcast via ``ray.put``) -> ``map_batches`` attaches ``doc_id =
  conv_base + turn_idx``, a contiguous ``seg`` id, and fused per-field norms
  columns (``dl_*``) -> hive-partitioned parquet ``docmapped/seg=K/``. Doc ids
  are dense and follow the stable ``(conv_id, turn_idx)`` order (north_rule
  invariant); segments are contiguous doc-id ranges cut on conversation
  boundaries.

Phase 1 — per segment (the checkpoint/resume unit; a segment with a complete
MANIFEST.json is skipped on re-run): tokenize with Arrow kernels + polars
explode/groupby (no per-row Python) and emit block-compressed posting rows, in
one of two layouts (see :func:`build_index`): the default ``doc_partitioned``
layout needs NO shuffle at all; ``term_partitioned`` consolidates via a
``groupby(field, term, bucket)`` exchange.

Skew strategy: the doc-range ``bucket`` key splits hot terms (stopword-like tokens
in chat data) across many groups/pieces *by construction* — no single task ever
merges a whole hot posting list. Because buckets follow doc-id ranges, a term's
rows concatenate back into a doc-sorted posting list with (at most) a cheap
re-sort at decode time. This replaces hash-salting + re-merge with something
strictly better.

Scale notes (100 TB / 10^12 turns): the conv-base broadcast dict is
O(#conversations) — beyond driver memory you'd swap Phase 0 for a range-partitioned
sort + per-partition offsets pass, everything else unchanged. Input is read once per
phase; postings volume (compressed) is ~5-10% of input and the groupby shuffle is
the only all-to-all over it.

This build has no counterpart in the reference (a pure parser library — SURVEY.md
§4); semantics come from Lucene's documented behavior for the parsed AST.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis import INDEXED_FIELDS, arrow_tokenize
from .codec import POSTINGS_SCHEMA, encode_postings, sort_postings

DEFAULT_RANGE_WIDTH = 1 << 17  # docs per posting bucket (128k)

#: reserved pseudo-term whose "postings" carry per-doc field lengths (norms):
#: doc_ids = every doc of the piece, tfs = dl. The analyzer can never produce it
#: (it only emits [a-z0-9]+ runs), and term dictionaries filter it out.
NORMS_TERM = "\x00dl"

_THREADS_LIMITED = False


def _limit_worker_threads() -> None:
    """Pin per-task kernel thread pools to 1 CPU inside Ray workers.

    polars (rayon) and Arrow compute size their pools to the *machine's* cores,
    not the Ray CPU allocation — N concurrent tasks would otherwise each fan out
    machine-wide, oversubscribing the node and silently breaking the
    1-task == 1-CPU accounting that cluster scaling relies on."""
    global _THREADS_LIMITED
    if _THREADS_LIMITED:
        return
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass
    _THREADS_LIMITED = True

#: postings parquet layout: term lookups prune at ROW GROUP granularity, so
#: 64-row groups give the selectivity while larger files avoid per-file
#: open/close overhead (the previous 64-row FILES meant tens of thousands of
#: files per segment)
POSTINGS_WRITE_ARGS = {"max_rows_per_file": 16384, "row_group_size": 16}

INDEX_META_FILE = "index_meta.json"
MANIFEST_FILE = "MANIFEST.json"
#: bump on storage-layout changes; readers refuse older indexes with a clear error
INDEX_FORMAT_VERSION = 3  # v2: norms as reserved-term posting rows; v3: blocks
# carry exact per-block min_dl for tight BM25 upper bounds (WAND)


# ---------------------------------------------------------------------------
# Phase 0 — doc-id assignment
# ---------------------------------------------------------------------------


def _conv_partial_counts(batch: pa.Table) -> pa.Table:
    """One partial row per conv RUN in the batch (cnt / max turn / turn sum).

    Run-length segmentation, not a hash group_by: transcripts arrive in
    (conv_id, turn_idx) order, so a conv is 1 run and the output is sorted —
    the tree-merge's sorted fast path then never sorts. A conv split across
    runs (unordered input) just emits multiple mergeable partial rows; the
    merge sums them, so correctness never depends on the ordering. The
    previous per-batch polars group_by was ~16 CPU-seconds of the 10M build
    (the docID phase's scaling-limiting term)."""
    _limit_worker_threads()
    conv = batch["conv_id"].combine_chunks()
    n = len(conv)
    if n == 0:
        # keep the SOURCE conv_id type (large_string sources would otherwise
        # schema-mismatch non-empty partials in the merge concat)
        return pa.table(
            {
                "conv_id": pa.array([], conv.type),
                "cnt": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
                "sm": pa.array([], pa.int64()),
            }
        )
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    if n == 1:
        starts = np.zeros(1, dtype=np.int64)
    else:
        neq = pa.compute.not_equal(
            conv.slice(1), conv.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1)).astype(np.int64)
    cnt = np.diff(np.append(starts, n)).astype(np.int64)
    return pa.table(
        {
            "conv_id": conv.take(pa.array(starts)),
            "cnt": pa.array(cnt),
            "mx": pa.array(np.maximum.reduceat(turn, starts)),
            "sm": pa.array(np.add.reduceat(turn, starts)),
        }
    )


def _validate_turn_density(
    convs, counts: np.ndarray, max_turn: np.ndarray, turn_sum: np.ndarray
) -> None:
    """turn_idx must be exactly {0..n-1} per conversation: the max check catches
    truncation, the sum check catches duplicated/missing indices that keep the
    same max (e.g. [0,0,2]) — those would mint duplicate doc_ids and only
    surface later as a confusing norms error at query time.

    ``convs`` may be a list OR an Arrow array; it is only indexed on failure
    (materializing millions of conv ids into Python was 10-20% of build time)."""
    ok = (max_turn + 1 == counts) & (turn_sum == counts * (counts - 1) // 2)
    if not ok.all():
        bad = convs[int(np.argmax(~ok))]
        if hasattr(bad, "as_py"):
            bad = bad.as_py()
        raise ValueError(
            f"turn_idx must be dense+unique 0..n-1 per conversation; violated by {bad!r}"
        )


def _merge_conv_partials(tables: List[pa.Table]) -> pa.Table:
    """Sort + segment-reduce per-batch conv partials into one conv-sorted table
    with ONE row per conv (cnt/sm summed, mx maxed). The merge is associative,
    so it runs identically as a tree-reduce leaf/root task or on the driver —
    sort + numpy reduceat measured ~15x faster than Ray's generic string-key
    groupby shuffle and ~2x an Arrow hash group_by for the same result."""
    parts = pa.concat_tables(tables)
    if parts.num_rows == 0:
        return parts
    conv_col = parts["conv_id"].combine_chunks()
    n = len(conv_col)
    # sorted fast path: ordered input yields sorted per-block partials whose
    # concat (block order) is already globally sorted — the O(n log n)
    # sort_indices + take was the tree root's ~1 s fixed tail at 10M
    if n > 1 and not pa.compute.all(
        pa.compute.less_equal(conv_col.slice(0, n - 1), conv_col.slice(1))
    ).as_py():
        order = pa.compute.sort_indices(parts["conv_id"])
        parts = parts.take(order)
        conv_col = parts["conv_id"].combine_chunks()
    if n == 1:
        starts = np.zeros(1, dtype=np.int64)
    else:
        neq = pa.compute.not_equal(
            conv_col.slice(1), conv_col.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1)).astype(np.int64)
    cnt_all = parts["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    mx_all = parts["mx"].to_numpy(zero_copy_only=False).astype(np.int64)
    sm_all = parts["sm"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "conv_id": conv_col.take(pa.array(starts)),
            "cnt": pa.array(np.add.reduceat(cnt_all, starts)),
            "mx": pa.array(np.maximum.reduceat(mx_all, starts)),
            "sm": pa.array(np.add.reduceat(sm_all, starts)),
        }
    )


def _merge_conv_partials_task(*tables) -> pa.Table:
    _limit_worker_threads()
    return _merge_conv_partials(list(tables))


#: tree-reduce fanout for the conv-partials merge; also the ref-count bound
#: under which the merge just runs on the driver (task overhead > work)
CONV_MERGE_FANOUT = 8

_MERGE_TASK = None  # lazily-created ray.remote wrapper (module import is ray-free)


def _conv_offsets(ds) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Conversation -> turn count (+ density/uniqueness validation).

    Pre-aggregated per batch (one partial row per conv per batch), then
    tree-reduced in Ray tasks (fanout :data:`CONV_MERGE_FANOUT`) down to a
    single conv-sorted table — the driver never sorts the O(sum partial rows)
    concat (~0.9 s serial at 10M turns, the build's residual Amdahl term; every
    serial driver second costs the wide level 4x the ratio damage of the narrow
    one). Driver memory stays O(#convs) for the final map; past
    ``DOCID_DRIVER_MAX_ROWS`` input rows, ``build_index`` switches to the
    range-partitioned :func:`_docmap_ranged` path instead."""
    import ray

    # narrow the scan to 2 columns. select_columns does NOT push into
    # ReadParquet (verified on this Ray version: the projected stream still
    # decodes + ships the text payload, ~2.5x the cost), so when the dataset
    # is a plain parquet read we re-read the source with columns= instead.
    # CONTRACT: _lucille_parquet_src is set ONLY by read_transcripts, directly
    # on the untransformed read of that exact path (transforms return new
    # Dataset objects, so the tag cannot leak through a map/filter); the
    # source files must not change between this counts scan and the docmap
    # scan that consumes `ds`, or doc_ids desync — see read_transcripts.
    src = getattr(ds, "_lucille_parquet_src", None)
    if src is not None:
        import ray.data

        narrow = ray.data.read_parquet(src, columns=["conv_id", "turn_idx"])
    else:
        narrow = ds.select_columns(["conv_id", "turn_idx"])
    refs = narrow.map_batches(
        _conv_partial_counts, batch_format="pyarrow", batch_size=65536
    ).to_arrow_refs()
    if len(refs) > CONV_MERGE_FANOUT:
        global _MERGE_TASK
        if _MERGE_TASK is None:
            _MERGE_TASK = ray.remote(num_cpus=1)(_merge_conv_partials_task)
        while len(refs) > 1:
            refs = [
                _MERGE_TASK.remote(*refs[i : i + CONV_MERGE_FANOUT])
                for i in range(0, len(refs), CONV_MERGE_FANOUT)
            ]
        merged = ray.get(refs[0])
    else:
        merged = _merge_conv_partials(ray.get(refs))
    if merged.num_rows == 0:
        empty = np.zeros(0, dtype=np.int64)
        return pa.array([], pa.string()), empty, empty.copy()
    counts = merged["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    max_turn = merged["mx"].to_numpy(zero_copy_only=False).astype(np.int64)
    turn_sum = merged["sm"].to_numpy(zero_copy_only=False).astype(np.int64)
    convs = merged["conv_id"].combine_chunks()  # stays Arrow; no Python list
    _validate_turn_density(convs, counts, max_turn, turn_sum)
    bases = np.zeros(len(convs), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    return convs, bases, counts


_CONV_MAP_CACHE: Dict[str, dict] = {}


def _assign_doc_ids(
    batch: pa.Table, conv_map_ref, seg_target: int, num_segments: int,
    seg_base: int = 0, base_lo: int = 0,
) -> pa.Table:
    """Attach doc_id/seg. The conv->base table is broadcast as an Arrow table
    (``ray.get`` of it is zero-copy from local plasma); per WORKER PROCESS it is
    converted ONCE into a sorted numpy unicode array + base vector, so the
    per-batch lookup is a vectorized ``np.searchsorted`` (the previous per-row
    Python dict loop was the docmap hot path; a pickled dict per task before
    that measured 123us/row)."""
    _limit_worker_threads()
    import ray

    key = conv_map_ref.hex()
    lookup = _CONV_MAP_CACHE.get(key)
    if lookup is None:
        tbl = ray.get(conv_map_ref)
        conv_sorted = tbl["conv_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(str)  # sorted by construction (_conv_offsets sorts)
        base_sorted = tbl["base"].to_numpy().astype(np.int64)
        _CONV_MAP_CACHE.clear()  # one build at a time; don't hold stale maps
        lookup = _CONV_MAP_CACHE[key] = (conv_sorted, base_sorted)
    conv_sorted, base_sorted = lookup
    convs = batch["conv_id"].to_numpy(zero_copy_only=False).astype(conv_sorted.dtype)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.searchsorted(conv_sorted, convs)
    idx = np.clip(idx, 0, conv_sorted.size - 1)
    if not (conv_sorted[idx] == convs).all():
        missing = convs[conv_sorted[idx] != convs][0]
        raise ValueError(f"conv_id {missing!r} not present in the offsets map")
    bases = base_sorted[idx]
    doc_id = bases + turn
    # seg_base/base_lo support append_index: appended conversations' bases are
    # global (>= the committed index's total_docs) but segment numbering within
    # the append batch is relative
    seg = seg_base + np.minimum((bases - base_lo) // seg_target, num_segments - 1)
    return batch.append_column("doc_id", pa.array(doc_id)).append_column(
        "seg", pa.array(seg.astype(np.int32))
    )


#: past this many input rows, build_index's docid_mode="auto" switches from the
#: driver conv-map merge (O(#conversations) driver memory) to the fully
#: distributed range-partitioned path
DOCID_DRIVER_MAX_ROWS = 50_000_000


def _conv_block_stats(tbl: pa.Table) -> Tuple[int, int]:
    """Validate one sorted conv-count block and return (n_convs, total_turns)."""
    counts = tbl["sum(cnt)"].to_numpy().astype(np.int64)
    max_turn = tbl["max(mx)"].to_numpy().astype(np.int64)
    turn_sum = tbl["sum(sm)"].to_numpy().astype(np.int64)
    _validate_turn_density(tbl["conv_id"], counts, max_turn, turn_sum)
    return tbl.num_rows, int(counts.sum())


def _conv_block_bases(tbl: pa.Table, block_base: int) -> pa.Table:
    """One sorted conv-count block + its global base -> (conv_id, base, cnt)."""
    counts = tbl["sum(cnt)"].to_numpy().astype(np.int64)
    bases = np.full(counts.size, block_base, dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    bases[1:] += block_base
    return pa.table(
        {
            "conv_id": tbl["conv_id"],
            "base": pa.array(bases),
            "cnt": pa.array(counts),
        }
    )


def _seg_bounds_partial(
    tbl: pa.Table, seg_target: int, num_segments: int
) -> List[Tuple[int, int, int]]:
    """Per-segment (seg, lo, hi) partials from one (conv_id, base, cnt) block."""
    base = tbl["base"].to_numpy()
    cnt = tbl["cnt"].to_numpy()
    seg = np.minimum(base // seg_target, num_segments - 1)
    out = []
    for s in np.unique(seg):
        m = seg == s
        out.append((int(s), int(base[m].min()), int((base[m] + cnt[m]).max())))
    return out


def _assign_from_base(batch: pa.Table, seg_target: int, num_segments: int) -> pa.Table:
    """Post-join doc-id assignment: rows already carry the conversation base."""
    _limit_worker_threads()
    base = batch["base"].to_numpy(zero_copy_only=False).astype(np.int64)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = base + turn
    seg = np.minimum(base // seg_target, num_segments - 1)
    keep = [c for c in batch.column_names if c not in ("base", "cnt")]
    out = batch.select(keep)
    return out.append_column("doc_id", pa.array(doc_id)).append_column(
        "seg", pa.array(seg.astype(np.int32))
    )


def _docmap_ranged(ds, num_segments_hint: int):
    """Fully distributed conversation-offset assignment (no O(#convs) driver
    state): per-batch partial counts -> distributed groupby(conv_id) sum ->
    range-partitioned sort(conv_id) -> per-block totals (driver holds only
    O(#blocks) integers) -> per-block prefixed base tables left IN the object
    store. Returns (conv_bases_ds, base_refs, total_docs, n_convs).

    The caller joins the input against conv_bases_ds on conv_id (distributed
    hash join) instead of broadcasting a driver dict — the 10^12-turn path the
    docstring of :func:`_conv_offsets` promises."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    agg = (
        ds.select_columns(["conv_id", "turn_idx"])  # prune text off the scan
        .map_batches(_conv_partial_counts, batch_format="pyarrow",
                     batch_size=65536)
        .groupby("conv_id")
        .aggregate(Sum("cnt"), Max("mx"), Sum("sm"))
    )
    sorted_counts = agg.sort("conv_id").materialize()
    refs = sorted_counts.to_arrow_refs()
    stats_task = ray.remote(num_cpus=0.5)(_conv_block_stats)
    stats = ray.get([stats_task.remote(r) for r in refs])
    totals = np.array([s[1] for s in stats], dtype=np.int64)
    n_convs = int(sum(s[0] for s in stats))
    total_docs = int(totals.sum())
    block_bases = np.zeros(len(refs), dtype=np.int64)
    if len(refs) > 1:
        np.cumsum(totals[:-1], out=block_bases[1:])
    base_task = ray.remote(num_cpus=0.5)(_conv_block_bases)
    base_refs = [
        base_task.remote(r, int(b)) for r, b in zip(refs, block_bases)
    ]
    conv_ds = ray.data.from_arrow_refs(base_refs)
    return conv_ds, base_refs, total_docs, n_convs


# ---------------------------------------------------------------------------
# Phase 1 — tokenize -> partial postings (vectorized)
# ---------------------------------------------------------------------------


class _TokenizePartials:
    """Batch -> one partial-postings row per (field, term, bucket).

    Vectorized: Arrow lower/split kernels + numpy position arithmetic + polars
    group_by (Rust) — no Python loop over rows or tokens.
    """

    def __init__(self, fields: Sequence[str], range_width: int):
        self.fields = tuple(fields)
        self.range_width = range_width

    def __call__(self, batch: pa.Table) -> pa.Table:
        _limit_worker_threads()
        import polars as pl

        doc_np = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs = []
        for field in self.fields:
            toks = arrow_tokenize(batch[field])
            flat = toks.flatten()
            if len(flat) == 0:
                continue
            counts = pa.compute.list_value_length(toks).to_numpy(zero_copy_only=False)
            counts = np.nan_to_num(counts, nan=0).astype(np.int64)
            offsets = np.zeros(counts.size + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            doc_rep = np.repeat(doc_np, counts)
            pos = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
                offsets[:-1], counts
            )
            df = pl.DataFrame(
                {
                    "doc_id": doc_rep,
                    "term": pl.from_arrow(flat),
                    "pos": pos.astype(np.int32),
                }
            )
            per_doc = (
                df.group_by(["term", "doc_id"], maintain_order=True)
                .agg(
                    pl.len().cast(pl.Int32).alias("tf"),
                    pl.col("pos").alias("positions"),  # already Int32
                )
                .sort(["term", "doc_id"])
                .with_columns((pl.col("doc_id") // self.range_width).alias("bucket"))
            )
            partial = per_doc.group_by(["term", "bucket"], maintain_order=True).agg(
                pl.col("doc_id").alias("doc_ids"),
                pl.col("tf").alias("tfs"),
                pl.col("positions").explode().alias("pos"),
            )
            tbl = partial.to_arrow()
            tbl = tbl.append_column(
                "field", pa.array([field] * len(tbl), pa.string())
            )
            outs.append(
                tbl.select(["field", "term", "bucket", "doc_ids", "tfs", "pos"])
            )
            # norms partial rows (reserved term; dl per doc, split per bucket)
            nd, ndl, _ = sort_postings(doc_np, counts, None)
            bks = nd // self.range_width
            starts = np.flatnonzero(
                np.concatenate([[True], bks[1:] != bks[:-1]])
            )
            ends = np.append(starts[1:], nd.size)
            outs.append(
                pa.table(
                    {
                        "field": pa.array([field] * starts.size, pa.string()),
                        "term": pa.array([NORMS_TERM] * starts.size, pa.large_string()),
                        "bucket": pa.array(bks[starts], pa.int64()),
                        "doc_ids": pa.array(
                            [nd[a:b].tolist() for a, b in zip(starts, ends)],
                            pa.large_list(pa.int64()),
                        ),
                        "tfs": pa.array(
                            [ndl[a:b].tolist() for a, b in zip(starts, ends)],
                            pa.large_list(pa.int32()),
                        ),
                        "pos": pa.array(
                            [[] for _ in range(starts.size)],
                            pa.large_list(pa.int32()),
                        ),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "field": pa.array([], pa.string()),
                    "term": pa.array([], pa.large_string()),
                    "bucket": pa.array([], pa.int64()),
                    "doc_ids": pa.array([], pa.large_list(pa.int64())),
                    "tfs": pa.array([], pa.large_list(pa.uint32())),
                    "pos": pa.array([], pa.large_list(pa.int64())),
                }
            )
        return pa.concat_tables(outs, promote_options="permissive")


class _TokenizeEncode(_TokenizePartials):
    """Shuffle-free postings build (doc_partitioned layout): each batch emits its
    *final* encoded posting rows, with ``bucket = min doc_id of the piece``.

    Works because posting rows of one term only need to concatenate back in
    doc-id order at read time — the reader doc-sorts on decode when pieces
    interleave (rare). Hot terms are spread across every batch by construction,
    so there is no skewed merge task and no all-to-all exchange at all; the only
    cost is one posting row per (term, batch) instead of per (term, bucket).
    ``_piece_merge_batch`` (in-build, window-local) and ``compact_index``
    (post-build, global sort-merge) consolidate the pieces."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        _limit_worker_threads()
        doc_np = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_field, out_term, out_bucket = [], [], []
        out_df, out_ttf, out_blocks = [], [], []
        if doc_np.size == 0:
            return self._empty_table()
        for field in self.fields:
            toks = arrow_tokenize(batch[field])
            flat = toks.flatten()
            n_tok = len(flat)
            counts = pa.compute.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            # norms ride along as a reserved-term posting row: every doc of the
            # batch (dl=0 included), tfs = field length — no extra tokenize pass
            nd, ndl, _ = sort_postings(doc_np, counts, None)
            out_field.append(field)
            out_term.append(NORMS_TERM)
            out_bucket.append(int(nd[0]) if nd.size else 0)
            out_df.append(int(nd.size))
            out_ttf.append(int(ndl.sum()))
            out_blocks.append(encode_postings(nd, ndl, None))
            if n_tok == 0:
                continue
            offsets = np.zeros(counts.size + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            doc_rep = np.repeat(doc_np, counts)
            pos = np.arange(n_tok, dtype=np.int64) - np.repeat(offsets[:-1], counts)

            # dictionary-encode terms (C), map codes to sorted-term ranks, then one
            # stable lexsort by (rank, doc) — token order inside a (term, doc) run
            # stays ascending, so positions need no further sorting
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dict_terms = np.asarray(denc.dictionary.to_pylist(), dtype=object)
            term_order = np.argsort(dict_terms, kind="stable")
            rank_of_code = np.empty(dict_terms.size, dtype=np.int64)
            rank_of_code[term_order] = np.arange(dict_terms.size, dtype=np.int64)
            ranks = rank_of_code[codes]
            order = np.lexsort((doc_rep, ranks))
            r_s, d_s, p_s = ranks[order], doc_rep[order], pos[order]

            # run = one (term, doc); group = one (term, range-bucket)
            newrun = np.empty(n_tok, dtype=bool)
            newrun[0] = True
            newrun[1:] = (r_s[1:] != r_s[:-1]) | (d_s[1:] != d_s[:-1])
            run_starts = np.flatnonzero(newrun)
            nruns = run_starts.size
            run_tok_ends = np.append(run_starts[1:], n_tok)
            tf = run_tok_ends - run_starts
            run_docs = d_s[run_starts]
            run_ranks = r_s[run_starts]
            # exact per-posting doc length (for per-block min_dl): one
            # vectorized lookup against the batch's sorted (doc, dl) arrays
            run_dls = ndl[np.searchsorted(nd, run_docs)]
            run_buckets = run_docs // self.range_width
            newgrp = np.empty(nruns, dtype=bool)
            newgrp[0] = True
            newgrp[1:] = (run_ranks[1:] != run_ranks[:-1]) | (
                run_buckets[1:] != run_buckets[:-1]
            )
            grp_starts = np.flatnonzero(newgrp)
            grp_ends = np.append(grp_starts[1:], nruns)
            for a, b in zip(grp_starts, grp_ends):
                d = run_docs[a:b]
                t = tf[a:b]
                p = p_s[run_starts[a]: run_tok_ends[b - 1]]
                out_field.append(field)
                out_term.append(dict_terms[term_order[run_ranks[a]]])
                out_bucket.append(int(d[0]))
                out_df.append(int(d.size))
                out_ttf.append(int(t.sum()))
                out_blocks.append(encode_postings(d, t, p, dls=run_dls[a:b]))
        return pa.table(
            {
                "field": pa.array(out_field, pa.string()),
                "term": pa.array(out_term, pa.string()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "df": pa.array(out_df, pa.int64()),
                "total_tf": pa.array(out_ttf, pa.int64()),
                "blocks": pa.array(
                    out_blocks,
                    pa.list_(POSTINGS_SCHEMA.field("blocks").type.value_type),
                ),
            }
        )

    @staticmethod
    def _empty_table() -> pa.Table:
        return pa.table(
            {
                "field": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "total_tf": pa.array([], pa.int64()),
                "blocks": pa.array(
                    [], pa.list_(POSTINGS_SCHEMA.field("blocks").type.value_type)
                ),
            }
        )


class _SparseDls:
    """Doc-length lookup over a sparse (sorted docs, dls) pair.

    Quacks like the dense per-segment norms array compaction hands to
    ``_reencode`` (``arr[doc_ids]``): docs absent from the window map to dl=0,
    which makes the re-encoded block's ``min_dl`` 0 — readers then fall back to
    the windowed norms bound (looser but still admissible for WAND)."""

    __slots__ = ("docs", "dls")

    def __init__(self, docs: np.ndarray, dls: np.ndarray):
        self.docs, self.dls = docs, dls

    def __getitem__(self, doc_arr: np.ndarray) -> np.ndarray:
        if self.docs.size == 0:
            return np.zeros(len(doc_arr), np.int64)
        idx = np.clip(np.searchsorted(self.docs, doc_arr), 0, self.docs.size - 1)
        return np.where(self.docs[idx] == doc_arr, self.dls[idx], 0)


def _window_norms(batch: pa.Table) -> dict:
    """field -> :class:`_SparseDls` decoded from the window's NORMS_TERM piece
    rows. Each tokenize piece carries a norms row covering exactly its docs, so
    a window of whole pieces resolves every doc its term rows reference; docs
    orphaned by a piece split at a window boundary just degrade to min_dl=0."""
    from .codec import decode_postings

    out: dict = {}
    sub = batch.filter(pa.compute.equal(batch["term"], NORMS_TERM))
    for f in set(sub["field"].to_pylist()):
        rows = sub.filter(pa.compute.equal(sub["field"], f))
        blocks = [b for row in rows["blocks"].to_pylist() for b in row]
        docs, dls, _ = decode_postings(blocks, want_positions=False)
        docs, dls, _ = sort_postings(docs, dls, None)
        out[f] = _SparseDls(docs, dls)
    return out


#: in-build merge engages only when at least this fraction of a window's
#: blocks are undersized fragments: merging buys nothing on low-fragmentation
#: windows (long runs of full blocks — e.g. hot terms over big batches) and
#: its row materialization cost measured a 22% 8-cpu build-throughput hit on
#: such a corpus (BASELINE.md); heavy-tailed real vocabularies sit far above
#: this threshold and merge every window
PIECE_MERGE_MIN_FRAG = 0.25


def _piece_merge_batch(batch: pa.Table) -> pa.Table:
    """In-build piece compaction (shuffle-free): locally sort a window of
    tokenize-encode piece rows by (field, term, bucket) and merge each term's
    adjacent undersized fragments with the same LSM-style block-preserving
    merge full compaction uses (``compact._merge_sorted_batch``).

    Bounds pieces-per-term by ``ceil(segment_rows / window_rows)`` instead of
    ``ceil(segment_docs / batch_docs)`` — at a 2.5M-doc segment with 4k-doc
    tokenize batches that is ~600 piece rows (each trailing an undersized
    fragment block) collapsing to a handful — while keeping the build's
    zero-all-to-all property: the merge only ever sees rows already on this
    worker. Output rows stay (field, term)-clustered, so parquet row-group
    min/max stats prune term lookups even before full compaction.

    Merge POLICY (LSM-style): a zero-copy peek at the window's per-block
    posting counts decides whether merging pays; barely-fragmented windows
    pass through untouched."""
    _limit_worker_threads()
    if batch.num_rows <= 1:
        return batch
    from .codec import BLOCK_SIZE

    ns = (
        batch["blocks"].combine_chunks().flatten().field("n").to_numpy(
            zero_copy_only=False
        )
    )
    if ns.size == 0 or (ns < BLOCK_SIZE).mean() < PIECE_MERGE_MIN_FRAG:
        return batch
    from .compact import _merge_sorted_batch

    batch = batch.sort_by(
        [("field", "ascending"), ("term", "ascending"), ("bucket", "ascending")]
    )
    return _merge_sorted_batch(batch, norms=_window_norms(batch))


def _encode_group(group: pa.Table) -> pa.Table:
    """Merge the partial rows of one (field, term, bucket) group and block-encode."""
    field = group["field"][0].as_py()
    term = group["term"][0].as_py()
    bucket = group["bucket"][0].as_py()
    # zero-copy-ish: flatten the list columns straight to numpy (row order is
    # preserved, which keeps the doc->positions alignment)
    doc_ids = (
        group["doc_ids"].combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    )
    tfs = (
        group["tfs"].combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pos = (
        group["pos"].combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    )
    # partials are disjoint doc SETS but their ranges can interleave (a read batch
    # may span non-adjacent blocks) -> full doc sort with position gather
    if term == NORMS_TERM:
        doc_ids, tfs, _ = sort_postings(doc_ids, tfs, None)
        pos = None
    else:
        doc_ids, tfs, pos = sort_postings(doc_ids, tfs, pos)
    # no dls here: shipping per-posting doc lengths through the shuffle would
    # inflate the exchange; term_partitioned blocks keep min_dl=0 and readers
    # fall back to the windowed norms bound (still admissible, just looser)
    blocks = encode_postings(doc_ids, tfs, pos)
    return pa.table(
        {
            "field": pa.array([field], pa.string()),
            "term": pa.array([term], pa.string()),
            "bucket": pa.array([int(bucket)], pa.int64()),
            "df": pa.array([int(doc_ids.size)], pa.int64()),
            "total_tf": pa.array([int(tfs.sum())], pa.int64()),
            "blocks": pa.array([blocks], pa.list_(POSTINGS_SCHEMA.field("blocks").type.value_type)),
        }
    )


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def _ensure_threadsafe_fs_imports() -> None:
    """Ray's path resolution does ``from fsspec.implementations.http import
    HTTPFileSystem`` on every read. Without aiohttp installed that import always
    raises ModuleNotFoundError (which Ray catches) — but when two threads race
    it, Python can surface a bare ImportError instead, which Ray does NOT catch.
    Pre-install a stub module so the import resolves deterministically; the stub
    class never matches any isinstance check."""
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    import types

    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # noqa: N801 - mirrors the real class name
        pass

    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules.setdefault("fsspec.implementations.http", stub)


def _segment_dir(index_dir: str, seg: int) -> str:
    return os.path.join(index_dir, "segments", f"seg-{seg:05d}")


def segment_complete(index_dir: str, seg: int) -> bool:
    mf = os.path.join(_segment_dir(index_dir, seg), MANIFEST_FILE)
    if not os.path.exists(mf):
        return False
    try:
        with open(mf) as f:
            return json.load(f).get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def build_index(
    ds,
    index_dir: str,
    *,
    fields: Sequence[str] = INDEXED_FIELDS,
    num_segments: int = 2,
    range_width: int = DEFAULT_RANGE_WIDTH,
    batch_size: Optional[int] = 4096,
    resume: bool = True,
    layout: str = "doc_partitioned",
    docid_mode: str = "auto",
    piece_merge_rows: Optional[int] = "auto",
) -> dict:
    """Build (or resume building) an index over a transcripts Dataset.

    Returns the index meta dict. Re-running with ``resume=True`` skips segments
    whose manifest is complete — the checkpoint/resume contract of north_rule.

    ``docid_mode``: how conversation base offsets are assigned.

    * ``driver`` — per-batch partial counts merged on the driver, conv->base
      broadcast via ``ray.put`` (fast at small/medium scale; O(#conversations)
      driver memory).
    * ``ranged`` — fully distributed: groupby(conv_id) -> sort(conv_id) ->
      per-block prefix offsets in the object store -> distributed hash join of
      the input against the base table. Driver holds O(#blocks) integers only;
      the 10^12-turn path.
    * ``auto`` (default) — ``ranged`` when the input exceeds
      ``DOCID_DRIVER_MAX_ROWS`` rows (``ds.count()`` is metadata-cheap for
      parquet reads), else ``driver``.

    ``layout``:

    * ``doc_partitioned`` (default) — each tokenize task emits final encoded
      posting pieces for its doc range; NO all-to-all exchange. Hot terms are
      spread across every piece by construction, eliminating both the shuffle
      barrier and skewed merge tasks. Posting lists are piecewise; the reader
      concatenates (and rarely re-sorts) on decode.
    * ``term_partitioned`` — the classic groupby(field, term, bucket) shuffle
      into one consolidated row per key (north_star's architecture); costs an
      all-to-all over the postings volume but yields maximally compact lists.

    ``piece_merge_rows`` (doc_partitioned only): window size (piece rows) for
    in-build piece compaction — each window of tokenize outputs is locally
    (field, term, bucket)-sorted and fragment-merged (``_piece_merge_batch``)
    before hitting parquet, bounding pieces-per-term without any exchange.
    ``None``/0 writes raw per-batch pieces (round-1 behavior). Sizing: the
    merge stage's task count is ``total_piece_rows / window``; too large a
    window starves CPUs on small-vocabulary corpora (a 262144 default measured
    2-3 merge tasks per 10M-turn segment and dragged 2→8-cpu build scaling to
    0.63), while a window below one tokenize batch's row count merges nothing.
    """
    import ray
    import ray.data

    if piece_merge_rows == "auto":
        piece_merge_rows = int(os.environ.get("LR_PIECE_MERGE_ROWS", 65_536)) or None

    os.makedirs(index_dir, exist_ok=True)
    t_start = time.time()
    phase_metrics: Dict[str, float] = {}
    timing = os.environ.get("LR_BUILD_TIMING")

    def _tick(label: str, t0: float) -> None:
        if timing:
            import sys

            print(f"[build] {label}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    docmapped_root = os.path.join(index_dir, "docmapped")
    meta_path = os.path.join(index_dir, INDEX_META_FILE)

    meta = None
    fused_src = None
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("docmap") == "fused" and not all(
            segment_complete(index_dir, s)
            for s in range(meta["num_segments"])
        ):
            # fused builds keep no docmap checkpoint — a half-built fused
            # index resumes by recomputing (it is single-segment by
            # construction, so the segment WAS the checkpoint granularity)
            meta = None
    if meta is None:
        if os.path.isdir(docmapped_root):
            # a half-written docmap (no meta yet) must not be appended to
            import shutil

            shutil.rmtree(docmapped_root)
        mode = docid_mode
        if mode == "auto":
            try:
                mode = "ranged" if ds.count() > DOCID_DRIVER_MAX_ROWS else "driver"
            except Exception:
                mode = "driver"
        t0 = time.time()
        if mode == "ranged":
            conv_ds, base_refs, total_docs, n_convs = _docmap_ranged(ds, num_segments)
            _tick("conv_offsets_ranged", t0)
            num_segments = max(1, min(num_segments, n_convs))
            seg_target = -(-total_docs // num_segments) if total_docs else 1  # ceil
            bounds_task = ray.remote(num_cpus=0.5)(_seg_bounds_partial)
            partials = ray.get(
                [bounds_task.remote(r, seg_target, num_segments) for r in base_refs]
            )
            seg_bounds = {str(s): [0, 0] for s in range(num_segments)}
            seen = set()
            for part in partials:
                for s, lo_p, hi_p in part:
                    key = str(s)
                    if s in seen:
                        seg_bounds[key] = [
                            min(seg_bounds[key][0], lo_p),
                            max(seg_bounds[key][1], hi_p),
                        ]
                    else:
                        seg_bounds[key] = [lo_p, hi_p]
                        seen.add(s)
            mapped = ds.join(
                conv_ds,
                join_type="inner",
                num_partitions=max(8, num_segments * 2),
                on=("conv_id",),
            ).map_batches(
                _assign_from_base,
                fn_args=(seg_target, num_segments),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        else:
            convs, bases, counts = _conv_offsets(ds)
            _tick("conv_offsets", t0)
            total_docs = int(counts.sum())
            num_segments = max(1, min(num_segments, len(convs)))
            seg_target = -(-total_docs // num_segments)  # ceil
            conv_map_ref = ray.put(
                pa.table({"conv_id": convs, "base": pa.array(bases)})
            )
            mapped = ds.map_batches(
                _assign_doc_ids,
                fn_args=(conv_map_ref, seg_target, num_segments),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
            seg_bounds = {}
            seg_of_conv = np.minimum(bases // seg_target, num_segments - 1)
            for s in range(num_segments):
                mask = seg_of_conv == s
                if mask.any():
                    lo = int(bases[mask][0])
                    hi = int(bases[mask][-1] + counts[mask][-1])
                else:
                    lo = hi = 0
                seg_bounds[str(s)] = [lo, hi]
        fused = (
            num_segments == 1
            and os.environ.get("LR_FUSE_DOCMAP", "1") != "0"
        )
        t0 = time.time()
        if fused:
            # single segment: the docmapped parquet checkpoint would be a full
            # corpus write + re-read with zero resume value (one segment means
            # rebuild-on-crash either way) — stream the assigned Dataset
            # straight into the segment's tokenize pipeline instead. Result
            # metadata (doc_id -> conv_id, turn_idx) comes from an O(#convs)
            # convmap (doc_id = base + turn_idx by construction), not an
            # O(#turns) forward index.
            fused_src = mapped
            if mode == "driver":
                # cast to string: the partials arrive via polars large_string,
                # and doc_meta output must concat with docmapped-backed
                # segments (plain string) after an append
                convmap = pa.table(
                    {
                        "conv_id": pa.compute.cast(convs, pa.string()),
                        "base": pa.array(bases),
                        "cnt": pa.array(counts),
                    }
                )
                pq.write_table(
                    convmap, os.path.join(index_dir, "convmap.parquet")
                )
            else:
                # ranged mode: the per-block base tables are already in the
                # object store, sorted by base across blocks
                ray.data.from_arrow_refs(base_refs).write_parquet(
                    os.path.join(index_dir, "convmap.parquet")
                )
            phase_metrics["docmap_sec"] = round(time.time() - t0, 3)
        else:
            mapped.write_parquet(docmapped_root, partition_cols=["seg"])
            phase_metrics["docmap_sec"] = round(time.time() - t0, 3)
            _tick("docmap_write", t0)
        phase_metrics["docid_mode"] = mode
        meta = {
            "version": INDEX_FORMAT_VERSION,
            "fields": list(fields),
            "num_segments": num_segments,
            "range_width": range_width,
            "layout": layout,
            "total_docs": total_docs,
            "seg_bounds": seg_bounds,
            "analyzer": "lower+[a-z0-9]",
            "docmap": "fused" if fused else "parquet",
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)

    pending = [
        seg
        for seg in range(meta["num_segments"])
        if not (resume and segment_complete(index_dir, seg))
    ]

    def _run(seg: int) -> None:
        t0 = time.time()
        _build_segment(
            index_dir,
            seg,
            docmapped_root,
            fields=meta["fields"],
            range_width=meta["range_width"],
            batch_size=batch_size,
            seg_bounds=meta["seg_bounds"][str(seg)],
            layout=meta.get("layout", "term_partitioned"),
            piece_merge_rows=piece_merge_rows,
            src_ds=fused_src,
        )
        phase_metrics[f"segment_{seg}_sec"] = round(time.time() - t0, 3)
        _tick(f"segment {seg}", t0)

    if len(pending) <= 1:
        for seg in pending:
            _run(seg)
    else:
        # overlap segment pipelines (separate Ray Data executions) so fixed
        # per-execution latency hides behind other segments' compute; each
        # segment still commits its own manifest -> checkpoint granularity kept
        _ensure_threadsafe_fs_imports()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(pending))) as ex:
            list(ex.map(_run, pending))

    meta["build_seconds"] = round(time.time() - t_start, 3)
    # structured per-phase metrics report (docmap + per-segment wall; the
    # per-operator Ray Data stats live in each segment's stage_stats.txt)
    phase_metrics["total_sec"] = meta["build_seconds"]
    try:
        with open(os.path.join(index_dir, "build_metrics.json"), "w") as fh:
            json.dump(phase_metrics, fh, indent=1)
    except OSError:
        pass
    return meta


def append_index(
    ds,
    index_dir: str,
    *,
    num_segments: int = 1,
    batch_size: Optional[int] = 4096,
    piece_merge_rows: Optional[int] = "auto",
) -> dict:
    """Incremental ingest: index new conversations into an EXISTING index as
    fresh segments — a Lucene-style commit-point append, no rebuild.

    Contract:

    * the appended Dataset holds WHOLE conversations (turn_idx dense 0..n-1 per
      conv — validated) whose conv_ids are new to the index; re-appending an
      existing conversation duplicates it, exactly like Lucene addDocument
      (no global membership check — at 10^11 conversations that test IS the
      docmap; dedup upstream or compact with a tombstone pass).
    * appended docs get ids starting at the committed ``total_docs``, in sorted
      conv order within the batch. Existing doc ids never change.
    * the COMMIT is the atomic index-meta rewrite after every new segment's
      manifest is complete. A crash anywhere before that leaves the index
      serving exactly the previous commit (readers open only the segments the
      meta records); a re-run wipes the uncommitted leftovers and redoes the
      append. BM25 global stats (df, avgdl) pick up the new segments on the
      next engine plan — scores naturally shift with the corpus, as they must.
    """
    import shutil

    import ray
    import ray.data

    if piece_merge_rows == "auto":
        piece_merge_rows = int(os.environ.get("LR_PIECE_MERGE_ROWS", 65_536)) or None

    meta_path = os.path.join(index_dir, INDEX_META_FILE)
    with open(meta_path) as f:
        meta = json.load(f)
    base0 = int(meta["total_docs"])
    seg0 = int(meta["num_segments"])
    docmapped_root = os.path.join(index_dir, "docmapped")
    seg_root = os.path.join(index_dir, "segments")

    # wipe uncommitted leftovers from a crashed previous append
    if os.path.isdir(docmapped_root):
        for name in os.listdir(docmapped_root):
            if name.startswith("seg=") and int(name.split("=", 1)[1]) >= seg0:
                shutil.rmtree(os.path.join(docmapped_root, name))
    if os.path.isdir(seg_root):
        for name in os.listdir(seg_root):
            try:
                num = int(name.split("-", 1)[1])
            except (IndexError, ValueError):
                continue
            if num >= seg0:
                shutil.rmtree(os.path.join(seg_root, name))

    convs, bases, counts = _conv_offsets(ds)
    total_new = int(counts.sum())
    if total_new == 0:
        return meta
    nseg = max(1, min(num_segments, len(convs)))
    seg_target = -(-total_new // nseg)  # ceil
    conv_map_ref = ray.put(
        pa.table({"conv_id": convs, "base": pa.array(bases + base0)})
    )
    ds.map_batches(
        _assign_doc_ids,
        fn_args=(conv_map_ref, seg_target, nseg, seg0, base0),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).write_parquet(docmapped_root, partition_cols=["seg"])

    new_bounds = {}
    seg_of_conv = np.minimum(bases // seg_target, nseg - 1)
    for s in range(nseg):
        mask = seg_of_conv == s
        if mask.any():
            lo = int(bases[mask][0]) + base0
            hi = int(bases[mask][-1] + counts[mask][-1]) + base0
        else:
            lo = hi = 0
        new_bounds[str(seg0 + s)] = [lo, hi]

    def _run(s: int) -> None:
        _build_segment(
            index_dir,
            seg0 + s,
            docmapped_root,
            fields=meta["fields"],
            range_width=meta["range_width"],
            batch_size=batch_size,
            seg_bounds=new_bounds[str(seg0 + s)],
            layout=meta.get("layout", "doc_partitioned"),
            piece_merge_rows=piece_merge_rows,
        )

    if nseg == 1:
        _run(0)
    else:
        _ensure_threadsafe_fs_imports()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, nseg)) as ex:
            list(ex.map(_run, range(nseg)))

    # ---- commit: atomic meta rewrite ----
    meta["total_docs"] = base0 + total_new
    meta["num_segments"] = seg0 + nseg
    meta["seg_bounds"].update(new_bounds)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    return meta


def _build_segment(
    index_dir: str,
    seg: int,
    docmapped_root: str,
    *,
    fields: Sequence[str],
    range_width: int,
    batch_size: Optional[int],
    seg_bounds: List[int],
    layout: str = "doc_partitioned",
    piece_merge_rows: Optional[int] = None,
    src_ds=None,
) -> None:
    import ray.data
    from ray.data.aggregate import Sum

    import shutil

    seg_dir = _segment_dir(index_dir, seg)
    # idempotent rebuild: a half-written segment (no complete manifest) is wiped so
    # parquet writes never append onto stale part files
    if os.path.isdir(seg_dir):
        shutil.rmtree(seg_dir)
    os.makedirs(seg_dir, exist_ok=True)
    lo, hi = seg_bounds
    if src_ds is not None:
        # fused docmap: the doc-id-assigned Dataset streams straight into the
        # tokenize pipeline (no corpus round-trip through docmapped parquet)
        seg_input = f"{docmapped_root}:fused"
        if lo == hi:
            _write_manifest(index_dir, seg, seg_input, 0, 0, fields, empty=True)
            return
        src = src_ds.select_columns(["doc_id", *fields])
    else:
        seg_input = os.path.join(docmapped_root, f"seg={seg}")
        if not os.path.isdir(seg_input):
            if lo != hi:
                # the docmap says this segment holds docs [lo, hi) but its input
                # directory is gone (e.g. docmapped/ deleted while index_meta.json
                # survived) — committing an empty 'complete' manifest would silently
                # serve an index missing all of those documents
                raise ValueError(
                    f"segment {seg} input {seg_input} is missing but seg_bounds says "
                    f"docs [{lo}, {hi}) live there; delete {INDEX_META_FILE} (or the "
                    "whole index dir) to rebuild the docmap"
                )
            _write_manifest(index_dir, seg, seg_input, 0, 0, fields, empty=True)
            return
        if lo == hi:
            _write_manifest(index_dir, seg, seg_input, 0, 0, fields, empty=True)
            return

        src = ray.data.read_parquet(seg_input, columns=["doc_id", *fields])

    # -- postings: tokenize partials -> groupby shuffle -> encode -> parquet.
    # No extra sort: the sort-based groupby shuffle already emits key-clustered
    # blocks, and term lookups use row-group predicate pushdown either way --
    postings_path = os.path.join(seg_dir, "postings.parquet")
    if layout == "doc_partitioned":
        postings = src.map_batches(
            _TokenizeEncode(fields, range_width),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        if piece_merge_rows:
            postings = postings.map_batches(
                _piece_merge_batch,
                batch_format="pyarrow",
                batch_size=piece_merge_rows,
            )
    else:
        partials = src.map_batches(
            _TokenizePartials(fields, range_width),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        postings = partials.groupby(["field", "term", "bucket"]).map_groups(
            _encode_group, batch_format="pyarrow"
        )
    # small row groups + term-sorted rows within each file => parquet min/max
    # stats actually prune term lookups (one row group otherwise spans the whole
    # term range and every lookup decodes the entire blocks column)
    postings.write_parquet(postings_path, **POSTINGS_WRITE_ARGS)
    try:
        # per-stage execution stats (task counts, wall/cpu per operator) — the
        # corroborating evidence for scaling claims (BASELINE.md)
        stage_stats = postings.stats()
    except Exception:
        stage_stats = ""

    # -- stats from the norms pseudo-term rows (no extra pass over the input) --
    norm_rows = pq.read_table(
        postings_path,
        columns=["field", "df", "total_tf"],
        filters=[("term", "==", NORMS_TERM)],
    )
    stats = {"segment": seg, "doc_base": lo, "doc_count": 0, "fields": {}}
    for f in fields:
        mask = pa.compute.equal(norm_rows["field"], f)
        sub = norm_rows.filter(mask)
        n_docs_f = int(pa.compute.sum(sub["df"]).as_py() or 0)
        stats["fields"][f] = {
            "total_dl": int(pa.compute.sum(sub["total_tf"]).as_py() or 0)
        }
        stats["doc_count"] = max(stats["doc_count"], n_docs_f)
    n_docs = stats["doc_count"]
    with open(os.path.join(seg_dir, "stats.json"), "w") as fh:
        json.dump(stats, fh, indent=1)

    n_terms = sum(
        pq.read_metadata(os.path.join(postings_path, f)).num_rows
        for f in os.listdir(postings_path)
        if f.endswith(".parquet")
    )
    if stage_stats:
        with open(os.path.join(seg_dir, "stage_stats.txt"), "w") as fh:
            fh.write(stage_stats)
    _write_manifest(index_dir, seg, seg_input, n_docs, n_terms, fields)


def _first_parquet(path: str) -> str:
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            return os.path.join(path, name)
    raise FileNotFoundError(path)


def _write_manifest(
    index_dir: str,
    seg: int,
    seg_input: str,
    n_docs: int,
    n_posting_rows: int,
    fields: Sequence[str],
    empty: bool = False,
) -> None:
    seg_dir = _segment_dir(index_dir, seg)
    manifest = {
        "segment_id": f"seg-{seg:05d}",
        "status": "complete",
        "empty": empty,
        "input_path": seg_input,
        "doc_count": int(n_docs),
        "posting_rows": int(n_posting_rows),
        "fields": list(fields),
        "completed_at": time.time(),
        "checksum": hashlib.sha256(
            f"{seg}:{n_docs}:{n_posting_rows}".encode()
        ).hexdigest()[:16],
    }
    tmp = os.path.join(seg_dir, MANIFEST_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(seg_dir, MANIFEST_FILE))  # atomic publish
