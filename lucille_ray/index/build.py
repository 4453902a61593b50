"""Ray-Data-native inverted-index build over transcript turns.

Pipeline (all stages stream with backpressure; no full materialization):

Phase 0 — docmap (one shuffle, one pass over the input)
  ``groupby(conv_id).count+max(turn_idx)`` -> tiny table -> driver prefix-sums
  conversation base offsets (broadcast via ``ray.put``) -> ``map_batches`` attaches
  ``doc_id = conv_base + turn_idx`` and a contiguous ``seg`` id -> hive-partitioned
  parquet ``docmapped/seg=K/``. Doc ids are dense and follow the stable
  ``(conv_id, turn_idx)`` order (north_rule invariant); segments are contiguous
  doc-id ranges cut on conversation boundaries.

Phase 1 — per segment (the checkpoint/resume unit; a segment with a complete
MANIFEST.json is skipped on re-run)
  a. norms: ``map_batches`` computes per-field token counts -> ``norms.parquet``
     (+ aggregated totals -> ``stats.json``)
  b. postings: ``map_batches`` tokenizes (Arrow kernels + polars explode/groupby —
     no per-row Python) and pre-aggregates within the batch to one partial row per
     ``(field, term, doc-range-bucket)`` -> ``groupby(field, term, bucket)`` shuffle
     -> ``map_groups`` merges partials and delta+varint block-encodes ->
     sorted ``postings.parquet``.

Skew strategy: the doc-range ``bucket`` key splits hot terms (stopword-like tokens
in chat data) across many groups *by construction* — a term's shuffle fan-in per
group is bounded by (batches per bucket), and no single task ever merges a whole hot
posting list. Because buckets partition doc-id ranges, the per-bucket rows of a term
concatenate back into a globally doc-sorted posting list with zero extra work at
read time. This replaces hash-salting + re-merge with something strictly better.

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
from .codec import POSTINGS_SCHEMA, encode_postings

DEFAULT_RANGE_WIDTH = 1 << 17  # docs per posting bucket (128k)

INDEX_META_FILE = "index_meta.json"
MANIFEST_FILE = "MANIFEST.json"


# ---------------------------------------------------------------------------
# Phase 0 — doc-id assignment
# ---------------------------------------------------------------------------


def _conv_offsets(ds) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """One small shuffle: conversation -> turn count (+ density validation)."""
    from ray.data.aggregate import Count, Max

    agg = ds.groupby("conv_id").aggregate(Count(), Max("turn_idx"))
    rows = agg.take_all()  # O(#conversations), not O(#turns)
    rows.sort(key=lambda r: r["conv_id"])
    convs = [r["conv_id"] for r in rows]
    counts = np.array([r["count()"] for r in rows], dtype=np.int64)
    max_turn = np.array([r["max(turn_idx)"] for r in rows], dtype=np.int64)
    if not (max_turn + 1 == counts).all():
        bad = convs[int(np.argmax(max_turn + 1 != counts))]
        raise ValueError(
            f"turn_idx must be dense 0..n-1 per conversation; violated by {bad!r}"
        )
    bases = np.zeros(len(convs), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    return convs, bases, counts


class _AssignDocIds:
    """Stateful map_batches callable: the conv->base table is fetched from the
    object store once per actor (broadcast), not shipped per batch."""

    def __init__(self, conv_map_ref, seg_target: int, num_segments: int):
        import ray

        self.conv_map = ray.get(conv_map_ref)
        self.seg_target = seg_target
        self.num_segments = num_segments

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        bases = np.fromiter(
            (self.conv_map[c] for c in convs), dtype=np.int64, count=len(convs)
        )
        doc_id = bases + turn
        seg = np.minimum(bases // self.seg_target, self.num_segments - 1)
        return batch.append_column("doc_id", pa.array(doc_id)).append_column(
            "seg", pa.array(seg.astype(np.int32))
        )


# ---------------------------------------------------------------------------
# Phase 1a — norms
# ---------------------------------------------------------------------------


def _make_norms_fn(fields: Sequence[str]):
    def norms_batch(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch["doc_id"]}
        for f in fields:
            toks = arrow_tokenize(batch[f])
            lengths = pa.compute.list_value_length(toks)
            lengths = pa.compute.fill_null(lengths, 0)
            cols[f"dl_{f}"] = lengths.cast(pa.int32())
        return pa.table(cols)

    return norms_batch


# ---------------------------------------------------------------------------
# Phase 1b — tokenize -> partial postings (vectorized)
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
                    "pos": pos,
                }
            )
            per_doc = (
                df.group_by(["term", "doc_id"], maintain_order=True)
                .agg(pl.len().alias("tf"), pl.col("pos").alias("positions"))
                .sort(["term", "doc_id"])
                .with_columns((pl.col("doc_id") // self.range_width).alias("bucket"))
            )
            partial = per_doc.group_by(["term", "bucket"], maintain_order=True).agg(
                pl.col("doc_id").alias("doc_ids"),
                pl.col("tf").alias("tfs"),
                pl.col("positions").flatten().alias("pos"),
            )
            tbl = partial.to_arrow()
            tbl = tbl.append_column(
                "field", pa.array([field] * len(tbl), pa.string())
            )
            outs.append(
                tbl.select(["field", "term", "bucket", "doc_ids", "tfs", "pos"])
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


def _encode_group(group: pa.Table) -> pa.Table:
    """Merge the partial rows of one (field, term, bucket) group and block-encode."""
    field = group["field"][0].as_py()
    term = group["term"][0].as_py()
    bucket = group["bucket"][0].as_py()
    doc_lists = group["doc_ids"].to_pylist()
    tf_lists = group["tfs"].to_pylist()
    pos_lists = group["pos"].to_pylist()
    doc_ids = np.concatenate([np.asarray(d, np.int64) for d in doc_lists])
    tfs = np.concatenate([np.asarray(t, np.int64) for t in tf_lists])
    pos = np.concatenate([np.asarray(p, np.int64) for p in pos_lists])
    # partials are disjoint doc SETS but their ranges can interleave (a read batch
    # may span non-adjacent blocks) -> full doc sort, with the ragged per-doc
    # position slices gathered along
    order = np.argsort(doc_ids, kind="stable")
    if not (order == np.arange(order.size)).all():
        starts = np.zeros(doc_ids.size, dtype=np.int64)
        np.cumsum(tfs[:-1], out=starts[1:])
        lens = tfs[order]
        out_off = np.zeros(lens.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=out_off[1:])
        gather = np.repeat(starts[order] - out_off, lens) + np.arange(int(lens.sum()))
        pos = pos[gather]
        doc_ids = doc_ids[order]
        tfs = tfs[order]
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
) -> dict:
    """Build (or resume building) an index over a transcripts Dataset.

    Returns the index meta dict. Re-running with ``resume=True`` skips segments
    whose manifest is complete — the checkpoint/resume contract of north_rule.
    """
    import ray
    import ray.data

    os.makedirs(index_dir, exist_ok=True)
    t_start = time.time()

    docmapped_root = os.path.join(index_dir, "docmapped")
    meta_path = os.path.join(index_dir, INDEX_META_FILE)

    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        if os.path.isdir(docmapped_root):
            # a half-written docmap (no meta yet) must not be appended to
            import shutil

            shutil.rmtree(docmapped_root)
        convs, bases, counts = _conv_offsets(ds)
        total_docs = int(counts.sum())
        num_segments = max(1, min(num_segments, len(convs)))
        seg_target = -(-total_docs // num_segments)  # ceil
        conv_map = {c: int(b) for c, b in zip(convs, bases)}
        conv_map_ref = ray.put(conv_map)
        mapped = ds.map_batches(
            _AssignDocIds,
            fn_constructor_args=(conv_map_ref, seg_target, num_segments),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, 8),
        )
        mapped.write_parquet(docmapped_root, partition_cols=["seg"])
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
        meta = {
            "version": 1,
            "fields": list(fields),
            "num_segments": num_segments,
            "range_width": range_width,
            "total_docs": total_docs,
            "seg_bounds": seg_bounds,
            "analyzer": "lower+[a-z0-9]",
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)

    for seg in range(meta["num_segments"]):
        if resume and segment_complete(index_dir, seg):
            continue
        _build_segment(
            index_dir,
            seg,
            docmapped_root,
            fields=meta["fields"],
            range_width=meta["range_width"],
            batch_size=batch_size,
            seg_bounds=meta["seg_bounds"][str(seg)],
        )

    meta["build_seconds"] = round(time.time() - t_start, 3)
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
    seg_input = os.path.join(docmapped_root, f"seg={seg}")
    lo, hi = seg_bounds
    if not os.path.isdir(seg_input) or lo == hi:
        _write_manifest(index_dir, seg, seg_input, 0, 0, fields, empty=True)
        return

    src = ray.data.read_parquet(seg_input, columns=["doc_id", *fields])

    # -- norms + stats --
    norms_path = os.path.join(seg_dir, "norms.parquet")
    src.map_batches(
        _make_norms_fn(fields), batch_format="pyarrow", batch_size=batch_size
    ).write_parquet(norms_path)
    norms_ds = ray.data.read_parquet(norms_path)
    sums = norms_ds.aggregate(*[Sum(f"dl_{f}") for f in fields])
    n_docs = norms_ds.count()
    stats = {
        "segment": seg,
        "doc_base": lo,
        "doc_count": n_docs,
        "fields": {
            f: {"total_dl": int(sums[f"sum(dl_{f})"] or 0)} for f in fields
        },
    }
    with open(os.path.join(seg_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    # -- postings: tokenize partials -> groupby shuffle -> encode -> sorted parquet --
    postings_path = os.path.join(seg_dir, "postings.parquet")
    partials = src.map_batches(
        _TokenizePartials(fields, range_width),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    postings = (
        partials.groupby(["field", "term", "bucket"])
        .map_groups(_encode_group, batch_format="pyarrow")
        .sort(["field", "term", "bucket"])
    )
    postings.write_parquet(postings_path)

    n_terms = ray.data.read_parquet(postings_path, columns=["term"]).count()
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
