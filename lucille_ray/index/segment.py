"""Immutable segment reader: postings / norms / stats access with lazy loading and
per-field term-dictionary caching.

A segment is a contiguous doc-id range built by ``build.py``::

    seg-00000/
      postings.parquet/   # rows (field, term, bucket, df, total_tf, blocks)
      stats.json          # doc_base, doc_count, per-field total_dl
      MANIFEST.json       # lineage + completion marker (checkpoint/resume unit)
    (norms = dl_* columns fused into the docmapped segment input)

Readers hold numpy norms arrays indexed by ``doc_id - doc_base`` (loaded once —
designed to be pinned inside long-lived scorer actors) and fetch postings by
``(field, term)`` through parquet predicate pushdown, so a term lookup touches only
the row groups whose min/max term stats overlap.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .build import NORMS_TERM
from .codec import RawBlocks, sort_postings


class SegmentReader:
    def __init__(self, seg_dir: str):
        self.seg_dir = seg_dir
        with open(os.path.join(seg_dir, "MANIFEST.json")) as f:
            self.manifest = json.load(f)
        if self.manifest.get("status") != "complete":
            raise ValueError(f"segment {seg_dir} is incomplete")
        self.empty = bool(self.manifest.get("empty"))
        if self.empty:
            self.stats = {"doc_base": 0, "doc_count": 0, "fields": {}}
        else:
            with open(os.path.join(seg_dir, "stats.json")) as f:
                self.stats = json.load(f)
        self.doc_base = int(self.stats["doc_base"])
        self.doc_count = int(self.stats["doc_count"])
        self._norms: Optional[Dict[str, np.ndarray]] = None
        self._term_dicts: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        # decoded-postings cache shared across queries (readers are pinned in
        # long-lived scorer actors); FIFO-capped by entry count
        self._post_cache: "OrderedDict[Tuple[str, str, bool], tuple]" = OrderedDict()
        self._post_cache_cap = 512
        # undecoded raw block rows (WAND path: metadata-guided selective decode)
        self._raw_cache: "OrderedDict[Tuple[str, str], list]" = OrderedDict()
        self._raw_cache_cap = 256
        # candidate-pruned decodes, keyed by the candidate-set digest: repeat
        # conjunctive queries decode each pruned subset once, not per query
        self._pruned_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._pruned_cache_cap = 128
        # tombstones: sorted global doc ids marked deleted (``deleted.npy``,
        # written by index.delete). Loaded once at reader construction —
        # readers opened after a delete see it (Lucene reopen semantics).
        # Postings are filtered at the decode choke point below; df/norms/
        # avgdl stats intentionally keep counting tombstoned docs until a
        # rewrite, exactly like Lucene's maxDoc-based stats before a merge.
        self.deleted: Optional[np.ndarray] = None
        tomb = os.path.join(seg_dir, "deleted.npy")
        if os.path.exists(tomb):
            try:
                arr = np.load(tomb).astype(np.int64, copy=False)
                if arr.size:
                    self.deleted = arr
            except (OSError, ValueError):
                raise ValueError(f"unreadable tombstone file {tomb}")

    # ---- stats ----

    def total_dl(self, field: str) -> int:
        return int(self.stats["fields"].get(field, {}).get("total_dl", 0))

    @property
    def live_docs(self) -> int:
        """numDocs for corpus-level stats: equals maxDoc (``doc_count``) until
        a compaction purge records the post-delete live count."""
        return int(self.stats.get("live_docs", self.doc_count))

    def live_total_dl(self, field: str) -> int:
        st = self.stats["fields"].get(field, {})
        return int(st.get("live_dl", st.get("total_dl", 0)))

    # ---- norms ----

    def norms(self, field: str) -> np.ndarray:
        """Per-doc token count for ``field``, indexed by ``doc_id - doc_base``."""
        if self._norms is None:
            self._load_norms()
        return self._norms[field]

    def _load_norms(self) -> None:
        """Norms are stored as reserved-term posting rows (doc_ids=all docs,
        tfs=field length) — loaded once and pinned. The decoded array is
        persisted as an ``.npy`` sidecar so every later reader (actor restarts,
        new engines over the same index) mmap-loads it instead of re-decoding
        millions of varints per field."""
        self._norms = {}
        if self.empty:
            return
        for field in self.manifest.get("fields", []):
            sidecar = os.path.join(self.seg_dir, f"norms_{field}.npy")
            if os.path.exists(sidecar):
                try:
                    arr = np.load(sidecar)
                    if arr.size == self.doc_count:
                        self._norms[field] = arr.astype(np.int64, copy=False)
                        continue
                except (OSError, ValueError):
                    pass  # unreadable sidecar: fall through to decode
            got = self.postings_many(field, [NORMS_TERM])
            if NORMS_TERM not in got:
                raise ValueError(f"{self.seg_dir}: norms rows missing for {field}")
            docs, dls, _ = got[NORMS_TERM]
            expected = np.arange(self.doc_base, self.doc_base + self.doc_count)
            if docs.size != expected.size or not (docs == expected).all():
                raise ValueError(
                    f"norms of {self.seg_dir}/{field} are not doc-contiguous"
                )
            self._norms[field] = dls.astype(np.int64)
            try:  # atomic publish; best-effort (read-only index dirs are fine)
                tmp = sidecar + ".tmp"
                with open(tmp, "wb") as fh:
                    np.save(fh, self._norms[field])
                os.replace(tmp, sidecar)
            except OSError:
                pass

    # ---- term dictionary ----

    def term_dict(self, field: str) -> Tuple[np.ndarray, np.ndarray]:
        """(terms sorted unique, df per term) for one field (buckets aggregated)."""
        if field not in self._term_dicts:
            if self.empty:
                self._term_dicts[field] = (
                    np.empty(0, dtype=object),
                    np.empty(0, dtype=np.int64),
                )
            else:
                t = pq.read_table(
                    os.path.join(self.seg_dir, "postings.parquet"),
                    columns=["field", "term", "df"],
                    filters=[("field", "==", field), ("term", "!=", NORMS_TERM)],
                )
                g = t.group_by("term").aggregate([("df", "sum")])
                order = pc.sort_indices(g["term"])
                g = g.take(order)
                self._term_dicts[field] = (
                    np.asarray(g["term"].to_pylist(), dtype=object),
                    g["df_sum"].to_numpy().astype(np.int64),
                )
        return self._term_dicts[field]

    def dfs(self, field: str, terms: Sequence[str]) -> Dict[str, int]:
        """df for specific terms (term-dict binary search; 0 when absent)."""
        dict_terms, dict_dfs = self.term_dict(field)
        out = {}
        for term in terms:
            i = np.searchsorted(dict_terms, term)
            if i < dict_terms.size and dict_terms[i] == term:
                out[term] = int(dict_dfs[i])
            else:
                out[term] = 0
        return out

    # ---- postings ----

    def postings_many(
        self,
        field: str,
        terms: Sequence[str],
        want_positions: bool = False,
        candidates: Optional[np.ndarray] = None,
    ) -> Dict[str, Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
        """Decode postings for many terms in one predicate-pushdown read; decoded
        lists are cached across queries (the readers live in pinned actors).

        ``candidates`` (a sorted doc-id array) enables exact conjunctive block
        pruning: blocks whose [first_doc, last_doc] range contains no candidate
        are skipped *before* decode (the block-max metadata's range half).
        Pruned results are not cached."""
        if self.empty or not terms:
            return {}
        out: Dict[str, Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]] = {}
        cand_key = None
        if candidates is not None:
            import hashlib as _hl

            cand_key = _hl.md5(np.ascontiguousarray(candidates).tobytes()).hexdigest()[:16]
        missing = []
        for term in set(terms):
            hit = self._post_cache.get((field, term, want_positions))
            if hit is None and cand_key is not None:
                hit = self._pruned_cache.get((field, term, want_positions, cand_key))
            if hit is not None:
                out[term] = hit
            else:
                missing.append(term)
        if not missing:
            return out
        fetched = self._postings_read(field, missing, want_positions, candidates)
        for term, val in fetched.items():
            if candidates is None:
                self._post_cache[(field, term, want_positions)] = val
                while len(self._post_cache) > self._post_cache_cap:
                    self._post_cache.popitem(last=False)
            else:
                self._pruned_cache[(field, term, want_positions, cand_key)] = val
                while len(self._pruned_cache) > self._pruned_cache_cap:
                    self._pruned_cache.popitem(last=False)
        out.update(fetched)
        return out

    def _postings_read(
        self,
        field: str,
        terms: Sequence[str],
        want_positions: bool,
        candidates: Optional[np.ndarray] = None,
    ) -> Dict[str, Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
        """Decode via the raw-block cache: the parquet read happens at most once
        per (field, term) on this reader; candidate-pruned repeats (conjunctive
        queries in a pinned scorer) prune and decode IN MEMORY — the per-repeat
        ``pq.read_table`` was 77% of repeat conjunctive latency."""
        raw = self.raw_blocks_many(field, terms)
        out: Dict[str, Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]] = {}
        for term in set(terms):
            rb = raw.get(term)
            if rb is None or not len(rb):
                continue
            keep = None
            if candidates is not None:
                keep = _overlap_mask(rb.firsts, rb.lasts, candidates)
                if not keep.any():
                    continue
            docs, tfs, pos = rb.decode(want_positions, keep=keep)
            if docs.size > 1 and (np.diff(docs) <= 0).any():
                # doc_partitioned pieces can interleave ranges; restore doc order
                docs, tfs, pos = sort_postings(docs, tfs, pos)
            if self.deleted is not None and term != NORMS_TERM:
                docs, tfs, pos = self._drop_deleted(docs, tfs, pos)
            out[term] = (docs, tfs, pos)
        return out

    def _drop_deleted(
        self, docs: np.ndarray, tfs: np.ndarray, pos: Optional[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Filter tombstoned docs out of one decoded posting list (positions
        stay aligned: each doc owns ``tf`` consecutive position entries)."""
        idx = np.searchsorted(self.deleted, docs)
        idx = np.clip(idx, 0, self.deleted.size - 1)
        keep = self.deleted[idx] != docs
        if keep.all():
            return docs, tfs, pos
        if pos is not None and pos.size:
            pos = pos[np.repeat(keep, tfs)]
        return docs[keep], tfs[keep], pos

    def postings(
        self, field: str, term: str, want_positions: bool = False
    ) -> Optional[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
        return self.postings_many(field, [term], want_positions).get(term)

    def raw_blocks_many(self, field: str, terms: Sequence[str]) -> Dict[str, RawBlocks]:
        """UNDECODED blocks per term (bucket order) as zero-copy
        :class:`RawBlocks` views, for metadata-guided selective decode
        (block-max WAND / conjunctive pruning). One predicate-pushdown read for
        all missing terms; cached like decoded postings."""
        if self.empty or not terms:
            return {}
        out: Dict[str, RawBlocks] = {}
        missing = []
        for term in set(terms):
            hit = self._raw_cache.get((field, term))
            if hit is not None:
                out[term] = hit
            else:
                missing.append(term)
        if missing:
            t = self._read_postings_rows(field, missing)
            if t is not None and t.num_rows:
                order = pc.sort_indices(
                    t, sort_keys=[("term", "ascending"), ("bucket", "ascending")]
                )
                t = t.take(order)
                lists = t["blocks"].combine_chunks()
                loff = np.asarray(lists.offsets)
                flat = lists.values
                terms_np = t["term"].to_pylist()
                i = 0
                while i < len(terms_np):
                    j = i
                    while j < len(terms_np) and terms_np[j] == terms_np[i]:
                        j += 1
                    lo, hi = int(loff[i]), int(loff[j])
                    out[terms_np[i]] = RawBlocks(flat.slice(lo, hi - lo))
                    i = j
            for term in missing:
                rb = out.get(term)
                if rb is None:
                    rb = out[term] = RawBlocks(
                        pa.array([], type=_BLOCK_STRUCT_TYPE)
                    )
                self._raw_cache[(field, term)] = rb
                while len(self._raw_cache) > self._raw_cache_cap:
                    self._raw_cache.popitem(last=False)
        return out

    def _postings_files(self) -> list:
        """Parquet handles + per-row-group (field, term) min/max stats for every
        postings piece file, parsed ONCE per reader (readers are pinned in
        long-lived scorer actors). The per-query ``pq.read_table(dir,
        filters=...)`` was paying dataset discovery + open + footer parse on
        EVERY cold (field, terms) miss — a ~12 ms floor per call even for
        absent terms (the dominant rep-1 cost of sequential serving)."""
        cached = getattr(self, "_postings_pf_cache", None)
        if cached is not None:
            return cached
        root = os.path.join(self.seg_dir, "postings.parquet")
        entries = []
        for name in sorted(os.listdir(root)):
            if not name.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, name))
            md = pf.metadata
            fidx = tidx = None
            if md.num_row_groups:
                rg0 = md.row_group(0)
                for i in range(rg0.num_columns):
                    p = rg0.column(i).path_in_schema
                    if p == "field":
                        fidx = i
                    elif p == "term":
                        tidx = i
            fmin: list = []
            fmax: list = []
            tmin: list = []
            tmax: list = []
            ok = fidx is not None and tidx is not None
            if ok:
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    fs = rg.column(fidx).statistics
                    ts = rg.column(tidx).statistics
                    if (
                        fs is None or ts is None
                        or fs.min is None or fs.max is None
                        or ts.min is None or ts.max is None
                    ):
                        ok = False  # no stats: read the file whole, filter exactly
                        break
                    fmin.append(fs.min)
                    fmax.append(fs.max)
                    tmin.append(ts.min)
                    tmax.append(ts.max)
            stats = None
            if ok and fmin:
                stats = (
                    np.array(fmin), np.array(fmax), np.array(tmin), np.array(tmax)
                )
            entries.append((pf, stats))
        self._postings_pf_cache = entries
        return entries

    def _read_postings_rows(self, field: str, missing: Sequence[str]):
        """Rows of ``postings.parquet`` matching (field, term in missing), read
        through cached handles with row-group pruning on the writers' (field,
        term) min/max stats. Parquet stat truncation keeps min a prefix (a
        valid lower bound) and increments max's last byte (a valid upper
        bound), so pruning can only over-include — the exact filter below
        decides membership. Row groups spanning a field boundary skip the term
        test (term order restarts per field) and rely on the exact filter."""
        ms = sorted(set(missing))
        ms_np = np.array(ms)
        vs = pa.array(ms)
        parts = []
        for pf, stats in self._postings_files():
            if stats is None:
                t = pf.read(columns=["field", "term", "bucket", "blocks"])
            else:
                fmin, fmax, tmin, tmax = stats
                hit = (fmin <= field) & (field <= fmax)
                pure = hit & (fmin == fmax)  # single-field groups: term-prunable
                if pure.any():
                    # first missing term >= tmin must be <= tmax for overlap
                    first = np.searchsorted(ms_np, tmin[pure])
                    sub = np.zeros(int(pure.sum()), dtype=bool)
                    inb = first < ms_np.size
                    sub[inb] = ms_np[first[inb]] <= tmax[pure][inb]
                    keep = hit.copy()
                    keep[np.flatnonzero(pure)] = sub
                    hit = keep
                gs = np.flatnonzero(hit)
                if gs.size == 0:
                    continue
                t = pf.read_row_groups(
                    gs.tolist(), columns=["field", "term", "bucket", "blocks"]
                )
            t = t.filter(
                pc.and_(pc.equal(t["field"], field), pc.is_in(t["term"], value_set=vs))
            )
            if t.num_rows:
                parts.append(t.select(["term", "bucket", "blocks"]))
        if not parts:
            return None
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    def cache_decoded(self, field: str, term: str, post: tuple) -> None:
        """Insert an externally-decoded postings triple into the shared cache
        (the WAND bootstrap decodes from raw blocks; keep repeat queries warm)."""
        self._post_cache[(field, term, False)] = post
        while len(self._post_cache) > self._post_cache_cap:
            self._post_cache.popitem(last=False)

    # ---- doc metadata (conv_id, turn_idx) for result rows ----

    def doc_meta(self, doc_ids: np.ndarray) -> pa.Table:
        src = self.manifest["input_path"]
        if src.endswith(":fused"):
            return self._doc_meta_from_convmap(doc_ids)
        cols = ["doc_id", "conv_id", "turn_idx"]
        rgmap = self._docmap_rowgroups(src)
        if rgmap is None:  # no usable doc_id stats: full predicate-pushdown scan
            ds = pads.dataset(src)
            return ds.to_table(
                columns=cols, filter=pads.field("doc_id").isin(pa.array(doc_ids))
            )
        # k result docs live in O(k) row groups — read ONLY those (a top-k
        # lookup was decoding the whole O(#turns) docmap per query otherwise:
        # the ~130 ms/segment warm floor at 10M)
        ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
        mins, maxs, files, rgs = rgmap
        hit = np.flatnonzero(
            (np.searchsorted(ids, maxs, side="right")
             - np.searchsorted(ids, mins, side="left")) > 0
        )
        parts = []
        # handles cached for the reader's lifetime (the reader is pinned in a
        # scorer actor): reopening per query added footer-parse cost and let
        # unclosed fds pile up until GC (ADVICE r04)
        opened = getattr(self, "_docmap_pf_cache", None)
        if opened is None:
            opened = self._docmap_pf_cache = {}
        for i in hit:
            f = opened.get(files[i])
            if f is None:
                f = opened[files[i]] = pq.ParquetFile(files[i])
            t = f.read_row_group(int(rgs[i]), columns=cols)
            m = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), ids)
            if m.any():
                parts.append(t.filter(pa.array(m)))
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(parts)

    def _docmap_rowgroups(self, src: str):
        """(mins, maxs, files, row_group_idx) doc_id stats per docmap row group,
        built once from parquet footers (O(#row_groups) memory, no data read)."""
        cached = getattr(self, "_docmap_rg_cache", False)
        if cached is not False:
            return cached
        mins: List[int] = []
        maxs: List[int] = []
        files: List[str] = []
        rgs: List[int] = []
        try:
            paths = (
                sorted(
                    os.path.join(r, fn)
                    for r, _d, fns in os.walk(src)
                    for fn in fns
                    if fn.endswith(".parquet")
                )
                if os.path.isdir(src)
                else [src]
            )
            for p in paths:
                md = pq.ParquetFile(p).metadata
                ci = md.schema.to_arrow_schema().names.index("doc_id")
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is None or st.min is None or st.max is None:
                        raise ValueError("missing doc_id stats")
                    mins.append(int(st.min))
                    maxs.append(int(st.max))
                    files.append(p)
                    rgs.append(g)
            out = (np.asarray(mins), np.asarray(maxs), files, np.asarray(rgs))
        except Exception:
            out = None
        self._docmap_rg_cache = out
        return out

    def _doc_meta_from_convmap(self, doc_ids: np.ndarray) -> pa.Table:
        """Fused-docmap indexes keep no O(#turns) forward index; the O(#convs)
        convmap recovers (conv_id, turn_idx) arithmetically:
        doc_id = base[conv] + turn_idx by construction."""
        cm = getattr(self, "_convmap", None)
        if cm is None:
            index_dir = os.path.dirname(os.path.dirname(self.seg_dir))
            t = pq.read_table(
                os.path.join(index_dir, "convmap.parquet"),
                columns=["conv_id", "base"],
            )
            t = t.take(pc.sort_indices(t["base"]))
            cm = self._convmap = (
                # plain string: output must concat with docmapped-backed
                # segments' metadata after an append
                pc.cast(t["conv_id"].combine_chunks(), pa.string()),
                t["base"].to_numpy().astype(np.int64),
            )
        convs, bases = cm
        ids = np.asarray(doc_ids, dtype=np.int64)
        idx = np.searchsorted(bases, ids, side="right") - 1
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "conv_id": convs.take(pa.array(idx, pa.int64())),
                "turn_idx": pa.array(
                    (ids - bases[idx]).astype(np.int32), pa.int32()
                ),
            }
        )


from .codec import POSTINGS_SCHEMA as _PS

_BLOCK_STRUCT_TYPE = _PS.field("blocks").type.value_type


def _overlap_mask(
    firsts: np.ndarray, lasts: np.ndarray, candidates: np.ndarray
) -> np.ndarray:
    """True for blocks whose doc range contains at least one candidate doc."""
    lo = np.searchsorted(candidates, firsts, side="left")
    hi = np.searchsorted(candidates, lasts, side="right")
    return hi > lo


def load_segments(index_dir: str) -> List[SegmentReader]:
    """Readers for the COMMITTED segments (the ones index meta records);
    uncommitted leftovers from a crashed ``append_index`` are ignored."""
    import json

    with open(os.path.join(index_dir, "index_meta.json")) as f:
        n = int(json.load(f)["num_segments"])
    seg_root = os.path.join(index_dir, "segments")
    return [
        SegmentReader(os.path.join(seg_root, f"seg-{s:05d}")) for s in range(n)
    ]
