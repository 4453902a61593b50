"""Posting-list compression: delta-gap + varint blocks with per-block max-tf
metadata (block-max WAND style; north_star requires exactly this layout).

All encode/decode paths are numpy-vectorized — no Python loop over postings. A
posting list for one ``(field, term, doc-range-bucket)`` key is stored as fixed-size
blocks of up to :data:`BLOCK_SIZE` documents:

* ``docs``  — doc_id gaps (first absolute within block), varint
* ``tfs``   — term frequencies, varint
* ``pos``   — within-document token positions, delta-encoded per document then
  varint; document boundaries are implied by ``tfs`` (tf_i positions per doc)
* metadata — ``n`` (docs in block), ``max_tf`` (block-max for WAND-style pruning),
  ``first_doc``/``last_doc`` (range pruning without decode)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

BLOCK_SIZE = 128

BLOCK_STRUCT = pa.struct(
    [
        ("n", pa.int32()),
        ("max_tf", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("pos", pa.binary()),
    ]
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("bucket", pa.int64()),
        ("df", pa.int64()),
        ("total_tf", pa.int64()),
        ("blocks", pa.list_(BLOCK_STRUCT)),
    ]
)


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-style varint encoding of a non-negative integer array, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + floor(bits/7)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk | cont
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varints`; returns int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(b < 128)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        out[mask] |= (b[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return out.astype(np.int64)


def delta_encode(values: np.ndarray, seg_starts: Optional[np.ndarray] = None) -> np.ndarray:
    """First-order deltas; values at ``seg_starts`` stay absolute (segment resets)."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    if seg_starts is not None and seg_starts.size:
        d[seg_starts] = v[seg_starts]
    return d


def delta_decode(deltas: np.ndarray, seg_starts: Optional[np.ndarray] = None,
                 seg_lengths: Optional[np.ndarray] = None) -> np.ndarray:
    """Inverse of :func:`delta_encode` (cumsum with per-segment resets)."""
    d = np.asarray(deltas, dtype=np.int64)
    if d.size == 0:
        return d
    c = np.cumsum(d)
    if seg_starts is None or not seg_starts.size:
        return c
    # subtract, within each segment, the running total accumulated before it
    prior = c[seg_starts] - d[seg_starts]
    return c - np.repeat(prior, seg_lengths)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, positions: Optional[np.ndarray]
) -> List[dict]:
    """doc-sorted postings -> list of block dicts matching :data:`BLOCK_STRUCT`.

    ``positions`` is the flat concatenation of per-document position lists; the
    per-document counts are exactly ``tfs``.
    """
    n = doc_ids.size
    blocks: List[dict] = []
    pos_offsets = None
    if positions is not None:
        pos_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=pos_offsets[1:])
    for b0 in range(0, n, BLOCK_SIZE):
        b1 = min(b0 + BLOCK_SIZE, n)
        d = doc_ids[b0:b1]
        t = tfs[b0:b1]
        block = {
            "n": int(b1 - b0),
            "max_tf": int(t.max()),
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "docs": encode_varints(delta_encode(d)),
            "tfs": encode_varints(t),
            "pos": b"",
        }
        if positions is not None:
            p0, p1 = int(pos_offsets[b0]), int(pos_offsets[b1])
            flat = positions[p0:p1]
            seg_starts = (pos_offsets[b0:b1] - p0).astype(np.int64)
            block["pos"] = encode_varints(delta_encode(flat, seg_starts))
        blocks.append(block)
    return blocks


def decode_postings(
    blocks, want_positions: bool = False
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """blocks (sequence of dict-likes) -> (doc_ids, tfs, flat_positions|None)."""
    doc_parts, tf_parts, pos_parts = [], [], []
    for blk in blocks:
        d = delta_decode(decode_varints(blk["docs"]))
        t = decode_varints(blk["tfs"])
        doc_parts.append(d)
        tf_parts.append(t)
        if want_positions:
            starts = np.zeros(t.size, dtype=np.int64)
            np.cumsum(t[:-1], out=starts[1:])
            pos_parts.append(
                delta_decode(decode_varints(blk["pos"]), starts, t.astype(np.int64))
            )
    doc_ids = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
    tfs = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int64)
    pos = None
    if want_positions:
        pos = np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64)
    return doc_ids, tfs, pos
