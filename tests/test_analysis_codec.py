"""Analyzer equivalence (scalar vs Arrow-vectorized) and posting codec round trips."""

import numpy as np
import pyarrow as pa
import pytest

from lucille_ray.analysis import arrow_tokenize, tokenize
from lucille_ray.index.codec import (
    decode_postings,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_postings,
    encode_varints,
)

TEXTS = [
    "The cat jumped over the lazy dog",
    "  leading and trailing  ",
    "",
    "punct: first.last@email.com / cats-effect!",
    "UPPER lower MiXeD 123abc 456",
    "unicode héllo wörld 🦖",
    None,
    "a",
    "...",
]


def test_tokenize_basic():
    assert tokenize("The cat jumped") == ["the", "cat", "jumped"]
    assert tokenize("first.last@email.com") == ["first", "last", "email", "com"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_arrow_tokenize_matches_scalar():
    arr = pa.array(TEXTS, pa.string())
    result = arrow_tokenize(arr).to_pylist()
    for text, toks in zip(TEXTS, result):
        assert toks == tokenize(text or "")


def test_varint_round_trip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        vals = rng.integers(0, 1 << 40, int(rng.integers(1, 400)))
        assert (decode_varints(encode_varints(vals)) == vals).all()
    assert decode_varints(b"").size == 0
    assert decode_varints(encode_varints(np.array([0]))).tolist() == [0]


def test_delta_round_trip_with_segments():
    rng = np.random.default_rng(11)
    vals = np.sort(rng.integers(0, 1000, 50))
    starts = np.array([0, 10, 11, 40])
    lengths = np.diff(np.concatenate([starts, [50]]))
    enc = delta_encode(vals.copy(), starts)
    assert (delta_decode(enc, starts, lengths) == vals).all()


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_postings_round_trip(n):
    rng = np.random.default_rng(n)
    doc_ids = np.unique(rng.integers(0, n * 20, n)).astype(np.int64)
    tfs = rng.integers(1, 9, doc_ids.size)
    pos = np.concatenate(
        [np.sort(rng.choice(2000, int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    blocks = encode_postings(doc_ids, tfs, pos)
    assert all(b["n"] <= 128 for b in blocks)
    assert all(b["max_tf"] >= 1 for b in blocks)
    d2, t2, p2 = decode_postings(blocks, want_positions=True)
    assert (d2 == doc_ids).all()
    assert (t2 == tfs).all()
    assert (p2 == pos).all()
    d3, t3, p3 = decode_postings(blocks, want_positions=False)
    assert (d3 == doc_ids).all() and p3 is None


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_postings_min_dl_exact_per_block(n):
    """min_dl stored per block is the exact min over that block's own docs
    (dls aligned with doc_ids); without dls it is 0 = unknown."""
    rng = np.random.default_rng(n + 7)
    doc_ids = np.unique(rng.integers(0, n * 20, n)).astype(np.int64)
    tfs = rng.integers(1, 9, doc_ids.size)
    dls = rng.integers(1, 500, doc_ids.size).astype(np.int64)
    blocks = encode_postings(doc_ids, tfs, None, dls=dls)
    at = 0
    for b in blocks:
        assert b["min_dl"] == int(dls[at: at + b["n"]].min())
        at += b["n"]
    assert all(b["min_dl"] == 0 for b in encode_postings(doc_ids, tfs, None))


def test_jsonl_and_csv_sources_normalize_to_schema(ray_session, tmp_path):
    """JSONL and CSV ingest produce the identical table parquet does, and an
    index built from the JSONL source answers queries identically."""
    import csv as csv_mod
    import json

    import pandas as pd

    from lucille_ray import transcripts as T
    from lucille_ray.index.build import build_index
    from lucille_ray.search import SearchEngine

    pq_dir = str(tmp_path / "pq")
    T.generate(2000, pq_dir, num_files=2)
    base = T.read_transcripts(pq_dir).to_pandas()

    # JSONL: ts as ISO string; sparse null tools stay null
    jdir = tmp_path / "jsonl"; jdir.mkdir()
    with open(jdir / "part0.jsonl", "w") as f:
        for r in base.to_dict("records"):
            r["ts"] = pd.Timestamp(r["ts"]).isoformat()
            f.write(json.dumps(r) + "\n")
    got_j = T.read_transcripts_jsonl(str(jdir)).to_pandas()

    # CSV
    cdir = tmp_path / "csv"; cdir.mkdir()
    with open(cdir / "part0.csv", "w", newline="") as f:
        wr = csv_mod.writer(f)
        wr.writerow(base.columns.tolist())
        for r in base.itertuples(index=False):
            wr.writerow(list(r))
    got_c = T.read_transcripts_csv(str(cdir)).to_pandas()

    key = ["conv_id", "turn_idx"]
    canon = lambda df: df.sort_values(key, kind="stable").reset_index(drop=True)
    for got in (got_j, got_c):
        a, b = canon(base), canon(got)
        assert list(a.columns) == list(b.columns)
        pd.testing.assert_frame_equal(a[["conv_id", "turn_idx", "role", "text", "ts"]],
                                      b[["conv_id", "turn_idx", "role", "text", "ts"]])

    # end-to-end: index built from the JSONL source ranks identically
    idx_a = str(tmp_path / "idx_pq"); idx_b = str(tmp_path / "idx_jsonl")
    build_index(T.read_transcripts(pq_dir), idx_a, num_segments=2, batch_size=1024)
    build_index(T.read_transcripts_jsonl(str(jdir)), idx_b, num_segments=2, batch_size=1024)
    ea, eb = SearchEngine(idx_a), SearchEngine(idx_b)
    for q in ("data", "data AND query", '"lazy evaluation"', "deploy*"):
        ta = ea.search(q, k=10, with_meta=True)
        tb = eb.search(q, k=10, with_meta=True)
        assert ta.equals(tb)
