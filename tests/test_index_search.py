"""End-to-end: Ray Data index build + BM25 search, rank-identical (top-k doc ids AND
scores) to the independent brute-force oracle — the north_rule correctness contract.
Also covers checkpoint/resume and the per-turn text-equality invariant."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from lucille_ray import transcripts as T
from lucille_ray.index.build import build_index, segment_complete
from lucille_ray.search.engine import SearchEngine
from lucille_ray.search.oracle import BruteForceOracle

N_TURNS = 1200

# the reference query set: every AST node type exercised as a retrieval query
QUERY_SET = [
    "data",
    "xylophone42",
    "the data",
    "data AND query",
    "data AND query AND join",
    "deploy OR jump",
    "data AND NOT query",
    "-data query",
    "+data query",
    "NOT data",
    '"lazy evaluation"',
    "lazy.evaluation",  # punctuated Term -> analyzer splits -> implicit phrase
    "data.query.join",
    '"data query"~2',
    '"query data table"~3',
    "deploy*",
    "c?tch",
    "*ploy*",
    "/jump.*/",
    "cat~1",
    "derp~",
    "[deploy TO deploys]",
    "{catch TO data]",
    "(data query join)@2",
    "(deploy* jump test)@2",
    "data^2 OR query^0.5",
    '(data AND query)^1.5 OR "lazy evaluation"^3',
    "role:tool",
    "role:assistant AND deploy",
    "tool:bash",
    "tool:(bash OR python)",
    "role:user AND (data OR query) -join",
    "a b AND c",  # associativity corpus reused as retrieval
    "the cat AND data AND query OR jump",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lr_e2e"))
    data_dir = os.path.join(root, "data")
    index_dir = os.path.join(root, "index")
    T.generate(N_TURNS, data_dir, num_files=3)
    ds = T.read_transcripts(data_dir)
    build_index(ds, index_dir, num_segments=2, range_width=256, batch_size=400)
    table = pq.read_table(data_dir)
    return data_dir, index_dir, table


@pytest.fixture(scope="module")
def oracle(built):
    return BruteForceOracle(built[2])


def _compare(engine, oracle, qs, k=10):
    got = engine.search(qs, k=k, with_meta=False)
    gp = list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
    exp = oracle.search(qs, k=k)
    assert len(gp) == len(exp), f"{qs!r}: hit-count {len(gp)} != {len(exp)}"
    for (gd, gs), (ed, es) in zip(gp, exp):
        assert gd == ed, f"{qs!r}: rank order differs ({gp[:3]} vs {exp[:3]})"
        assert abs(gs - es) < 1e-9, f"{qs!r}: score {gs} != {es}"


@pytest.mark.parametrize("qs", QUERY_SET, ids=repr)
def test_rank_identical_local(built, oracle, qs):
    engine = SearchEngine(built[1], parallel=False)
    _compare(engine, oracle, qs)


def test_rank_identical_actor_pool(built, oracle):
    engine = SearchEngine(built[1], parallel=True)
    try:
        for qs in QUERY_SET[::4]:
            _compare(engine, oracle, qs)
    finally:
        engine.shutdown()


def test_search_many_matches_search(built):
    engine = SearchEngine(built[1], parallel=False)
    singles = [engine.search(q, k=5, with_meta=False) for q in QUERY_SET[:6]]
    batch = engine.search_many(QUERY_SET[:6], k=5)
    for s, (bd, bs) in zip(singles, batch):
        assert s["doc_id"].to_pylist() == bd.tolist()


def test_folded_search_single_round_trip_identity(built, oracle):
    """The folded sequential path (resolve futures + resolve_score in ONE
    driver round-trip, VERDICT r04 #4) must answer bit-identically to the
    classic plan-then-score path, with and without metadata, including on
    plan-cache repeats."""
    engine = SearchEngine(built[1], parallel=True)
    ref = SearchEngine(built[1], parallel=False)
    try:
        engine.search("data", k=3, with_meta=False)  # warm stats (classic path)
        for qs in QUERY_SET[::3]:
            for _rep in range(2):  # rep 2 plans from the df/expansion memo
                a = engine.search(qs, k=10, with_meta=True)
                b = ref.search(qs, k=10, with_meta=True)
                assert a.to_pydict() == b.to_pydict(), (qs, _rep)
            _compare(engine, oracle, qs)
    finally:
        engine.shutdown()


def test_placement_spread_param(built, oracle):
    """placement='spread' schedules scorer actors with the SPREAD strategy
    (multi-node readiness, VERDICT r04 #7); on this single-node fixture it
    must still schedule everything and answer identically to default packing.
    An unknown placement value fails fast."""
    # one pool at a time: two live engines would pin 4 one-CPU actors on the
    # 4-CPU test fixture and leave no headroom (CLAUDE.md trap)
    answers = {}
    for placement in ("spread", None):
        eng = SearchEngine(built[1], parallel=True, placement=placement)
        try:
            for qs in QUERY_SET[::8]:
                answers.setdefault(qs, []).append(
                    eng.search(qs, k=10, with_meta=False).to_pydict()
                )
                _compare(eng, oracle, qs)
        finally:
            eng.shutdown()
    for qs, (a, b) in answers.items():
        assert a == b, qs
    with pytest.raises(ValueError, match="placement"):
        SearchEngine(built[1], parallel=True, placement="bogus")


def test_expansion_memo_plans_resolve_free(built):
    """After one resolve, dictionary-expansion queries plan from the driver
    memo (no resolve round-trip) and the memoized plan is bit-identical."""
    engine = SearchEngine(built[1], parallel=False)
    for qs in ["deploy*", "cat~1", "[deploy TO deploys]", "c?tch", "/jump.*/"]:
        q0, reqs0, ctx0 = engine.plan(qs)
        from lucille_ray.query.parser import parse as _parse
        from lucille_ray.search.eval import collect_term_requests as _ctr

        q1 = _parse(qs)
        hit = engine._plan_from_cache(q1, _ctr(q1))
        assert hit is not None, f"{qs!r}: expansion memo missed"
        _q, _reqs, ctx1 = hit
        assert ctx1.expanded == ctx0.expanded, qs
        assert ctx1.df == ctx0.df, qs
        assert ctx1.n_docs == ctx0.n_docs and ctx1.avgdl == ctx0.avgdl


def test_result_metadata_join(built):
    engine = SearchEngine(built[1], parallel=False)
    t = engine.search("xylophone42", k=5)
    assert t.column_names == ["doc_id", "conv_id", "turn_idx", "score"]
    assert t.num_rows > 0
    # doc_id is the rank under stable (conv_id, turn_idx) order
    doc = t["doc_id"][0].as_py()
    assert t["conv_id"][0].as_py() == f"conv-{doc // T.TURNS_PER_CONV:010d}"
    assert t["turn_idx"][0].as_py() == doc % T.TURNS_PER_CONV


def test_per_turn_text_equality_invariant(built):
    """Docmapped output preserves every turn's text under (conv_id, turn_idx)."""
    data_dir, index_dir, table = built
    mapped = pq.read_table(
        os.path.join(index_dir, "docmapped"),
        columns=["conv_id", "turn_idx", "text", "doc_id"],
    )
    order = pc.sort_indices(
        mapped, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    mapped = mapped.take(order)
    src_order = pc.sort_indices(
        table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    src = table.take(src_order)
    assert mapped.num_rows == src.num_rows == N_TURNS
    assert mapped["text"].to_pylist() == src["text"].to_pylist()
    assert mapped["doc_id"].to_pylist() == list(range(N_TURNS))


def test_resume_after_docmap_crash(built, tmp_path):
    """A half-written docmap (no index_meta yet) must be wiped, not appended to."""
    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "crash_idx")
    build_index(ds, index_dir, num_segments=2, batch_size=400)
    ref = SearchEngine(index_dir, parallel=False).search("data", k=5, with_meta=False)
    # simulate a crash BEFORE meta was written: meta gone, docmapped half-present
    os.remove(os.path.join(index_dir, "index_meta.json"))
    shutil.rmtree(os.path.join(index_dir, "segments"))
    build_index(ds, index_dir, num_segments=2, batch_size=400)
    again = SearchEngine(index_dir, parallel=False).search("data", k=5, with_meta=False)
    assert ref.to_pydict() == again.to_pydict()
    # doc count must not have doubled (no appended duplicate docmap files)
    import pyarrow.parquet as pq2

    mapped = pq2.read_table(os.path.join(index_dir, "docmapped"), columns=["doc_id"])
    assert mapped.num_rows == N_TURNS


def test_hot_term_skew_build(ray_session, tmp_path):
    """A term present in EVERY doc must spread across pieces (no monolithic merge)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2
    import ray.data

    n = 4000
    t = pa2.table(
        {
            "conv_id": pa2.array([f"c{i // 8:06d}" for i in range(n)]),
            "turn_idx": pa2.array([i % 8 for i in range(n)], pa2.int32()),
            "role": pa2.array(["user"] * n),
            "text": pa2.array(["hot filler" if i % 2 else "hot other word" for i in range(n)]),
            "tool": pa2.array(["none"] * n),
            "ts": pa2.array([1_700_000_000_000_000 + i] * 1 if False else [1_700_000_000_000_000 + i for i in range(n)], pa2.timestamp("us")),
        }
    )
    data = str(tmp_path / "skew.parquet")
    pq2.write_table(t, data)

    def hot_rows(index_dir):
        return pq2.read_table(
            os.path.join(index_dir, "segments", "seg-00000", "postings.parquet"),
            columns=["term", "df"],
            filters=[("term", "==", "hot")],
        )

    # raw piece layout: the 100%-df term spreads across per-batch pieces —
    # no monolithic merge task ever exists
    raw_dir = str(tmp_path / "skew_idx_raw")
    build_index(
        ray.data.read_parquet(data), raw_dir, num_segments=1,
        range_width=256, batch_size=500, piece_merge_rows=None,
    )
    raw = hot_rows(raw_dir)
    assert raw.num_rows > 1
    assert sum(raw["df"].to_pylist()) == n

    # in-build piece merge (default): same postings, fewer rows; the merge is
    # window-local so there is still no skewed all-to-all for the hot term
    merged_dir = str(tmp_path / "skew_idx")
    build_index(
        ray.data.read_parquet(data), merged_dir, num_segments=1,
        range_width=256, batch_size=500,
    )
    merged = hot_rows(merged_dir)
    assert 1 <= merged.num_rows < raw.num_rows
    assert sum(merged["df"].to_pylist()) == n
    eng = SearchEngine(merged_dir, parallel=False)
    assert eng.match_all("hot").num_rows == n


def test_append_index_incremental_ingest(built, oracle, tmp_path):
    """append_index ingests new conversations as fresh committed segments:
    results over the union are rank+score-identical to the oracle on the union
    table, existing doc ids are untouched, and an uncommitted leftover segment
    from a crashed append stays invisible to readers."""
    import json

    import ray.data

    from lucille_ray.index.build import append_index

    data_dir, _, table = built
    # split the corpus by conversation: first 70% of convs = base, rest = append
    convs = sorted(set(table["conv_id"].to_pylist()))
    cut = convs[int(len(convs) * 0.7)]
    mask = pc.less(table["conv_id"], cut)
    base_t, app_t = table.filter(mask), table.filter(pc.invert(mask))
    base_p = str(tmp_path / "base.parquet")
    app_p = str(tmp_path / "app.parquet")
    pq.write_table(base_t, base_p)
    pq.write_table(app_t, app_p)

    index_dir = str(tmp_path / "aidx")
    build_index(
        ray.data.read_parquet(base_p), index_dir, num_segments=2,
        range_width=256, batch_size=400,
    )
    meta0 = json.load(open(os.path.join(index_dir, "index_meta.json")))
    assert meta0["total_docs"] == base_t.num_rows

    meta1 = append_index(
        ray.data.read_parquet(app_p), index_dir, num_segments=2, batch_size=400,
    )
    assert meta1["total_docs"] == table.num_rows
    assert meta1["num_segments"] == 4

    # union oracle: conv-sorted union table == base convs then appended convs,
    # so oracle rank doc ids equal the engine's (append preserves id order)
    engine = SearchEngine(index_dir, parallel=False)
    for qs in QUERY_SET[::4]:
        _compare(engine, oracle, qs)
    # per-turn text equality invariant holds across the append boundary
    t = engine.search("xylophone42", k=5)
    assert t.num_rows > 0

    # crash-safety: an uncommitted segment dir (no committed meta) is invisible
    seg_root = os.path.join(index_dir, "segments")
    os.makedirs(os.path.join(seg_root, "seg-00004", "junk"))
    engine2 = SearchEngine(index_dir, parallel=False)
    assert len(engine2.seg_dirs) == 4
    got = engine2.search(QUERY_SET[0], k=10, with_meta=False)
    exp = engine.search(QUERY_SET[0], k=10, with_meta=False)
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()

    # a re-run of a "crashed" append wipes the leftovers and converges
    meta2 = append_index(
        ray.data.read_parquet(app_p), index_dir, num_segments=2, batch_size=400,
    )
    assert meta2["total_docs"] == table.num_rows + app_t.num_rows  # duplicate-add contract
    # rebuild clean for the identity check below
    import shutil as sh

    sh.rmtree(index_dir)
    build_index(
        ray.data.read_parquet(base_p), index_dir, num_segments=2,
        range_width=256, batch_size=400,
    )
    append_index(ray.data.read_parquet(app_p), index_dir, num_segments=2, batch_size=400)
    engine3 = SearchEngine(index_dir, parallel=False)
    for qs in QUERY_SET[::5]:
        _compare(engine3, oracle, qs)


def test_delete_tombstones(built, tmp_path):
    """Tombstoned conversations vanish from every query shape; surviving docs
    keep BIT-IDENTICAL scores (stats stay maxDoc-based until a rewrite, the
    Lucene liveDocs contract); deletes are idempotent and accumulative."""
    import ray.data

    from lucille_ray.index import delete_conversations, delete_docs

    data_dir, _, table = built
    index_dir = str(tmp_path / "didx")
    build_index(
        ray.data.read_parquet(data_dir), index_dir, num_segments=2,
        range_width=256, batch_size=400,
    )
    before = SearchEngine(index_dir, parallel=False)

    queries = [
        "data", "data AND query", '"lazy evaluation"', "deploy OR jump",
        "data AND NOT query", "(data query join)@2", "role:assistant AND deploy",
    ]
    pre = {qs: before.search(qs, k=50, with_meta=False) for qs in queries}
    # pick the conversation of the top 'data' hit — guaranteed in results
    victim_conv = before.search("data", k=1)["conv_id"][0].as_py()
    victim_docs = set(
        i for i, c in enumerate(sorted(
            zip(table["conv_id"].to_pylist(), table["turn_idx"].to_pylist())
        )) if c[0] == victim_conv
    )
    assert victim_docs

    n = delete_conversations(index_dir, [victim_conv])
    assert n == len(victim_docs)
    assert delete_conversations(index_dir, [victim_conv]) == 0  # idempotent
    assert delete_docs(index_dir, [10**12]) == 0  # out of range ignored

    after = SearchEngine(index_dir, parallel=False)
    for qs in queries:
        got = after.search(qs, k=50, with_meta=False)
        gp = list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
        exp = [
            (d, s)
            for d, s in zip(pre[qs]["doc_id"].to_pylist(), pre[qs]["score"].to_pylist())
            if d not in victim_docs
        ][: len(gp)]
        assert [d for d, _ in gp][: len(exp)] == [d for d, _ in exp], qs
        for (gd, gs), (ed, es) in zip(gp, exp):
            assert gs == es, f"{qs!r}: survivor score changed {gs} != {es}"
    # match_all excludes tombstoned docs too
    ma = after.match_all("data")
    assert not victim_docs & set(ma["doc_id"].to_pylist())
    # the tombstoned conv really did match before
    assert victim_docs & set(before.match_all("data")["doc_id"].to_pylist())


def test_delete_purge_at_compaction(built, tmp_path):
    """Compaction purges tombstones (the Lucene merge moment): deleted docs
    leave the postings physically, live stats (numDocs/avgdl/df) take over, the
    tombstone file disappears (WAND re-enables), and the purged index is
    rank+score-equivalent to a brute-force oracle over the live corpus."""
    import json

    import ray.data

    from lucille_ray.index import compact_index, delete_conversations

    data_dir, _, table = built
    index_dir = str(tmp_path / "pidx")
    build_index(
        ray.data.read_parquet(data_dir), index_dir, num_segments=2,
        range_width=256, batch_size=400,
    )
    victim_conv = SearchEngine(index_dir, parallel=False).search(
        "data", k=1
    )["conv_id"][0].as_py()
    n_deleted = delete_conversations(index_dir, [victim_conv])
    assert n_deleted > 0

    compact_index(index_dir)

    seg_root = os.path.join(index_dir, "segments")
    purged = 0
    for name in sorted(os.listdir(seg_root)):
        seg_dir = os.path.join(seg_root, name)
        assert not os.path.exists(os.path.join(seg_dir, "deleted.npy"))
        mf = json.load(open(os.path.join(seg_dir, "MANIFEST.json")))
        purged += int(mf.get("purged_docs", 0))
    assert purged == n_deleted

    engine = SearchEngine(index_dir, parallel=False)
    for s in engine._scorers():
        assert all(r.deleted is None for r in s.readers)  # WAND path restored

    # equivalence with an index built from the live corpus: compare by
    # (conv_id, turn_idx) since engine doc ids keep their (gappy) values
    live = table.filter(pc.invert(pc.equal(table["conv_id"], victim_conv)))
    live_oracle = BruteForceOracle(live)
    for qs in QUERY_SET[::3]:
        got = engine.search(qs, k=10)
        exp = live_oracle.search(qs, k=10)
        assert got.num_rows == len(exp), qs
        exp_keys = [
            (live_oracle.conv_id[d], live_oracle.turn_idx[d]) for d, _ in exp
        ]
        got_keys = list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
        assert got_keys == exp_keys, f"{qs!r}: {got_keys[:3]} vs {exp_keys[:3]}"
        for gs, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(gs - es) < 1e-9, qs

    # re-compaction without new deletes is a resume no-op
    mfp = os.path.join(seg_root, "seg-00000", "MANIFEST.json")
    mtime = os.path.getmtime(mfp)
    compact_index(index_dir)
    assert os.path.getmtime(mfp) == mtime


def test_ranged_docid_mode_identical_results(built, oracle, tmp_path):
    """docid_mode='ranged' (distributed sort + hash join, no driver conv map)
    must produce an identical index: same doc ids, same search results."""
    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "ranged_idx")
    build_index(
        ds, index_dir, num_segments=2, range_width=256, batch_size=400,
        docid_mode="ranged",
    )
    mapped = pq.read_table(
        os.path.join(index_dir, "docmapped"), columns=["conv_id", "turn_idx", "doc_id"]
    )
    order = pc.sort_indices(
        mapped, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    mapped = mapped.take(order)
    assert mapped["doc_id"].to_pylist() == list(range(N_TURNS))
    engine = SearchEngine(index_dir, parallel=False)
    for qs in QUERY_SET[::5]:
        _compare(engine, oracle, qs)


def test_turn_idx_duplicate_detection(ray_session, tmp_path):
    """[0,0,2] has the right count and max but duplicated indices — the build
    must fail fast instead of minting duplicate doc_ids."""
    import ray.data

    t = pa.table(
        {
            "conv_id": pa.array(["c0", "c0", "c0"]),
            "turn_idx": pa.array([0, 0, 2], pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["a", "b", "c"]),
            "tool": pa.array(["none"] * 3),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )
    data = str(tmp_path / "dup.parquet")
    pq.write_table(t, data)
    with pytest.raises(Exception, match="dense"):
        build_index(
            ray.data.read_parquet(data), str(tmp_path / "dup_idx"), num_segments=1
        )


def test_fused_docmap_rank_identity_and_no_roundtrip(built, oracle, tmp_path):
    """Single-segment builds fuse the doc-id-assigned Dataset straight into
    the tokenize pipeline (no docmapped parquet round-trip) and stay
    rank+score-identical to the unfused build."""
    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    fused_dir = str(tmp_path / "fused_idx")
    build_index(ds, fused_dir, num_segments=1, batch_size=400)
    assert not os.path.isdir(os.path.join(fused_dir, "docmapped"))
    with open(os.path.join(fused_dir, "index_meta.json")) as f:
        assert json.load(f)["docmap"] == "fused"

    unfused_dir = str(tmp_path / "unfused_idx")
    os.environ["LR_FUSE_DOCMAP"] = "0"
    try:
        build_index(ds, unfused_dir, num_segments=1, batch_size=400)
    finally:
        del os.environ["LR_FUSE_DOCMAP"]
    assert os.path.isdir(os.path.join(unfused_dir, "docmapped"))

    ef = SearchEngine(fused_dir, parallel=False)
    eu = SearchEngine(unfused_dir, parallel=False)
    for qs in QUERY_SET[::4]:
        tf_ = ef.search(qs, k=10, with_meta=False)
        tu = eu.search(qs, k=10, with_meta=False)
        assert tf_.to_pydict() == tu.to_pydict()
        _compare(ef, oracle, qs)
    # result metadata comes from the O(#convs) convmap, not a forward index,
    # and must match the docmapped join bit-for-bit
    mf = ef.search("data", k=10)
    mu = eu.search("data", k=10)
    assert mf.to_pydict() == mu.to_pydict()
    assert mf.column_names == ["doc_id", "conv_id", "turn_idx", "score"]


def test_fused_docmap_resume_recomputes(built, tmp_path):
    """A half-built fused index (complete meta, incomplete segment) resumes by
    recomputing — never by trusting a docmap checkpoint that does not exist."""
    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "fused_resume_idx")
    build_index(ds, index_dir, num_segments=1, batch_size=400)
    ref = SearchEngine(index_dir, parallel=False).search(
        "data", k=5, with_meta=False
    )
    shutil.rmtree(os.path.join(index_dir, "segments"))
    build_index(ds, index_dir, num_segments=1, batch_size=400)
    again = SearchEngine(index_dir, parallel=False).search(
        "data", k=5, with_meta=False
    )
    assert ref.to_pydict() == again.to_pydict()
    # and a complete fused index resumes as a no-op (segment untouched)
    man = os.path.join(index_dir, "segments", "seg-00000", "MANIFEST.json")
    mtime = os.path.getmtime(man)
    build_index(ds, index_dir, num_segments=1, batch_size=400)
    assert os.path.getmtime(man) == mtime


def test_fused_docmap_full_lifecycle(built, tmp_path):
    """append -> delete_conversations -> compact on a FUSED-docmap index:
    appended segments carry their own docmapped metadata (plain string) and
    must concat with the fused segment's convmap-derived metadata
    (large_string unless cast); deletes resolve conv -> doc ranges through
    the convmap; compaction preserves the :fused manifest marker."""
    import ray.data

    from lucille_ray.index import compact_index, delete_conversations
    from lucille_ray.index.build import append_index

    data_dir, _, table = built
    convs = sorted(set(table["conv_id"].to_pylist()))
    cut = convs[int(len(convs) * 0.7)]
    mask = pc.less(table["conv_id"], cut)
    base_p = str(tmp_path / "fl_base.parquet")
    app_p = str(tmp_path / "fl_app.parquet")
    pq.write_table(table.filter(mask), base_p)
    pq.write_table(table.filter(pc.invert(mask)), app_p)

    idx = str(tmp_path / "fl_idx")
    build_index(ray.data.read_parquet(base_p), idx, num_segments=1,
                batch_size=400)
    append_index(ray.data.read_parquet(app_p), idx, num_segments=2,
                 batch_size=400)
    e = SearchEngine(idx, parallel=False)
    t = e.search("data", k=8)  # metadata join across fused + docmapped segs
    assert t.num_rows == 8 and t.column_names == [
        "doc_id", "conv_id", "turn_idx", "score"]

    n = delete_conversations(idx, [convs[0], convs[1]])
    assert n == 2 * T.TURNS_PER_CONV  # convmap-resolved dense doc ranges
    e2 = SearchEngine(idx, parallel=False)
    t2 = e2.search("data", k=8)
    assert convs[0] not in t2["conv_id"].to_pylist()

    compact_index(idx)
    e3 = SearchEngine(idx, parallel=False)
    t3 = e3.search("data", k=8)
    assert convs[0] not in t3["conv_id"].to_pylist()
    assert t3["conv_id"][0].as_py().startswith("conv-")


def test_missing_seg_input_with_docs_is_an_error(built, tmp_path):
    """docmapped/ deleted while index_meta.json survives must raise, not write
    an empty 'complete' manifest that silently drops the segment's docs."""
    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "gone_idx")
    build_index(ds, index_dir, num_segments=2, batch_size=400)
    shutil.rmtree(os.path.join(index_dir, "docmapped"))
    shutil.rmtree(os.path.join(index_dir, "segments"))
    with pytest.raises(ValueError, match="missing"):
        build_index(ds, index_dir, num_segments=2, batch_size=400)


def test_expansion_resolve_against_matches_scan():
    """Binary-search expansion resolution == brute matcher scan on every kind."""
    from lucille_ray.search.eval import ExpansionSpec

    vocab = np.array(sorted(
        ["cat", "catalog", "cater", "cats", "dog", "scan", "scat", "s",
         "zebra", "az", "a", "sc0", "sd"]), dtype=object)
    specs = [
        ExpansionSpec("text", "prefix", ("cat",)),
        ExpansionSpec("text", "prefix", ("s",)),
        ExpansionSpec("text", "prefix", ("zzz",)),
        ExpansionSpec("text", "range", ("cat", "scan", True, True)),
        ExpansionSpec("text", "range", ("cat", "scan", False, False)),
        ExpansionSpec("text", "range", (None, "dog", True, True)),
        ExpansionSpec("text", "range", ("s", None, True, True)),
        ExpansionSpec("text", "wildcard", ("cat.*",)),
        ExpansionSpec("text", "wildcard", ("s.an",)),
        ExpansionSpec("text", "wildcard", (".*at",)),
        ExpansionSpec("text", "fuzzy", ("cat", 1)),
        ExpansionSpec("text", "fuzzy", ("scan", 2)),
        ExpansionSpec("text", "regex", ("c.t.*",)),
    ]
    for spec in specs:
        fast = sorted(spec.resolve_against(vocab).tolist())
        slow = sorted(vocab[spec.matcher()(vocab)].tolist())
        assert fast == slow, spec


def test_expansion_bound_enforced_across_segments(ray_session, tmp_path, monkeypatch):
    """Each segment's expansion stays under the bound but the cross-segment
    union exceeds it: plan() must raise (maxClauseCount semantics)."""
    import ray.data

    rows = []
    for seg, prefix_group in ((0, "aaa"), (1, "bbb")):
        conv = f"c{seg}"
        for i in range(12):
            rows.append(
                {
                    "conv_id": conv, "turn_idx": i, "role": "user",
                    "text": f"t{prefix_group}{i} filler", "tool": "none",
                    "ts": 1_700_000_000_000_000 + i,
                }
            )
    t = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows]),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "tool": pa.array([r["tool"] for r in rows]),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        }
    )
    data = str(tmp_path / "exp.parquet")
    pq.write_table(t, data)
    index_dir = str(tmp_path / "exp_idx")
    build_index(ray.data.read_parquet(data), index_dir, num_segments=2, batch_size=50)
    import lucille_ray.search.engine as eng_mod

    engine = SearchEngine(index_dir, parallel=False)
    # per-segment hits: 12 each (under 15); union: 24 (over 15)
    monkeypatch.setattr(eng_mod, "MAX_EXPANSIONS", 15)
    with pytest.raises(ValueError, match="across segments"):
        engine.plan("t*")


def test_compaction_recovers_interrupted_swap(built, oracle, tmp_path):
    """A crash between the two publish renames leaves the segment with no
    postings.parquet; re-running compact_index must repair and still serve
    identical results."""
    from lucille_ray.index import compact_index

    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "swapidx")
    build_index(ds, index_dir, num_segments=1, range_width=128, batch_size=300)
    compact_index(index_dir)
    post = os.path.join(index_dir, "segments", "seg-00000", "postings.parquet")
    # simulate the mid-swap crash: old moved aside, new never moved in
    os.rename(post, post + ".bak")
    compact_index(index_dir)  # must restore from .bak, not crash in read_parquet
    engine = SearchEngine(index_dir, parallel=False)
    _compare(engine, oracle, "data AND query")
    # the complementary crash: new dir complete under .compact, old gone
    os.rename(post, post + ".compact")
    compact_index(index_dir)
    engine = SearchEngine(index_dir, parallel=False)
    _compare(engine, oracle, '"lazy evaluation"')
    assert os.path.isdir(post)
    assert not os.path.exists(post + ".bak")
    assert not os.path.exists(post + ".compact")


def test_compaction_preserves_results(built, oracle, tmp_path):
    """compact_index merges doc-partitioned pieces; results stay rank-identical
    and re-compaction is a resume no-op."""
    import pyarrow.parquet as pq2

    from lucille_ray.index import compact_index

    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "cidx")
    # raw pieces (no in-build merge) so compaction's row consolidation is visible
    build_index(
        ds, index_dir, num_segments=2, range_width=128, batch_size=300,
        piece_merge_rows=None,
    )
    post0 = os.path.join(index_dir, "segments", "seg-00000", "postings.parquet")
    rows_before = pq2.read_table(post0, columns=["term"]).num_rows
    compact_index(index_dir)
    rows_after = pq2.read_table(post0, columns=["term"]).num_rows
    assert rows_after < rows_before
    engine = SearchEngine(index_dir, parallel=False)
    for qs in QUERY_SET[::6]:
        _compare(engine, oracle, qs)
    mf = os.path.join(index_dir, "segments", "seg-00000", "MANIFEST.json")
    mtime = os.path.getmtime(mf)
    compact_index(index_dir)  # resume: skip
    assert os.path.getmtime(mf) == mtime


def test_piece_merge_rank_identity(built, oracle, tmp_path):
    """In-build piece compaction is layout-only: a build with the merge forced
    into many small windows stays rank+score-identical to the oracle and emits
    fewer posting rows than the raw piece build."""
    import pyarrow.parquet as pq2
    import ray.data

    data_dir, _, _ = built
    raw_dir = str(tmp_path / "pm_raw")
    merged_dir = str(tmp_path / "pm_merged")
    build_index(
        T.read_transcripts(data_dir), raw_dir, num_segments=2,
        range_width=128, batch_size=150, piece_merge_rows=None,
    )
    build_index(
        T.read_transcripts(data_dir), merged_dir, num_segments=2,
        range_width=128, batch_size=150, piece_merge_rows=2048,
    )

    def total_rows(index_dir):
        n = 0
        segs = os.path.join(index_dir, "segments")
        for seg in os.listdir(segs):
            p = os.path.join(segs, seg, "postings.parquet")
            if os.path.isdir(p):
                n += sum(
                    pq2.read_metadata(os.path.join(p, f)).num_rows
                    for f in os.listdir(p) if f.endswith(".parquet")
                )
        return n

    assert total_rows(merged_dir) < total_rows(raw_dir)
    engine = SearchEngine(merged_dir, parallel=False)
    for qs in QUERY_SET[::3]:
        _compare(engine, oracle, qs)


def test_suggest_search_as_you_type(built, oracle):
    """suggest() == search of the mapLastTerm-expanded AST (Term -> Term OR Prefix)."""
    from lucille_ray.query import Or, Prefix, Term, parse as parse_q

    engine = SearchEngine(built[1], parallel=False)
    got = engine.suggest("data AND depl", k=10, with_meta=False)
    expanded = parse_q("data AND depl").map_last_term(
        lambda t: Or(Term(t.value), Prefix(t.value))
    )
    exp = oracle.search(expanded, k=10)
    assert got["doc_id"].to_pylist() == [d for d, _ in exp]
    assert len(exp) > 0  # 'depl' alone matches nothing; the prefix expansion must


def test_term_partitioned_layout_matches(built, oracle, tmp_path):
    """The groupby-shuffle layout must produce identical search results."""
    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "tp_index")
    build_index(
        ds, index_dir, num_segments=2, range_width=256, batch_size=400,
        layout="term_partitioned",
    )
    engine = SearchEngine(index_dir, parallel=False)
    for qs in QUERY_SET[::5]:
        _compare(engine, oracle, qs)


def test_resume_skips_complete_segments_and_rebuilds_missing(built, oracle):
    data_dir, index_dir, _ = built
    ds = T.read_transcripts(data_dir)
    # all segments complete -> resume is a no-op (manifests untouched)
    m0 = os.path.join(index_dir, "segments", "seg-00000", "MANIFEST.json")
    mtime_before = os.path.getmtime(m0)
    build_index(ds, index_dir, num_segments=2, range_width=256, batch_size=400)
    assert os.path.getmtime(m0) == mtime_before

    # kill segment 1 mid-flight (manifest removed) -> resume rebuilds only it
    seg1 = os.path.join(index_dir, "segments", "seg-00001")
    os.remove(os.path.join(seg1, "MANIFEST.json"))
    shutil.rmtree(os.path.join(seg1, "postings.parquet"))
    assert not segment_complete(index_dir, 1)
    build_index(ds, index_dir, num_segments=2, range_width=256, batch_size=400)
    assert segment_complete(index_dir, 1)
    assert os.path.getmtime(m0) == mtime_before  # seg 0 untouched
    engine = SearchEngine(index_dir, parallel=False)
    _compare(engine, oracle, "data AND query")
    _compare(engine, oracle, '"lazy evaluation"')


def test_build_report_structure(ray_session, tmp_path):
    from lucille_ray import transcripts as T
    from lucille_ray.index import build_index, compact_index, build_report

    data_dir = str(tmp_path / "rep_data")
    T.generate(3000, data_dir, num_files=2)
    idx = str(tmp_path / "rep_idx")
    build_index(T.read_transcripts(data_dir), idx, num_segments=2,
                batch_size=1024)
    r = build_report(idx)
    assert r["totals"]["segments"] == 2
    assert r["totals"]["docs"] == 3000
    assert r["totals"]["index_bytes"] > 0
    assert r["build_metrics"]["total_sec"] > 0
    assert all(s["status"] == "complete" for s in r["segments"])
    assert not any(s["compacted"] for s in r["segments"])
    # per-stage Ray Data stats are parsed into structured per-operator dicts
    staged = [s for s in r["segments"] if s.get("stages")]
    assert staged, "no segment carried parsed stage stats"
    for op in staged[0]["stages"]:
        assert op["operator"] and op["tasks"] >= 1
        assert op["wall_sec"] > 0 and op["remote_wall_sec"] >= 0
    assert r["stage_totals"], "index-level stage rollup missing"
    roll = {op["operator"]: op for op in r["stage_totals"]}
    for name, op in roll.items():
        per_seg = [o for s in staged for o in s["stages"]
                   if o["operator"] == name]
        assert op["tasks"] == sum(o["tasks"] for o in per_seg)
    compact_index(idx)
    r2 = build_report(idx)
    assert all(s["compacted"] for s in r2["segments"])
    assert r2["totals"]["posting_rows"] <= r["totals"]["posting_rows"]


def test_match_all_stream_matches_gathered(built, ray_session):
    """match_all_stream (Dataset from scorer-table refs) == match_all (gathered),
    in both engine modes, with and without metadata."""
    for parallel in (False, True):
        engine = SearchEngine(built[1], parallel=parallel)
        try:
            for qs in ("data AND query", "xylophone42", "nosuchterm"):
                got = engine.match_all(qs)
                ds = engine.match_all_stream(qs)
                st = ds.sort("doc_id").take_all()
                assert [r["doc_id"] for r in st] == got["doc_id"].to_pylist(), (
                    parallel, qs)
                assert [r["score"] for r in st] == got["score"].to_pylist()
            meta = engine.match_all_stream("xylophone42", with_meta=True)
            row = meta.take(1)[0]
            assert set(row) == {"doc_id", "conv_id", "turn_idx", "score"}
        finally:
            engine.shutdown()


def test_replicated_engine_identical(built, ray_session):
    """replicas>1 stripes work across duplicate scorer sets; every API answer
    must be identical to the single-set engine (same docs AND scores). Engines
    run sequentially — the 4-CPU test session can't host both actor pools."""
    base = SearchEngine(built[1], parallel=True)
    try:
        singles = {qs: base.search(qs, k=7, with_meta=False) for qs in QUERY_SET[:8]}
        batch_base = base.search_many(QUERY_SET[:7], k=5)
    finally:
        base.shutdown()
    # ask for more replicas than fit: the CPU cap must clamp, not deadlock
    rep = SearchEngine(built[1], parallel=True, replicas=16)
    try:
        assert 1 <= len(rep._scorer_sets()) <= 2  # 4 cpus / 2 groups
        rep.warm("data")  # fans to every set across all replicas
        for qs, a in singles.items():
            b = rep.search(qs, k=7, with_meta=False)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), qs
            assert a["score"].to_pylist() == b["score"].to_pylist(), qs
        # uneven stripes: 7 queries over the replica sets
        batch = rep.search_many(QUERY_SET[:7], k=5)
        for (ad, ascr), (bd, bs) in zip(batch_base, batch):
            assert ad.tolist() == bd.tolist()
            assert ascr.tolist() == bs.tolist()
        # warm_many fans the batch vocabulary to every set; calibrate picks a
        # serving mode — answers must stay bit-identical in BOTH modes
        rep.warm_many(QUERY_SET[:7], k=5)
        mode = rep.calibrate(QUERY_SET[:7], k=5, passes=1)
        assert mode in ("striped", "single")
        for forced in ("striped", "single"):
            rep._mode = forced
            batch = rep.search_many(QUERY_SET[:7], k=5)
            for (ad, ascr), (bd, bs) in zip(batch_base, batch):
                assert ad.tolist() == bd.tolist(), forced
                assert ascr.tolist() == bs.tolist(), forced
    finally:
        rep.shutdown()


def test_df_cache_skips_resolve_bit_identical(built, ray_session, monkeypatch):
    """Second query over the same vocabulary must skip the resolve round-trip
    and still answer bit-identically to a fresh (cache-cold) engine."""
    import lucille_ray.search.engine as eng_mod

    calls = []
    orig = eng_mod.SegmentScorer.resolve

    def counting(self, reqs):
        calls.append(1)
        return orig(self, reqs)

    monkeypatch.setattr(eng_mod.SegmentScorer, "resolve", counting)
    engine = SearchEngine(built[1], parallel=False)
    a1 = engine.search("data AND query", k=5, with_meta=False)
    n1 = len(calls)
    assert n1 >= 1
    a2 = engine.search("data AND query", k=5, with_meta=False)
    assert len(calls) == n1, "repeat query must not resolve again"
    assert a1["doc_id"].to_pylist() == a2["doc_id"].to_pylist()
    assert a1["score"].to_pylist() == a2["score"].to_pylist()
    # known-absent terms cache as df=0 after one resolve
    engine.search("data AND nosuchterm", k=5, with_meta=False)
    # a DIFFERENT query over cached vocabulary also skips, and matches a
    # cache-cold engine bit-exactly (incl. phrase/positional and absent terms)
    for qs in ('query OR data', '"data query"~2', "data AND nosuchterm"):
        before = len(calls)
        got = engine.search(qs, k=5, with_meta=False)
        assert len(calls) == before, qs
        cold = SearchEngine(built[1], parallel=False)
        exp = cold.search(qs, k=5, with_meta=False)
        assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist(), qs
        assert got["score"].to_pylist() == exp["score"].to_pylist(), qs
    # dictionary expansions can never be answered from the df cache
    before = len(calls)
    engine.search("dat*", k=5, with_meta=False)
    assert len(calls) > before
    # batch planning resolves only the uncached queries
    before = len(calls)
    engine.search_many(["data AND query", "brandnewterm999"], k=5)
    assert len(calls) == before + 1


def test_conv_offsets_tree_reduce_identical(ray_session):
    """Past CONV_MERGE_FANOUT partial blocks the conv-offsets merge runs as a
    tree of Ray tasks (VERDICT r03 #4 — the ~0.9 s driver-serial sort at 10M);
    the result must be identical to the driver-side merge, and the tree path
    must actually be taken."""
    import ray

    from lucille_ray.index import build as B

    n = 4000
    tab = pa.table(
        {
            "conv_id": pa.array(
                [f"conv-{(i * 7919) % 400:04d}" for i in range(n)], pa.string()
            ),
            "turn_idx": pa.array([0] * n, pa.int32()),
        }
    )
    # dense 0..n-1 turn_idx per conv, in scattered order
    import collections

    seen = collections.Counter()
    turns = []
    for c in tab["conv_id"].to_pylist():
        turns.append(seen[c])
        seen[c] += 1
    tab = tab.set_column(1, "turn_idx", pa.array(turns, pa.int32()))

    # 40 blocks >> fanout 8 -> forces two tree levels
    ds = ray.data.from_arrow([tab.slice(i, 100) for i in range(0, n, 100)])
    assert ds.num_blocks() > B.CONV_MERGE_FANOUT
    convs_t, bases_t, counts_t = B._conv_offsets(ds)

    # driver-path reference: merge every partial in-process
    parts = [B._conv_partial_counts(tab.slice(i, 100)) for i in range(0, n, 100)]
    merged = B._merge_conv_partials(parts)
    counts_ref = merged["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert convs_t.to_pylist() == merged["conv_id"].to_pylist()
    np.testing.assert_array_equal(counts_t, counts_ref)
    np.testing.assert_array_equal(
        bases_t, np.concatenate([[0], np.cumsum(counts_ref)[:-1]])
    )

    # the small-block path (<= fanout refs) still merges on the driver and agrees
    ds_small = ray.data.from_arrow([tab])
    convs_s, bases_s, counts_s = B._conv_offsets(ds_small)
    assert convs_s.to_pylist() == convs_t.to_pylist()
    np.testing.assert_array_equal(counts_s, counts_t)
    np.testing.assert_array_equal(bases_s, bases_t)


def test_conv_offsets_tree_reduce_validates(ray_session):
    """Density violations surface through the tree path too."""
    import ray

    from lucille_ray.index import build as B

    tab = pa.table(
        {
            "conv_id": pa.array([f"c{i % 50:03d}" for i in range(1000)], pa.string()),
            "turn_idx": pa.array([0] * 1000, pa.int32()),  # duplicate turn 0
        }
    )
    ds = ray.data.from_arrow([tab.slice(i, 50) for i in range(0, 1000, 50)])
    assert ds.num_blocks() > B.CONV_MERGE_FANOUT
    with pytest.raises(ValueError, match="dense\\+unique"):
        B._conv_offsets(ds)


def test_compacted_postings_keep_small_row_groups(built, tmp_path):
    """Guard the Ray sink quirk: passing min_rows_per_file AND
    max_rows_per_file together makes write_parquet silently drop
    row_group_size, collapsing the compacted postings into ONE row group —
    which defeats (field, term) min/max pruning and forces every cold term
    lookup to decode the segment's entire postings payload."""
    import glob

    from lucille_ray.index import compact_index
    from lucille_ray.index.build import POSTINGS_WRITE_ARGS

    data_dir, _, _ = built
    ds = T.read_transcripts(data_dir)
    index_dir = str(tmp_path / "rgidx")
    build_index(ds, index_dir, num_segments=1, range_width=128, batch_size=300)
    compact_index(index_dir)
    rgs = int(POSTINGS_WRITE_ARGS["row_group_size"])
    files = glob.glob(
        os.path.join(index_dir, "segments", "seg-00000", "postings.parquet", "*.parquet")
    )
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        # every full multiple of row_group_size must have opened a new group
        assert md.num_row_groups >= md.num_rows // rgs, (
            f, md.num_rows, md.num_row_groups,
        )


def test_pruned_postings_read_matches_scan(built, tmp_path):
    """_read_postings_rows (cached handles + row-group stat pruning) returns
    exactly what the predicate-pushdown directory scan returns, on both the
    multi-piece built layout and the compacted layout, for present / absent /
    mixed term sets and the norms pseudo-term."""
    from lucille_ray.index import compact_index
    from lucille_ray.index.build import NORMS_TERM
    from lucille_ray.index.segment import SegmentReader

    data_dir, index_dir, _ = built
    ds = T.read_transcripts(data_dir)
    cidx = str(tmp_path / "pruneidx")
    build_index(ds, cidx, num_segments=1, range_width=128, batch_size=300,
                piece_merge_rows=None)

    cases = [
        ("text", ["data", "query", "join"]),
        ("text", ["zz_definitely_absent"]),
        ("text", ["data", "zz_absent", "deploy"]),
        ("role", ["assistant"]),
        ("tool", ["bash", "python"]),
        ("text", [NORMS_TERM]),
    ]

    def check(seg_dir):
        r = SegmentReader(seg_dir)
        for field, terms in cases:
            new = r._read_postings_rows(field, terms)
            old = pq.read_table(
                os.path.join(seg_dir, "postings.parquet"),
                columns=["term", "bucket", "blocks"],
                filters=[("field", "==", field), ("term", "in", terms)],
            )
            if new is None:
                assert old.num_rows == 0, (field, terms)
                continue
            keys = [("term", "ascending"), ("bucket", "ascending")]
            assert new.sort_by(keys).equals(old.sort_by(keys)), (field, terms)

    for idx in (index_dir, cidx):  # built multi-piece layouts
        check(os.path.join(idx, "segments", "seg-00000"))
    compact_index(cidx)
    check(os.path.join(cidx, "segments", "seg-00000"))
