"""Block-max WAND: rank+score identity with the plain evaluator, and proof that
score-skipping actually skips block decodes."""

import os

import numpy as np
import pytest

from lucille_ray import transcripts as T
from lucille_ray.index.build import build_index
from lucille_ray.search.engine import SearchEngine, SegmentScorer
from lucille_ray.search.eval import SegmentEval, collect_term_requests, top_k
from lucille_ray.search.wand import wand_parts, wand_top_k
from lucille_ray.query.parser import parse

OR_QUERIES = [
    "data OR query",
    "deploy OR jump OR test OR cat",
    "the OR data OR query OR join OR jump OR deploy",  # hot + rare mix
    "data^2 OR query^0.5",
    "(data OR query OR join)^1.5",
    "role:assistant OR role:tool",
    "xylophone42 OR data",
    "the OR a",  # stopword-ish only
    "data OR data2 OR nosuchterm",
    # m-of-n MinimumMatch shapes take the same WAND path with a coverage track
    "(data query join)@2",
    "(the data query join jump deploy)@3",
    "(data query xylophone42)@2",
    "(data^2 query^0.5 join)@2",
    "(data nosuchterm query)@2",
    "(data query)@5",  # num > clauses: EMPTY on both paths
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wand"))
    data_dir = os.path.join(root, "data")
    index_dir = os.path.join(root, "index")
    T.generate(5000, data_dir, num_files=2)
    build_index(T.read_transcripts(data_dir), index_dir, num_segments=2, batch_size=1000)
    return index_dir


@pytest.mark.parametrize("qs", OR_QUERIES, ids=repr)
@pytest.mark.parametrize("k", [3, 10, 50])
def test_wand_identical_to_eval(built, qs, k):
    """WAND top-k == plain SegmentEval top-k, ranks AND scores, per segment."""
    engine = SearchEngine(built, parallel=False)
    q, reqs, ctx = engine.plan(qs)
    parts_scale = wand_parts(q)
    assert parts_scale is not None, f"{qs!r} should be WAND-eligible"
    parts, scale, m = parts_scale
    scorer = engine._scorers()[0]
    for r in scorer.readers:
        if r.doc_count == 0:
            continue
        wd, ws = wand_top_k(r, ctx, parts, k, m)
        fresh = SegmentEval(r, ctx, collect_term_requests(q), query=q)
        ed, es = fresh.eval(q)
        ed, es = top_k(ed, es, k)
        assert wd.tolist() == ed.tolist(), f"{qs!r} k={k}: rank mismatch"
        # eval(q) already applies the root boost; weight the WAND side only
        for w in reversed(scale):
            ws = ws * w
        np.testing.assert_array_equal(ws, es)


def test_wand_engine_end_to_end_matches_oracle(built, ray_session):
    import pyarrow.parquet as pq

    from lucille_ray.search.oracle import BruteForceOracle

    data_dir = os.path.join(os.path.dirname(built), "data")
    oracle = BruteForceOracle(pq.read_table(data_dir))
    engine = SearchEngine(built, parallel=False)
    for qs in OR_QUERIES:
        got = engine.search(qs, k=10, with_meta=False)
        exp = oracle.search(qs, k=10)
        gp = list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
        assert len(gp) == len(exp), qs
        for (gd, gscore), (ed, escore) in zip(gp, exp):
            assert gd == ed, f"{qs!r}: rank differs"
            assert abs(gscore - escore) < 1e-9, qs


def test_wand_actually_skips_decodes(built, monkeypatch):
    """For a rare-OR-hot query with small k, the hot term must NOT be fully
    decoded: count docs decoded via the codec."""
    import lucille_ray.search.wand as wand_mod
    from lucille_ray.index import codec

    engine = SearchEngine(built, parallel=False)
    scorer = engine._scorers()[0]
    r = max(scorer.readers, key=lambda rr: rr.doc_count)
    # hottest text term in the corpus vs the rare high-idf 'xylophone42'
    terms, dfs = r.term_dict("text")
    hot = str(terms[int(np.argmax(dfs))])
    q, reqs, ctx = engine.plan(f"xylophone42 OR {hot}")
    parts, scale, m = wand_parts(q)

    decoded_vals = {"n": 0}
    real = codec.decode_varints

    def counting(buf):
        out = real(buf)
        decoded_vals["n"] += out.size
        return out

    for f in ("text", "role", "tool"):
        r.norms(f)  # pre-warm: norms decode is not what this test measures
    monkeypatch.setattr("lucille_ray.index.codec.decode_varints", counting)
    r._post_cache.clear()
    r._raw_cache.clear()
    getattr(r, "_wand_pruned_cache", {}).clear()
    wand_top_k(r, ctx, parts, k=3)
    df_hot = ctx.df.get(("text", hot), 0)
    assert df_hot > r.doc_count // 4  # the premise: the term really is hot
    # full evaluation decodes ~2*df values (docs+tfs) for the hot term alone;
    # score-skipping must touch far less
    assert decoded_vals["n"] < df_hot, (
        f"decoded {decoded_vals['n']} values; full eval would decode ~{2 * df_hot}"
    )


def test_wand_random_queries_property(built, ray_session):
    """Randomized WAND-vs-eval identity: arbitrary term mixes (hot/rare/absent),
    arbitrary boosts, arbitrary k — ranks and scores must match exactly."""
    from hypothesis import given, settings, strategies as st

    engine = SearchEngine(built, parallel=False)
    scorer = engine._scorers()[0]
    r = max(scorer.readers, key=lambda rr: rr.doc_count)
    terms, dfs = r.term_dict("text")
    # mix of hot, mid, rare, and absent terms
    order = np.argsort(-dfs)
    pool = [str(terms[i]) for i in order[:: max(1, len(order) // 40)]][:40]
    pool += ["zzznope", "qqqmissing"]

    @settings(max_examples=60, deadline=None)
    @given(
        idxs=st.lists(st.integers(0, len(pool) - 1), min_size=2, max_size=6, unique=True),
        boosts=st.lists(st.sampled_from([1.0, 0.5, 2.0, 3.75]), min_size=6, max_size=6),
        k=st.integers(1, 40),
    )
    def check(idxs, boosts, k):
        clauses = []
        for j, i in enumerate(idxs):
            b = boosts[j]
            clauses.append(pool[i] if b == 1.0 else f"{pool[i]}^{b}")
        qs = " OR ".join(clauses)
        q, reqs, ctx = engine.plan(qs)
        parts_scale = wand_parts(q)
        assert parts_scale is not None
        parts, scale, m = parts_scale
        wd, ws = wand_top_k(r, ctx, parts, k, m)
        ev = SegmentEval(r, ctx, collect_term_requests(q), query=q)
        ed, es = top_k(*ev.eval(q), k)
        assert wd.tolist() == ed.tolist(), qs
        np.testing.assert_array_equal(ws, es)

    check()


def test_wand_minmatch_random_property(built, ray_session):
    """Randomized m-of-n identity: arbitrary term mixes, boosts, k, and m."""
    from hypothesis import given, settings, strategies as st

    engine = SearchEngine(built, parallel=False)
    scorer = engine._scorers()[0]
    r = max(scorer.readers, key=lambda rr: rr.doc_count)
    terms, dfs = r.term_dict("text")
    order = np.argsort(-dfs)
    pool = [str(terms[i]) for i in order[:: max(1, len(order) // 40)]][:40]
    pool += ["zzznope", "qqqmissing"]

    @settings(max_examples=60, deadline=None)
    @given(
        idxs=st.lists(st.integers(0, len(pool) - 1), min_size=2, max_size=6, unique=True),
        boosts=st.lists(st.sampled_from([1.0, 0.5, 2.0]), min_size=6, max_size=6),
        k=st.integers(1, 40),
        mm=st.integers(1, 7),
    )
    def check(idxs, boosts, k, mm):
        clauses = []
        for j, i in enumerate(idxs):
            b = boosts[j]
            clauses.append(pool[i] if b == 1.0 else f"{pool[i]}^{b}")
        qs = f"({' '.join(clauses)})@{mm}"
        q, reqs, ctx = engine.plan(qs)
        parts_scale = wand_parts(q)
        assert parts_scale is not None
        parts, scale, m = parts_scale
        wd, ws = wand_top_k(r, ctx, parts, k, m)
        ev = SegmentEval(r, ctx, collect_term_requests(q), query=q)
        ed, es = top_k(*ev.eval(q), k)
        assert wd.tolist() == ed.tolist(), qs
        np.testing.assert_array_equal(ws, es)

    check()


def test_min_dl_exact_after_build_and_compaction(built, ray_session):
    """Every block (freshly built AND re-cut by compaction) stores the exact
    min doc length over its own posting docs — the tight WAND bound input."""
    import shutil

    from lucille_ray.index.compact import compact_index

    for compacted in (False, True):
        idx = built
        if compacted:
            idx = built + "_compacted"
            if not os.path.isdir(idx):
                shutil.copytree(built, idx)
            compact_index(idx)
        engine = SearchEngine(idx, parallel=False)
        r = max(engine._scorers()[0].readers, key=lambda rr: rr.doc_count)
        norms = r.norms("text")
        terms, dfs = r.term_dict("text")
        hot = str(terms[int(np.argmax(dfs))])
        for term in (hot, "xylophone42"):
            for rb in [r.raw_blocks_many("text", [term])[term]]:
                docs, tfs, _ = rb.decode(False)
                at = 0
                for bi in range(len(rb)):
                    n = int(rb.ns[bi])
                    expect = int(norms[docs[at: at + n] - r.doc_base].min())
                    assert int(rb.min_dl[bi]) == expect, (compacted, term, bi)
                    at += n


def test_wand_parts_shapes():
    assert wand_parts(parse("a OR b")) is not None
    assert wand_parts(parse("(a OR b)^2")) == (
        [("text", "a", 1.0), ("text", "b", 1.0)], (2.0,), 1,
    )
    assert wand_parts(parse("role:(a OR b)"))[0][0][0] == "role"
    assert wand_parts(parse("a AND b")) is None
    assert wand_parts(parse("a OR \"b c\"")) is None  # phrase clause
    assert wand_parts(parse("a OR -b")) is None  # negative clause
    assert wand_parts(parse("a OR a")) is None  # duplicate clause float order
    assert wand_parts(parse("a OR b.c")) is None  # multi-token term
    assert wand_parts(parse("a OR ((b^2))^3")) is None  # nested clause boost
    assert wand_parts(parse("a")) is None  # single term: plain path
    # MinimumMatch shapes
    assert wand_parts(parse("(a b c)@2"))[2] == 2
    assert wand_parts(parse("(a b c)@0"))[2] == 1  # eval treats num<=0 as 1
    assert wand_parts(parse("((a b c)@2)^1.5")) == (
        [("text", "a", 1.0), ("text", "b", 1.0), ("text", "c", 1.0)], (1.5,), 2,
    )
    assert wand_parts(parse('(a "b c" d)@2')) is None  # phrase clause
    assert wand_parts(parse("(a a b)@2")) is None  # duplicate clauses count twice


def test_wand_minmatch_coverage_skips_decodes(built, monkeypatch):
    """(rare hot)@2: the rare term's docs form the exact candidate superset,
    so the hot term decodes only the blocks containing those few docs — never
    its full posting list."""
    import lucille_ray.search.wand as wand_mod
    from lucille_ray.index import codec

    engine = SearchEngine(built, parallel=False)
    scorer = engine._scorers()[0]
    r = max(scorer.readers, key=lambda rr: rr.doc_count)
    terms, dfs = r.term_dict("text")
    hot = str(terms[int(np.argmax(dfs))])
    q, reqs, ctx = engine.plan(f"(xylophone42 {hot})@2")
    parts, scale, m = wand_parts(q)
    assert m == 2

    decoded_vals = {"n": 0}
    real = codec.decode_varints

    def counting(buf):
        out = real(buf)
        decoded_vals["n"] += out.size
        return out

    for f in ("text", "role", "tool"):
        r.norms(f)
    monkeypatch.setattr("lucille_ray.index.codec.decode_varints", counting)
    r._post_cache.clear()
    r._raw_cache.clear()
    getattr(r, "_wand_pruned_cache", {}).clear()
    wd, ws = wand_top_k(r, ctx, parts, k=3, m=m)
    wand_decoded = decoded_vals["n"]  # snapshot before the identity check below
    # identity against the plain evaluator on the same segment
    ev = SegmentEval(r, ctx, collect_term_requests(q), query=q)
    ed, es = top_k(*ev.eval(q), 3)
    assert wd.tolist() == ed.tolist()
    np.testing.assert_array_equal(ws, es)
    df_hot = ctx.df.get(("text", hot), 0)
    assert df_hot > r.doc_count // 4
    assert wand_decoded < df_hot // 2, (
        f"decoded {wand_decoded} values; full eval would decode ~{2 * df_hot}"
    )


# ---------------------------------------------------------------------------
# dictionary expansions through WAND (VERDICT r03 #6)
# ---------------------------------------------------------------------------

EXPANSION_QUERIES = [
    "deploy*",          # prefix family
    "d*",               # prefix including the hot 'data'
    "[da TO dz]",       # range spanning hot + rare terms
    "[aa TO dz]",       # the VERDICT's wide-range shape
    "c?tch",            # wildcard
    "/jump.*/",         # regex
    "cat~1",            # fuzzy
    "(deploy*)^2.5",    # boosted expansion (scale applied after merge)
    "role:a*",          # field-routed expansion
    "[* TO catch]",     # open lower bound
]


@pytest.mark.parametrize("qs", EXPANSION_QUERIES, ids=repr)
@pytest.mark.parametrize("k", [3, 10, 50])
def test_expansion_wand_identical_to_eval(built, qs, k):
    """WAND over the expanded term set == plain boolean-rewrite union,
    ranks AND scores, per segment."""
    from lucille_ray.search.wand import expansion_wand_parts

    engine = SearchEngine(built, parallel=False)
    q, reqs, ctx = engine.plan(qs)
    ps = expansion_wand_parts(q, ctx)
    if ps is None:
        n_terms = sum(len(v) for v in ctx.expanded.values())
        assert n_terms < 2, f"{qs!r} expanded to {n_terms} terms but wasn't eligible"
        pytest.skip(f"{qs!r} expands to <2 terms on this corpus")
    parts, scale, m = ps
    assert m == 1
    scorer = engine._scorers()[0]
    for r in scorer.readers:
        if r.doc_count == 0:
            continue
        wd, ws = wand_top_k(r, ctx, parts, k, m)
        fresh = SegmentEval(r, ctx, collect_term_requests(q), query=q)
        ed, es = fresh.eval(q)
        ed, es = top_k(ed, es, k)
        assert wd.tolist() == ed.tolist(), f"{qs!r} k={k}: rank mismatch"
        for w in reversed(scale):
            ws = ws * w
        np.testing.assert_array_equal(ws, es)


def test_expansion_wand_engine_toggle_identical(built, monkeypatch):
    """LR_BMEXP=0 pins the plain evaluator; answers must be bit-identical."""
    baseline = {}
    monkeypatch.setenv("LR_BMEXP", "0")
    engine = SearchEngine(built, parallel=False)
    for qs in EXPANSION_QUERIES:
        t = engine.search(qs, k=10, with_meta=False)
        baseline[qs] = (t["doc_id"].to_pylist(), t["score"].to_pylist())
    monkeypatch.setenv("LR_BMEXP", "1")
    engine2 = SearchEngine(built, parallel=False)
    for qs in EXPANSION_QUERIES:
        t = engine2.search(qs, k=10, with_meta=False)
        assert t["doc_id"].to_pylist() == baseline[qs][0], qs
        assert t["score"].to_pylist() == baseline[qs][1], qs


def test_expansion_wand_parts_shapes(built):
    from lucille_ray.search.wand import expansion_wand_parts

    engine = SearchEngine(built, parallel=False)
    q, _reqs, ctx = engine.plan("deploy*")
    ps = expansion_wand_parts(q, ctx)
    assert ps is not None and ps[1] == () and ps[2] == 1
    assert all(b == 1.0 for _f, _t, b in ps[0])
    # parts must follow ctx.expanded tuple order (eval's accumulation order)
    spec = next(iter(ctx.expanded))
    assert tuple(t for _f, t, _b in ps[0]) == ctx.expanded[spec]
    q2, _r2, ctx2 = engine.plan("(deploy*)^3")
    assert expansion_wand_parts(q2, ctx2)[1] == (3.0,)
    q3, _r3, ctx3 = engine.plan("role:a*")
    ps3 = expansion_wand_parts(q3, ctx3)
    if ps3 is not None:
        assert all(f == "role" for f, _t, _b in ps3[0])
    # non-expansion shapes are not claimed
    q4, _r4, ctx4 = engine.plan("data OR query")
    assert expansion_wand_parts(q4, ctx4) is None
    q5, _r5, ctx5 = engine.plan("xylophone42 AND data")
    assert expansion_wand_parts(q5, ctx5) is None


def test_expansion_wand_skips_hot_term_decode(built, monkeypatch):
    """[da TO dz] includes the hot 'data': after the rare expanded terms
    bootstrap theta, the hot term's low-idf blocks must be pruned, never
    fully decoded."""
    from lucille_ray.index import codec
    from lucille_ray.search.wand import expansion_wand_parts

    engine = SearchEngine(built, parallel=False)
    scorer = engine._scorers()[0]
    r = max(scorer.readers, key=lambda rr: rr.doc_count)
    q, reqs, ctx = engine.plan("[da TO dz]")
    parts, scale, m = expansion_wand_parts(q, ctx)
    assert ("text", "data") in {(f, t) for f, t, _b in parts}

    decoded_vals = {"n": 0}
    real = codec.decode_varints

    def counting(buf):
        out = real(buf)
        decoded_vals["n"] += out.size
        return out

    for f in ("text", "role", "tool"):
        r.norms(f)
    monkeypatch.setattr("lucille_ray.index.codec.decode_varints", counting)
    r._post_cache.clear()
    r._raw_cache.clear()
    getattr(r, "_wand_pruned_cache", {}).clear()
    wd, ws = wand_top_k(r, ctx, parts, k=3, m=m)
    wand_decoded = decoded_vals["n"]
    # identity (exactness is never traded for the skip) — measured with the
    # same counter on a cache-cleared reader, giving the full-eval baseline
    decoded_vals["n"] = 0
    r._post_cache.clear()
    r._raw_cache.clear()
    getattr(r, "_wand_pruned_cache", {}).clear()
    r._score_cache = {}
    r._score_cache_bytes = 0
    ev = SegmentEval(r, ctx, collect_term_requests(q), query=q)
    ed, es = top_k(*ev.eval(q), 3)
    full_decoded = decoded_vals["n"]
    assert wd.tolist() == ed.tolist()
    np.testing.assert_array_equal(ws, es)
    df_hot = ctx.df.get(("text", "data"), 0)
    assert df_hot > r.doc_count // 4  # premise: 'data' really is hot
    # the hot term dominates full-eval decode volume; WAND must decode only
    # the few of its blocks that overlap surviving candidate intervals
    assert wand_decoded < full_decoded - df_hot // 2, (
        f"WAND decoded {wand_decoded} values vs full eval {full_decoded}; "
        f"the hot term alone is ~{2 * df_hot}"
    )


# ---- single-term block-max top-k (wand.single_term_top_k) ----

TERM_QUERIES = [
    "data",
    "query",
    "the",
    "xylophone42",
    "data^2",
    "(data)^0.5",
    "role:assistant",
    "role:(user)^3",
    "((data^2))^1.5",
]


@pytest.mark.parametrize("qs", TERM_QUERIES, ids=repr)
@pytest.mark.parametrize("k", [1, 10, 100])
def test_single_term_identical_to_eval(built, qs, k):
    """single_term_top_k == plain SegmentEval top-k, ranks AND scores, per
    segment, with Boost weights applied innermost-first like eval."""
    from lucille_ray.search.wand import single_term_top_k, term_parts

    engine = SearchEngine(built, parallel=False)
    q, reqs, ctx = engine.plan(qs)
    tp = term_parts(q, ctx)
    assert tp is not None, f"{qs!r} should be single-term eligible"
    field, term, weights = tp
    scorer = engine._scorers()[0]
    for r in scorer.readers:
        if r.doc_count == 0:
            continue
        td, ts = single_term_top_k(r, ctx, field, term, k)
        for w in reversed(weights):
            ts = ts * w
        fresh = SegmentEval(r, ctx, collect_term_requests(q), query=q)
        ed, es = top_k(*fresh.eval(q), k)
        assert td.tolist() == ed.tolist(), f"{qs!r} k={k}: rank mismatch"
        np.testing.assert_array_equal(ts, es)


def test_single_term_engine_toggle_identical(built, monkeypatch):
    """LR_BMTERM=0 pins the plain evaluator; answers must be bit-identical."""
    baseline = {}
    monkeypatch.setenv("LR_BMTERM", "0")
    engine = SearchEngine(built, parallel=False)
    for qs in TERM_QUERIES:
        t = engine.search(qs, k=10, with_meta=False)
        baseline[qs] = (t["doc_id"].to_pylist(), t["score"].to_pylist())
    monkeypatch.setenv("LR_BMTERM", "1")
    engine2 = SearchEngine(built, parallel=False)
    for qs in TERM_QUERIES:
        t = engine2.search(qs, k=10, with_meta=False)
        assert t["doc_id"].to_pylist() == baseline[qs][0], qs
        assert t["score"].to_pylist() == baseline[qs][1], qs


def test_single_term_parts_shapes(built):
    from lucille_ray.query import parse
    from lucille_ray.search.wand import term_parts

    engine = SearchEngine(built, parallel=False)
    _q, _r, ctx = engine.plan("data")
    assert term_parts(parse("data"), ctx) == ("text", "data", ())
    assert term_parts(parse("data^2"), ctx) == ("text", "data", (2.0,))
    f, t, w = term_parts(parse("((data^2))^1.5"), ctx)
    assert (f, t) == ("text", "data") and w == (1.5, 2.0)
    # ctx must carry the query's own resolved df (plan does this)
    _q2, _r2, ctx_role = engine.plan("role:assistant")
    assert term_parts(parse("role:assistant"), ctx_role) == (
        "role", "assistant", ()
    )
    from lucille_ray.query import nodes as qn

    # negative/zero total boost flips or collapses the order: fall back
    assert term_parts(qn.Boost(qn.Term("data"), -1.0), ctx) is None
    assert term_parts(qn.Boost(qn.Term("data"), 0.0), ctx) is None
    assert term_parts(parse("a.b"), ctx) is None  # analyzer splits: phrase shape
    assert term_parts(parse("data OR query"), ctx) is None
    assert term_parts(parse("+data"), ctx) is None  # UnaryPlus stays on eval


def test_single_term_skips_decodes_and_caches(built, monkeypatch):
    """A hot term's repeat query must be answered from the per-reader top-k
    cache (zero varint decodes), and any smaller k served from the same entry."""
    from lucille_ray.index import codec
    from lucille_ray.search.wand import single_term_top_k

    engine = SearchEngine(built, parallel=False)
    q, reqs, ctx = engine.plan("data")
    scorer = engine._scorers()[0]
    r = max(scorer.readers, key=lambda rr: rr.doc_count)
    getattr(r, "_term_topk_cache", {}).clear()
    r._post_cache.clear()
    getattr(r, "_score_cache", {}).clear()
    d1, s1 = single_term_top_k(r, ctx, "text", "data", 10)
    assert d1.size == 10

    decoded = {"n": 0}
    real = codec.decode_varints

    def counting(buf):
        out = real(buf)
        decoded["n"] += out.size
        return out

    monkeypatch.setattr("lucille_ray.index.codec.decode_varints", counting)
    d2, s2 = single_term_top_k(r, ctx, "text", "data", 10)
    assert decoded["n"] == 0, "warm repeat must not decode"
    assert d2.tolist() == d1.tolist()
    np.testing.assert_array_equal(s2, s1)
    d3, s3 = single_term_top_k(r, ctx, "text", "data", 3)
    assert decoded["n"] == 0
    assert d3.tolist() == d1.tolist()[:3]


def test_result_cache_identical_and_prefix(built, monkeypatch):
    """Engine answers with the per-reader result cache must be bit-identical
    to cache-off answers, repeats must not re-score, and a smaller k must be
    served as a prefix of the cached entry."""
    from lucille_ray.search import engine as E

    off = SearchEngine(built, parallel=False, result_cache=False)
    on = SearchEngine(built, parallel=False, result_cache=True)
    queries = ["data", "data OR query", "data AND query", '"data query"~2',
               "dat*", "role:assistant AND (data OR query)^1.5"]
    for qs in queries:
        a = off.search(qs, k=10, with_meta=False)
        b = on.search(qs, k=10, with_meta=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), qs
        assert a["score"].to_pylist() == b["score"].to_pylist(), qs
        # repeat + smaller k stay identical through the cache
        b2 = on.search(qs, k=10, with_meta=False)
        assert b2["doc_id"].to_pylist() == b["doc_id"].to_pylist(), qs
        a3 = off.search(qs, k=3, with_meta=False)
        b3 = on.search(qs, k=3, with_meta=False)
        assert a3["doc_id"].to_pylist() == b3["doc_id"].to_pylist(), qs
        assert a3["score"].to_pylist() == b3["score"].to_pylist(), qs

    # repeat of a cached query must not call any scoring path at all
    scorer = on._scorers()[0]
    called = {"n": 0}
    real = E.SegmentEval.eval

    def counting(self, q):
        called["n"] += 1
        return real(self, q)

    monkeypatch.setattr(E.SegmentEval, "eval", counting)
    monkeypatch.setattr(
        "lucille_ray.search.wand.wand_top_k",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("scored")),
    )
    t = on.search("data OR query", k=10, with_meta=False)
    assert t.num_rows > 0 and called["n"] == 0

    # a LARGER k than any cached entry recomputes (cannot be a prefix)
    monkeypatch.undo()  # let the real scoring paths run again
    t2 = on.search("data OR query", k=50, with_meta=False)
    a2 = off.search("data OR query", k=50, with_meta=False)
    assert t2["doc_id"].to_pylist() == a2["doc_id"].to_pylist()


@pytest.fixture(scope="module")
def skewed_union(ray_session, tmp_path_factory):
    """One rare high-impact term + five hot low-impact terms: the suffix-bound
    merge's early cut is guaranteed (after the rare term the remaining hot
    terms' summed max-score bound falls below the rare term's k-th score)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    n = 4000
    rng = np.random.default_rng(20260819)
    fillers = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for i in range(n):
        words = ["hoti%d" % j for j in range(5)]  # every hot term in every doc
        words += [fillers[i % 4]] * int(rng.integers(1, 4))
        if i % 200 == 0:
            words += ["rarex"] * 5  # 20 docs, tf 5: high idf, high bound
        texts.append(" ".join(words))
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i // 8:06d}" for i in range(n)]),
            "turn_idx": pa.array([i % 8 for i in range(n)], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array(["none"] * n),
            "ts": pa.array(
                [1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")
            ),
        }
    )
    root = str(tmp_path_factory.mktemp("sufmerge"))
    data = os.path.join(root, "d.parquet")
    pq.write_table(t, data)
    idx = os.path.join(root, "idx")
    build_index(ray.data.read_parquet(data), idx, num_segments=1, batch_size=800)
    return idx


def test_suffix_merge_early_cut_identity(skewed_union, monkeypatch):
    """Engine-level: the wide skewed union answers bit-identically to the
    plain evaluator whichever internal merge strategy ran (VERDICT r04 #6)."""
    engine = SearchEngine(skewed_union, parallel=False, result_cache=False)
    for qs in (
        "rarex OR hoti0 OR hoti1 OR hoti2 OR hoti3 OR hoti4",
        "hoti0 OR hoti1 OR hoti2 OR hoti3 OR hoti4",
    ):
        for k in (1, 10, 37):
            a = engine.search(qs, k=k, with_meta=False)
            q, reqs, ctx = engine.plan(qs)
            r = engine._scorers()[0].readers[0]
            ed, es = top_k(
                *SegmentEval(r, ctx, collect_term_requests(q), query=q).eval(q), k
            )
            assert a["doc_id"].to_pylist() == ed.tolist(), (qs, k)
            np.testing.assert_array_equal(a["score"].to_numpy(), es)


def _classic_clause_order_merge(live, k, lo, span):
    """Reference: the classic dense clause-order merge, inlined."""
    sums = np.zeros(span)
    for d, s in live:
        sums[d - lo] += s
    cand = np.flatnonzero(sums)
    return top_k(cand + lo, sums[cand], k)


def test_suffix_merge_unit_early_cut_and_terminal():
    """Unit-level: _suffix_merge takes the early cut on a rare-anchor + hot-
    tail union and the terminal rem=0 path on a flat union; both return the
    classic clause-order merge's answer bit-for-bit (scores, ranks, ties)."""
    import lucille_ray.search.wand as W

    rng = np.random.default_rng(7)
    span, lo = 50_000, 100
    # part 0 (clause order): rare, high scores; parts 1..7: hot, low scores
    live = []
    rare_docs = np.sort(rng.choice(span, 40, replace=False)) + lo
    live.append((rare_docs.astype(np.int64), rng.uniform(8.0, 12.0, 40)))
    for _ in range(7):
        docs = np.sort(rng.choice(span, 30_000, replace=False)) + lo
        live.append((docs.astype(np.int64), rng.uniform(0.05, 0.2, docs.size)))
    for k in (1, 10, 200):
        got = W._suffix_merge(live, k, lo, span)
        assert got is not None
        if k <= 30:  # top-200 legitimately needs the hot tail: no early cut
            assert W.SUFFIX_MERGE_LAST["early"], "rare-anchor union must cut early"
        ref = _classic_clause_order_merge(live, k, lo, span)
        assert got[0].tolist() == ref[0].tolist(), k
        np.testing.assert_array_equal(got[1], ref[1])

    flat = live[1:]  # hot-only: bound never crosses -> terminal rem=0 path
    got = W._suffix_merge(flat, 10, lo, span)
    assert got is not None
    assert not W.SUFFIX_MERGE_LAST["early"]
    ref = _classic_clause_order_merge(flat, 10, lo, span)
    assert got[0].tolist() == ref[0].tolist()
    np.testing.assert_array_equal(got[1], ref[1])

    # explicit part_ubs (the wand_top_k block-max path) must agree too
    ubs = [float(s.max()) * 1.05 for _d, s in live]  # loose bounds stay valid
    got = W._suffix_merge(live, 10, lo, span, ubs)
    ref = _classic_clause_order_merge(live, 10, lo, span)
    assert got is not None and got[0].tolist() == ref[0].tolist()
    np.testing.assert_array_equal(got[1], ref[1])


def test_single_term_expansion_routes_and_matches(built, monkeypatch):
    """An expansion resolving to exactly ONE index term routes through the
    single-term block-max path (expansion_term_parts) — previously it was
    declined by expansion_wand_parts (< 2 parts) and paid the plain
    evaluator's full decode + union. Answers must stay bit-identical to the
    pinned plain evaluator for every expansion kind, including outer boosts
    (weights applied in eval's innermost-first order)."""
    from lucille_ray.search.wand import expansion_term_parts

    QS = [
        "xylophone4*",
        "x?lophone42",
        "/xylophone4[2]/",
        "[xylophone42 TO xylophone42]",
        "(xylophone4*)^2.5",
    ]
    engine = SearchEngine(built, parallel=False, result_cache=False)
    routed = []
    for qs in QS:
        q, _reqs, ctx = engine.plan(qs)
        n_terms = sum(len(v) for v in ctx.expanded.values())
        if n_terms != 1:
            continue  # corpus-dependent; the identity check below still runs
        pt = expansion_term_parts(q, ctx)
        assert pt is not None, qs
        assert pt[0] == "text" and pt[1] == "xylophone42", qs
        routed.append(qs)
    assert routed, "no query expanded to exactly one term on this corpus"
    assert expansion_term_parts(*engine.plan("deploy*")[::2]) is None  # multi-term

    monkeypatch.setenv("LR_BMEXP", "0")
    monkeypatch.setenv("LR_BMTERM", "0")
    plain = SearchEngine(built, parallel=False, result_cache=False)
    base = {qs: plain.search(qs, k=10, with_meta=False) for qs in QS}
    monkeypatch.setenv("LR_BMEXP", "1")
    monkeypatch.setenv("LR_BMTERM", "1")
    fast = SearchEngine(built, parallel=False, result_cache=False)
    for qs in QS:
        assert fast.search(qs, k=10, with_meta=False).equals(base[qs]), qs
