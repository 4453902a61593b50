"""Block-max phrase/proximity top-k: score-skipping for positional queries.

The plain positional evaluator (eval.py ``SegmentEval._phrase``) must decode
the FULL doc list of every constituent term before it can intersect — for a
hot-AND-hot phrase over a 10M-turn segment that is two multi-million-posting
decodes plus a positional decode over a huge intersection (measured 1.5 s for
``"data query"~2`` at the 10M index; BASELINE.md). The same shape bmconj.py
removed for pure conjunctions applies here, with one twist: the score is BM25
of the PHRASE frequency (matched-chain count), not a sum of per-term scores.

Exactness argument, per segment, for ``"t1 t2 ... tn"~gap`` (or a Phrase /
analyzer-split Term, gap=0):

* the phrase frequency the evaluator scores is the count of FIRST-slot
  positions with a feasible chain (`_phrase`'s backward-reachability DP) —
  distinct matches start at distinct occurrences of terms[0], but later slots
  may be SHARED between chains ("a a a b" matches "a b" three times through
  one b), so the only per-doc tf bound is tf(terms[0]). Per anchor block
  ``freq_ub`` is therefore the block's stored max_tf when the anchor IS
  terms[0], else an interval bound of terms[0]'s max_tf over the anchor
  block's [first_doc, last_doc] (bmconj's step-function RMQ, built on raw
  max_tf; overlapping piece-merged blocks sum, looser but still a bound).
  Every other term contributes feasibility only: an anchor block where some
  constituent has NO overlapping block cannot contain a match;
* BM25 is increasing in tf and decreasing in dl, so
  ``σ_ub(b) = idf_sum · tfnorm(freq_ub, min_dl_b)`` bounds every doc in b
  (min_dl is the anchor block's stored minimum doc length);
* every processed block set goes through ``process``: anchor docs decoded,
  the other terms' DOC lists fetched pruned to the shrinking candidate set,
  sorted-array intersection, positions fetched only for the survivors, then
  the same backward-reachability DP as ``_phrase`` (shared helpers) and the
  identical float scoring expression;
* bound-SKEWED segments bootstrap θ from the top-σ_ub blocks (geometric
  chunks until k matches pool), then take ONE pass over the remaining blocks
  with σ_ub ≥ θ − ε (wand.py's THETA_EPS convention) — every skipped match
  lives in exactly one skipped anchor block and its true score is bounded by
  that block's σ_ub < θ ≤ the final k-th score. bound-FLAT segments (θ can
  never beat the shared max bound) skip the θ machinery and take one
  anchor-pruned pass over all feasible blocks, which still beats the plain
  evaluator whenever the anchor is rarer than its companions.

``idf_sum <= 0`` (degenerate: every term in more than ~half the corpus under
a raw-idf variant) flips the bound direction, so that case runs the unpruned
path (`_full`, the exact `_phrase` recipe). ``LR_BMPHRASE=0`` pins `_full`
too via the engine dispatch. tests/test_bmphrase.py proves rank+score
identity vs SegmentEval over fixed and randomized corpora plus a
decode-skip proof.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..analysis import DEFAULT_FIELD, tokenize
from ..query import nodes as qn
from .bmconj import STEPFN_CACHE_ENTRIES, _StepMax, match_cache, match_cache_put
from .eval import B, EMPTY, EvalContext, K1, SegmentEval, top_k
from .wand import THETA_EPS, _sorted2, _term_block_meta

#: first chunk of anchor blocks decoded per round (doubles every round)
PHRASE_CHUNK0 = 4

# complete-match caching (VERDICT r03 #3: the ~1 s warm floor of hot
# positional queries was re-decoding the same multi-million-posting positions
# per query) now lives in bmconj.match_cache / match_cache_put, shared with
# the conjunction family; phrase keys are (field, terms-tuple, gap).
_match_cache = match_cache
_match_cache_put = match_cache_put


def phrase_parts(
    q: qn.Query, field: str = DEFAULT_FIELD
) -> Optional[Tuple[str, List[str], int, Tuple[float, ...]]]:
    """Match the positional shapes eligible for block-max skipping:
    (Group/Boost/Field/UnaryPlus)* wrapping ONE Phrase / Proximity / multi-token
    Term. Returns (field, terms, gap, boost weights outermost-first) or None.
    Weights are applied innermost-first by the caller — the same multiply
    order as eval's nested Boost handling."""
    weights: List[float] = []
    while isinstance(q, (qn.Group, qn.Boost, qn.Field, qn.UnaryPlus)):
        if isinstance(q, qn.Boost):
            weights.append(float(q.weight))
        elif isinstance(q, qn.Field):
            field = q.field
        q = q.q
    if isinstance(q, qn.Phrase):
        text, gap = q.value, 0
    elif isinstance(q, qn.Proximity):
        text, gap = q.value, max(0, q.num)
    elif isinstance(q, qn.Term):
        text, gap = q.value, 0  # analyzer may split -> implicit phrase
    else:
        return None
    terms = tokenize(text)
    if len(terms) < 2:
        return None  # single-token: the plain term path is already optimal
    return field, terms, gap, tuple(weights)


def _tf_stepfn(reader, field: str, term: str, rb) -> _StepMax:
    """Per-(field, term) interval bound over raw block max_tf (no idf/norms:
    phrase bounds need the tf itself). Cached on the reader like bmconj's."""
    cache = getattr(reader, "_phr_stepfn_cache", None)
    if cache is None:
        cache = reader._phr_stepfn_cache = {}
    sf = cache.get((field, term))
    if sf is None:
        firsts, lasts, max_tf, _dl_min = _term_block_meta(reader, field, term, rb)
        sf = _StepMax(firsts, lasts, max_tf.astype(np.float64))
        cache[(field, term)] = sf
        if len(cache) > STEPFN_CACHE_ENTRIES:
            cache.pop(next(iter(cache)))
    return sf


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED unique arrays without intersect1d's
    concatenate+sort (the posting lists are sorted by construction)."""
    if a.size > b.size:
        a, b = b, a
    if b.size == 0:
        return b[:0] if a.size == 0 else a[:0]
    idx = np.clip(np.searchsorted(b, a), 0, b.size - 1)
    return a[b[idx] == a]


def _match_freqs(posts: list, cand: np.ndarray, gap: int) -> np.ndarray:
    """Phrase frequency per candidate doc — the exact `_phrase` DP, shared:
    backward reachability over global position axes (see eval.py)."""
    stride = SegmentEval._DOC_STRIDE
    glob = [SegmentEval._global_positions(p, cand, stride) for p in posts]
    chain = glob[-1]
    for i in range(len(glob) - 2, -1, -1):
        pos_i = glob[i]
        idx = np.searchsorted(chain, pos_i, side="right")
        ok = idx < chain.size
        ok[ok] &= (chain[idx[ok]] - pos_i[ok] - 1) <= gap
        chain = pos_i[ok]
        if chain.size == 0:
            return np.zeros(cand.size, dtype=np.int64)
    return np.bincount((chain // stride).astype(np.int64), minlength=cand.size)


def _score(
    reader, ctx: EvalContext, field: str, docs: np.ndarray, freqs: np.ndarray,
    idf_sum: float,
) -> np.ndarray:
    """BM25 of the phrase frequency — float-op-identical to SegmentEval._bm25."""
    dl = reader.norms(field)[docs - reader.doc_base].astype(np.float64)
    avgdl = ctx.avgdl.get(field) or 1.0
    tf = freqs.astype(np.float64)
    denom = tf + K1 * (1.0 - B + B * dl / avgdl)
    return idf_sum * tf * (K1 + 1.0) / denom


def _positional_posts(reader, field: str, terms: List[str], cand: np.ndarray):
    """Positional postings per term (query order) pruned to candidate blocks;
    None if any term lacks overlapping positional data."""
    got = reader.postings_many(field, terms, want_positions=True, candidates=cand)
    posts = [got.get(t) for t in terms]
    if any(p is None or p[0].size == 0 or p[2] is None for p in posts):
        return None
    return posts


def _full(
    reader, ctx: EvalContext, field: str, terms: List[str], gap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Unpruned evaluation — the exact `_phrase` recipe (fallback when the
    upper bound is unusable)."""
    got0 = reader.postings_many(field, terms, want_positions=False)
    plain = [got0.get(t, (EMPTY[0], EMPTY[0], None)) for t in terms]
    if any(p[0].size == 0 for p in plain):
        return EMPTY
    cand = plain[0][0]
    for p in plain[1:]:
        cand = _intersect_sorted(cand, p[0])
        if cand.size == 0:
            return EMPTY
    posts = _positional_posts(reader, field, terms, cand)
    if posts is None:
        return EMPTY
    freqs = _match_freqs(posts, cand, gap)
    hit = freqs > 0
    if not hit.any():
        return EMPTY
    idf_sum = sum(ctx.idf(field, t) for t in terms)
    return cand[hit], _score(reader, ctx, field, cand[hit], freqs[hit], idf_sum)


def phrase_top_k(
    reader, ctx: EvalContext, field: str, terms: List[str], gap: int, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k of a phrase/proximity query over one segment, decoding only
    anchor blocks whose phrase upper bound can still beat the running k-th
    best (and other terms only around those candidates)."""
    cache_key = (field, tuple(terms), gap)
    cached = _match_cache(reader).get(cache_key)
    if cached is not None:
        # complete match set known (docs + final scores) — any k, zero decodes
        if cached[0].size == 0:
            return EMPTY
        return top_k(cached[0], cached[1], k)
    uniq = list(dict.fromkeys(terms))
    raw = reader.raw_blocks_many(field, uniq)
    for t in uniq:
        rb = raw.get(t)
        if rb is None or not len(rb):
            return EMPTY  # a constituent term absent from the segment
    idf_sum = sum(ctx.idf(field, t) for t in terms)
    if idf_sum <= 0.0:
        return _full(reader, ctx, field, terms, gap)
    avgdl = ctx.avgdl.get(field) or 1.0

    sizes = {t: int(raw[t].ns.sum()) for t in uniq}
    anchor = min(uniq, key=lambda t: sizes[t])
    a_rb = raw[anchor]
    a_firsts, a_lasts, a_max_tf, a_dl_min = _term_block_meta(
        reader, field, anchor, a_rb
    )

    # freq upper bound per anchor block: tf bound of the FIRST slot term only
    # (matches start at distinct terms[0] occurrences; later slots can be
    # shared between chains). Other terms gate feasibility, not magnitude.
    first = terms[0]
    if anchor == first:
        freq_ub = a_max_tf.astype(np.float64, copy=True)
    else:
        freq_ub = _tf_stepfn(reader, field, first, raw[first]).interval_max(
            a_firsts, a_lasts
        )
    feasible = freq_ub > 0.0
    for t in uniq:
        if t == anchor or t == first:
            continue
        mx = _tf_stepfn(reader, field, t, raw[t]).interval_max(a_firsts, a_lasts)
        feasible &= mx > 0.0  # no coverage anywhere in the anchor block
    sigma = (
        idf_sum * freq_ub * (K1 + 1.0)
        / (freq_ub + K1 * (1.0 - B + B * a_dl_min / avgdl))
    )
    idx = np.flatnonzero(feasible)
    if idx.size == 0:
        return EMPTY
    order = idx[np.argsort(-sigma[idx], kind="stable")]

    pool_docs: List[np.ndarray] = []
    pool_scores: List[np.ndarray] = []

    others_by_size = sorted((t for t in uniq if t != anchor), key=lambda t: sizes[t])

    def process(take: np.ndarray) -> int:
        """Decode + match + score one set of anchor blocks into the pool.
        Docs-only intersection FIRST (pruned to the shrinking candidate set),
        positions only for the survivors — `_full`'s step structure, so the
        no-pruning worst case costs ~one plain pass, not a positional decode
        over the whole anchor range."""
        mask = np.zeros(len(a_rb), dtype=bool)
        mask[take] = True
        docs_a, _tfs_a = _sorted2(a_rb.decode(False, keep=mask))
        if docs_a.size == 0:
            return 0
        cand = docs_a
        for t in others_by_size:
            p = reader.postings_many(
                field, [t], want_positions=False, candidates=cand
            ).get(t)
            if p is None or p[0].size == 0:
                return 0
            cand = _intersect_sorted(cand, p[0])
            if cand.size == 0:
                return 0
        posts = _positional_posts(reader, field, terms, cand)
        if posts is None:
            return 0
        freqs = _match_freqs(posts, cand, gap)
        hit = freqs > 0
        if not hit.any():
            return 0
        docs = cand[hit]
        pool_docs.append(docs)
        pool_scores.append(_score(reader, ctx, field, docs, freqs[hit], idf_sum))
        return docs.size

    # FLAT bounds (uniform corpora, hot×hot): θ can never exceed the shared
    # max bound, so score-skipping cannot prune — take ONE anchor-pruned pass
    # over every feasible block (still a win over the plain evaluator: the
    # other terms decode only blocks overlapping the anchor's docs, which is
    # what makes rare-anchor phrases fast). SKEWED bounds: bootstrap θ from
    # the top-bound blocks, then one pass over the survivors that can still
    # beat it. Two phases, not a θ-refining chunk loop: chunks are
    # bound-ordered (not doc-contiguous), so every extra chunk re-decodes the
    # hot terms' overlapping blocks — a θ-refining loop costs O(log) full
    # passes in the flat worst case, while this shape is capped at ~one
    # bootstrap + one pass and keeps the spiky-corpus early exit.
    s = sigma[idx]
    prunable = float(np.mean(s < s.max() - THETA_EPS))
    if prunable < 0.5:
        process(idx)
        complete = True
    else:
        pooled = 0
        pos = 0
        chunk = PHRASE_CHUNK0
        while pos < order.size and pooled < k:
            take = order[pos: pos + chunk]
            pos += take.size
            chunk *= 2
            pooled += process(take)
        complete = pos >= order.size
        if not complete:
            theta = float(
                -np.partition(-np.concatenate(pool_scores), k - 1)[k - 1]
            )
            rest = order[pos:]
            surv = rest[sigma[rest] >= theta - THETA_EPS]
            # θ pruned nothing (near-flat bounds in practice — the 10M hot×hot
            # shape: dl_min jitter spreads sigma past THETA_EPS so `prunable`
            # reads 1.0, yet the k-th match score clears no block's bound):
            # the pass is then COMPLETE and the match set cacheable, making
            # warm repeats decode-free at any k.
            complete = surv.size == rest.size
            if surv.size:
                process(surv)
    if complete:
        docs_all = np.concatenate(pool_docs) if pool_docs else EMPTY[0]
        scores_all = np.concatenate(pool_scores) if pool_scores else EMPTY[1]
        _match_cache_put(reader, cache_key, docs_all, scores_all)
        if docs_all.size == 0:
            return EMPTY
        return top_k(docs_all, scores_all, k)
    if not pool_docs:
        return EMPTY
    return top_k(np.concatenate(pool_docs), np.concatenate(pool_scores), k)
