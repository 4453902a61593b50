"""Top-k search over a built index: global-stats coordination + per-segment scoring
with actor-pool parallelism.

Execution model (north_star): segment shards are *pinned* — each scorer actor loads
its segments' norms/stats once in ``__init__`` and keeps posting reads warm across
queries, which is why this is one of the few places the engine drops below the
Dataset API to raw Ray actors (a ``map_batches`` actor pool is rebuilt per Dataset
execution, exactly what a query path must avoid; see SURVEY.md §2.E).

Per query:
  1. driver parses/compiles the AST and collects term requests (tiny, broadcast);
  2. each scorer resolves dictionary expansions + local dfs on its segments;
  3. driver merges to *global* df / N / avgdl (BM25 is then rank-identical to a
     single-node build — the cross-segment idf contract);
  4. each scorer evaluates vectorized posting algebra -> local top-k;
  5. driver merges k*segments rows -> global top-k (score desc, doc_id asc).

For bulk query workloads, :meth:`SearchEngine.search_many` amortizes steps 2/4 over
a whole query batch per round-trip.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pyarrow as pa

from ..index.build import INDEX_META_FILE
from ..index.segment import SegmentReader
from ..query import nodes as qn
from ..query.parser import parse
from .eval import (
    EvalContext,
    ExpansionSpec,
    MAX_EXPANSIONS,
    SegmentEval,
    TermRequests,
    collect_term_requests,
    top_k,
)

QueryLike = Union[str, qn.Query]


def _merge_ctx(
    reqs: TermRequests, resolved_list: list, n_docs: int, avgdl: Dict[str, float]
) -> Tuple[EvalContext, Dict[Tuple[str, str], int], Dict[ExpansionSpec, tuple]]:
    """Merge per-scorer resolve outputs into a global EvalContext.

    Shared by the driver's :meth:`SearchEngine._merge_resolved` and the
    scorer-side :meth:`SegmentScorer.resolve_score` fold so both paths build
    BIT-IDENTICAL plans: df values are integer sums (order-free), expansions
    merge to ``tuple(sorted(...))``, and the cross-segment MAX_EXPANSIONS
    bound is enforced before anything is returned."""
    expanded: Dict[ExpansionSpec, set] = {}
    df: Dict[Tuple[str, str], int] = {}
    for exp, dfs in resolved_list:
        for spec, terms in exp.items():
            expanded.setdefault(spec, set()).update(terms)
        for key, v in dfs.items():
            df[key] = df.get(key, 0) + v
    for spec, terms in expanded.items():
        # per-scorer resolve bounds each SEGMENT's expansion; the documented
        # maxClauseCount-style bound applies to the cross-segment union too
        if len(terms) > MAX_EXPANSIONS:
            raise ValueError(
                f"{spec.kind} expansion exceeds {MAX_EXPANSIONS} terms "
                f"across segments ({len(terms)})"
            )
    expanded_t = {s: tuple(sorted(v)) for s, v in expanded.items()}
    ctx = EvalContext(n_docs=n_docs, avgdl=avgdl, df=df, expanded=expanded_t)
    return ctx, df, expanded_t


class SegmentScorer:
    """Scores queries over a group of pinned segments (usable in-process or as a
    Ray actor via ``ray.remote(SegmentScorer)``)."""

    def __init__(
        self,
        seg_dirs: Sequence[str],
        warm_norms: bool = True,
        result_cache: bool = True,
    ):
        self.result_cache = result_cache
        self.readers = [SegmentReader(d) for d in seg_dirs]
        if warm_norms:
            # pay the per-field norms decode AND the postings footer parse at
            # ACTOR STARTUP, not on the first query's tail latency (the footer
            # pass is ~4 ms on a compacted segment but ~300 ms on a many-piece
            # uncompacted one; norms write the .npy sidecar for later readers)
            for r in self.readers:
                try:
                    for f in r.manifest.get("fields", []):
                        r.norms(f)
                except ValueError:
                    raise
                except Exception:
                    pass
                try:
                    if not r.empty:
                        r._postings_files()
                except Exception:
                    pass

    def local_stats(self) -> dict:
        # live (post-purge) counts when a compaction recorded them; identical
        # to maxDoc counts otherwise — tombstoned-but-unpurged docs still
        # count, which is what keeps survivor scores stable across a delete
        out = {"n_docs": 0, "total_dl": {}}
        for r in self.readers:
            out["n_docs"] += r.live_docs
            for f in r.stats.get("fields", {}):
                out["total_dl"][f] = out["total_dl"].get(f, 0) + r.live_total_dl(f)
        return out

    def resolve(
        self, reqs: TermRequests
    ) -> Tuple[Dict[ExpansionSpec, Tuple[str, ...]], Dict[Tuple[str, str], int]]:
        """Expand dictionary specs and collect local dfs for all needed terms."""
        expanded: Dict[ExpansionSpec, set] = {s: set() for s in reqs.expansions}
        for spec in reqs.expansions:
            for r in self.readers:
                terms, _ = r.term_dict(spec.field)
                if terms.size == 0:
                    continue
                hits = spec.resolve_against(terms)  # binary-search windows, not scans
                if hits.size > MAX_EXPANSIONS:
                    raise ValueError(
                        f"{spec.kind} expansion exceeds {MAX_EXPANSIONS} terms"
                    )
                expanded[spec].update(hits.tolist())
        needed: Dict[str, set] = {}
        for f, t in reqs.exact:
            needed.setdefault(f, set()).add(t)
        for spec, terms in expanded.items():
            needed.setdefault(spec.field, set()).update(terms)
        dfs: Dict[Tuple[str, str], int] = {}
        for f, terms in needed.items():
            for r in self.readers:
                for t, df in r.dfs(f, sorted(terms)).items():
                    dfs[(f, t)] = dfs.get((f, t), 0) + df
        return {s: tuple(sorted(v)) for s, v in expanded.items()}, dfs

    def score(
        self, query: qn.Query, reqs: TermRequests, ctx: EvalContext, k: Optional[int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Evaluate across this scorer's segments; local top-k unless ``k`` is
        None (match-all / corpus-filtering mode). Disjunctions and m-of-n
        MinimumMatch over simple terms with finite k take the block-max WAND
        score-skipping path (exact by construction; see wand.py); pure
        conjunctions of simple terms take the block-max conjunction path
        (bmconj.py)."""
        from .bmconj import (
            conj_parts,
            conj_parts_compound,
            conj_top_k,
            conj_top_k_compound,
        )
        from .bmphrase import phrase_parts, phrase_top_k
        from .wand import (
            expansion_term_parts,
            expansion_wand_parts,
            single_term_top_k,
            term_parts,
            wand_parts,
            wand_top_k,
        )

        wand = wand_parts(query) if k is not None else None
        exp_term = None
        if (
            wand is None and k is not None
            and os.environ.get("LR_BMEXP", "1") != "0"
        ):
            # top-level dictionary expansions score through WAND too: the
            # expanded union is a disjunction of simple terms (LR_BMEXP=0
            # pins the plain evaluator — same A/B valve family as LR_BMCONJ);
            # an expansion that resolved to exactly ONE term routes through
            # the single-term block-max path instead (bit-identical scores,
            # ~10x warm at 10M — see expansion_term_parts)
            wand = expansion_wand_parts(query, ctx)
            if wand is None:
                exp_term = expansion_term_parts(query, ctx)
        # LR_BMCONJ=0 / LR_BMPHRASE=0 pin eligible shapes to the plain
        # evaluator (A/B measurement + safety valve, like LR_FUSE_DOCMAP)
        conj = (
            conj_parts(query)
            if k is not None and wand is None
            and os.environ.get("LR_BMCONJ", "1") != "0"
            else None
        )
        # conjunctions whose positive clauses include OR-of-simple-terms
        # disjunctions — (a OR b)^w AND c — anchor on a single-term clause
        # and prune like conj_top_k (same LR_BMCONJ valve; bit-identical)
        conjc = (
            conj_parts_compound(query)
            if k is not None and wand is None and conj is None
            and os.environ.get("LR_BMCONJ", "1") != "0"
            else None
        )
        phrase = (
            phrase_parts(query)
            if k is not None and wand is None and conj is None
            and os.environ.get("LR_BMPHRASE", "1") != "0"
            else None
        )
        term1 = exp_term if exp_term is not None else (
            term_parts(query, ctx)
            if k is not None and wand is None and conj is None and phrase is None
            and os.environ.get("LR_BMTERM", "1") != "0"
            else None
        )
        # per-reader exact top-k result cache: a reader serves one commit point
        # (tombstones load in __init__), so (query AST, k) fully determines the
        # answer; a cached K >= k answers by prefix since top_k output is
        # (score desc, doc_id asc) ordered. Keyed by repr(query), NOT
        # print_query — the printer rounds boosts to 2 decimals, which would
        # collide distinct queries. Gated by the CONSTRUCTOR flag (the engine
        # resolves LR_RESULTCACHE in the driver — env mutations after ray.init
        # never reach running actors); bench latency stages pin it off so
        # official qps stays a scoring measurement.
        qkey = repr(query) if k is not None and self.result_cache else None
        all_docs, all_scores = [], []
        for r in self.readers:
            if r.doc_count == 0:
                continue
            if qkey is not None:
                rcache = getattr(r, "_result_topk_cache", None)
                if rcache is None:
                    rcache = r._result_topk_cache = {}
                got = rcache.get(qkey)
                if got is not None and got[0] >= k:
                    docs, scores = got[1][:k], got[2][:k]
                    if docs.size:
                        all_docs.append(docs)
                        all_scores.append(scores)
                    continue
            if wand is not None and r.deleted is None:
                # WAND reads raw blocks below the tombstone filter, so a
                # segment with deletes takes the (leaf-filtered) full
                # evaluator until a rewrite purges its tombstones
                parts, weights, min_match = wand
                docs, scores = wand_top_k(r, ctx, parts, k, min_match)
                # innermost-first: eval's nested Boost multiply order
                for w in reversed(weights):
                    scores = scores * w
            elif conj is not None and r.deleted is None:
                parts, negs, weights = conj
                docs, scores = conj_top_k(r, ctx, parts, k, tuple(negs))
                for w in reversed(weights):
                    scores = scores * w
            elif conjc is not None and r.deleted is None:
                clauses, negs, weights = conjc
                got_c = conj_top_k_compound(r, ctx, clauses, k, tuple(negs))
                if got_c is None:
                    # this segment left no single-term clause to anchor on
                    ev = SegmentEval(r, ctx, reqs, query=query)
                    docs, scores = ev.eval(query)
                else:
                    docs, scores = got_c
                    for w in reversed(weights):
                        scores = scores * w
            elif phrase is not None and r.deleted is None:
                p_field, p_terms, p_gap, weights = phrase
                docs, scores = phrase_top_k(r, ctx, p_field, p_terms, p_gap, k)
                # innermost-first: eval's nested Boost multiply order
                for w in reversed(weights):
                    scores = scores * w
            elif term1 is not None and r.deleted is None:
                t_field, t_term, weights = term1
                docs, scores = single_term_top_k(r, ctx, t_field, t_term, k)
                for w in reversed(weights):
                    scores = scores * w
            else:
                ev = SegmentEval(r, ctx, reqs, query=query)
                docs, scores = ev.eval(query)
            if docs.size and k is not None:
                docs, scores = top_k(docs, scores, k)
            if qkey is not None:
                rcache[qkey] = (k, docs, scores)
                if len(rcache) > 4096:
                    rcache.pop(next(iter(rcache)))
            if docs.size:
                all_docs.append(docs)
                all_scores.append(scores)
        if not all_docs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
        if k is not None:
            return top_k(docs, scores, k)
        order = np.argsort(docs, kind="stable")
        return docs[order], scores[order]

    def score_many(self, items: List[tuple]) -> List[tuple]:
        """[(query, reqs, ctx, k)] -> [(docs, scores)] — one round-trip per batch."""
        return [self.score(*item) for item in items]

    def resolve_score(
        self,
        query: qn.Query,
        reqs: TermRequests,
        resolved_refs: list,
        k: Optional[int],
        n_docs: int,
        avgdl: Dict[str, float],
        with_meta: bool = False,
    ):
        """Folded resolve+score: ONE driver round-trip per sequential query
        (VERDICT r04 #4 — sequential ``search()`` paid a resolve round-trip
        then a score round-trip; batch serving already amortized both).

        ``resolved_refs`` holds ObjectRefs to every set member's ``resolve``
        output (submitted by the driver immediately before this call, WITHOUT
        blocking on them). Each scorer merges the global df/expansions itself
        via :func:`_merge_ctx` — integer sums and sorted tuples, so every
        scorer derives the identical EvalContext the driver would have.
        Deadlock-free by actor FIFO: the resolve tasks were enqueued ahead of
        this call on every actor in the set, so the refs this call blocks on
        can only be pending on actors that will run them before their own
        ``resolve_score``. Returns (docs, scores, df, expanded[, meta]) — df/
        expanded let the driver refill its plan caches without another trip;
        ``with_meta`` piggybacks this scorer's local top-k metadata rows."""
        import ray

        resolved = ray.get(list(resolved_refs))
        ctx, df, expanded = _merge_ctx(reqs, resolved, n_docs, avgdl)
        docs, scores = self.score(query, reqs, ctx, k)
        meta = self.doc_meta(docs) if with_meta and docs.size else None
        return docs, scores, df, expanded, meta

    def score_meta(
        self, query: qn.Query, reqs: TermRequests, ctx: EvalContext,
        k: Optional[int],
    ):
        """score + this scorer's local top-k metadata in one round-trip (the
        with_meta single-query path paid a third doc_meta round-trip; the
        local top-k union is a superset of the global top-k, so k rows per
        scorer always cover the final table)."""
        docs, scores = self.score(query, reqs, ctx, k)
        meta = self.doc_meta(docs) if docs.size else None
        return docs, scores, meta

    def match_all_table(
        self, query: qn.Query, reqs: TermRequests, ctx: EvalContext,
        with_meta: bool = False,
    ) -> pa.Table:
        """This scorer's segments' full match set as ONE Arrow table (doc_id
        ascending) — the block the streaming corpus filter hands to Ray Data."""
        docs, scores = self.score(query, reqs, ctx, None)
        t = pa.table(
            {"doc_id": pa.array(docs, pa.int64()),
             "score": pa.array(scores, pa.float64())}
        )
        if with_meta and docs.size:
            meta = self.doc_meta(docs)
            t = t.join(meta, keys="doc_id", join_type="left outer").sort_by("doc_id")
            t = t.select(["doc_id", "conv_id", "turn_idx", "score"])
        return t

    def doc_meta(self, doc_ids: np.ndarray) -> pa.Table:
        tables = []
        for r in self.readers:
            lo, hi = r.doc_base, r.doc_base + r.doc_count
            mine = doc_ids[(doc_ids >= lo) & (doc_ids < hi)]
            if mine.size:
                tables.append(r.doc_meta(mine))
        if not tables:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(tables)


class SearchEngine:
    """Query entry point over an index directory.

    ``parallel="auto"`` uses one Ray actor per segment group when Ray is
    initialized; ``parallel=False`` scores in-process (tests / tiny indexes).
    """

    def __init__(
        self,
        index_dir: str,
        *,
        parallel: Union[bool, str] = "auto",
        actors: Optional[int] = None,
        replicas: int = 1,
        result_cache: Optional[bool] = None,
        placement: Optional[str] = "spread",
    ):
        # per-reader exact top-k result cache; None defers to LR_RESULTCACHE
        # (read HERE, in the driver, because env mutations after ray.init do
        # not reach already-running scorer actors)
        self._result_cache = (
            result_cache
            if result_cache is not None
            else os.environ.get("LR_RESULTCACHE", "1") != "0"
        )
        self.index_dir = index_dir
        with open(os.path.join(index_dir, INDEX_META_FILE)) as f:
            self.meta = json.load(f)
        from ..index.build import INDEX_FORMAT_VERSION

        if self.meta.get("version") != INDEX_FORMAT_VERSION:
            raise ValueError(
                f"index {index_dir} has format version {self.meta.get('version')}; "
                f"this engine reads version {INDEX_FORMAT_VERSION} — rebuild the index"
            )
        # open exactly the segments the committed meta records: a crashed
        # append_index may leave extra (uncommitted) segment dirs behind, and
        # those must be invisible until their commit lands
        seg_root = os.path.join(index_dir, "segments")
        self.seg_dirs = [
            os.path.join(seg_root, f"seg-{s:05d}")
            for s in range(int(self.meta["num_segments"]))
        ]
        if parallel == "auto":
            try:
                import ray

                parallel = ray.is_initialized() and len(self.seg_dirs) > 1
            except ImportError:
                parallel = False
        self.parallel = bool(parallel)
        self._actors = None
        self._local: Optional[SegmentScorer] = None
        self._num_actors = actors
        # replica sets: each set holds EVERY segment, so any set answers any
        # query — batch serving round-robins across sets (shard replication,
        # the standard QPS-scaling lever; on a cluster each set lands on
        # different nodes). replicas=1 is exactly the old single-set engine.
        self._replicas = max(1, int(replicas))
        self._sets: Optional[List[list]] = None
        self._rr = 0
        # batch-serving mode: "striped" fans a search_many batch across every
        # replica set; "single" serves each batch from one (round-robined)
        # set. calibrate() benchmark-gates this — a replica pool that loses
        # to one set under contention must fall back (VERDICT r03 #1).
        self._mode = "striped"
        self._stats_cache = None
        # driver-side term-stats cache (Lucene caches per-searcher term stats
        # the same way): (field, term) -> global df, 0 = known-absent. Filled
        # by every resolve; a query whose exact terms are all cached and that
        # needs no dictionary expansion skips the resolve round-trip entirely.
        # Valid because an open engine serves ONE commit point (same
        # assumption as _stats_cache); reopen after append/delete/compact.
        self._df_cache: Dict[Tuple[str, str], int] = {}
        # expansion memo: spec -> cross-segment sorted term tuple, exactly as
        # _merge_ctx produced it. Same commit-point validity as _df_cache;
        # lets repeat dictionary-expansion queries (prefix/fuzzy/range/…)
        # plan resolve-free like exact-term queries do (round 5).
        self._exp_cache: Dict[ExpansionSpec, tuple] = {}
        # multi-node placement (VERDICT r04 #7): "spread" asks Ray to place
        # scorer actors across nodes (SPREAD soft-spreads, so a single-node
        # cluster still schedules everything locally — same behavior in the
        # tests' 4-CPU fixture), which on a real cluster puts each replica
        # set's segment shards on different hosts for fault isolation and
        # aggregate IO bandwidth. None/"default" keeps Ray's default packing.
        if placement not in (None, "default", "spread"):
            raise ValueError(
                f"placement must be 'spread', 'default' or None, got {placement!r}"
            )
        self._placement = placement

    # ---- scorer management ----

    def _scorer_sets(self) -> List[list]:
        """All replica sets; each set covers every committed segment."""
        if not self.parallel:
            if self._local is None:
                self._local = SegmentScorer(self.seg_dirs, result_cache=self._result_cache)
            return [[self._local]]
        if self._sets is None:
            import ray

            n = self._num_actors or min(len(self.seg_dirs), 8)
            groups: List[List[str]] = [[] for _ in range(n)]
            for i, d in enumerate(self.seg_dirs):
                groups[i % n].append(d)
            Actor = ray.remote(SegmentScorer)
            live = [g for g in groups if g]
            # each scorer is a 1-CPU actor; more replica sets than the cluster
            # can schedule would leave actors PENDING and deadlock the first
            # query (same failure shape as oversubscribed join aggregators) —
            # cap to what fits
            reps = self._replicas
            if reps > 1:
                # size from actually-SCHEDULABLE headroom, not the cluster
                # total: CPUs already pinned by other actor pools (another
                # engine, join aggregators) can't host replica scorers, and
                # over-asking leaves actors PENDING / thrashing
                res = ray.available_resources()
                # available_resources OMITS zero-quantity resources: a missing
                # 'CPU' key means zero schedulable CPUs, so the default must
                # be 0 (falling back to the cluster total would un-cap reps
                # exactly when everything is busy — the PENDING deadlock)
                avail = int(res.get("CPU", 0))
                reps = max(1, min(reps, avail // len(live)))
            opts = {"num_cpus": 1}
            if self._placement == "spread":
                # soft spread: prefer one scorer per node (segment shards read
                # independent data, so spreading buys aggregate disk/page-cache
                # bandwidth and keeps a node loss to one shard per set); falls
                # back to co-location when the cluster is a single node
                opts["scheduling_strategy"] = "SPREAD"
            self._sets = [
                [Actor.options(**opts).remote(g, True, self._result_cache) for g in live]
                for _ in range(reps)
            ]
            self._actors = [a for s in self._sets for a in s]
        return self._sets

    def _scorers(self):
        """One replica set, round-robined per call (any set answers fully)."""
        sets = self._scorer_sets()
        s = sets[self._rr % len(sets)]
        self._rr += 1
        return s

    def _call(self, method: str, per_scorer_args) -> list:
        scorers = self._scorers()
        if not self.parallel:
            return [getattr(scorers[0], method)(*per_scorer_args[0])]
        import ray

        return ray.get(
            [getattr(a, method).remote(*args) for a, args in zip(scorers, per_scorer_args)]
        )

    # ---- stats ----

    def _global_stats(self) -> dict:
        if self._stats_cache is None:
            results = self._call(
                "local_stats", [() for _ in self._scorers()]
            )
            n = sum(r["n_docs"] for r in results)
            total_dl: Dict[str, int] = {}
            for r in results:
                for f, v in r["total_dl"].items():
                    total_dl[f] = total_dl.get(f, 0) + v
            self._stats_cache = {
                "n_docs": n,
                "avgdl": {f: (v / n if n else 0.0) for f, v in total_dl.items()},
            }
        return self._stats_cache

    # ---- public API ----

    def plan(self, query: QueryLike) -> Tuple[qn.Query, TermRequests, EvalContext]:
        q = parse(query) if isinstance(query, str) else query
        reqs = collect_term_requests(q)
        hit = self._plan_from_cache(q, reqs)
        if hit is not None:
            return hit
        resolved_list = self._call("resolve", [(reqs,) for _ in self._scorers()])
        return self._merge_resolved(q, reqs, resolved_list)

    def _plan_from_cache(
        self, q: qn.Query, reqs: TermRequests
    ) -> Optional[Tuple[qn.Query, TermRequests, EvalContext]]:
        """Resolve-free plan when every exact term's df is cached and every
        dictionary expansion (+ its terms' dfs) is memoized. Bit-identical to
        the resolved plan: the merged df map holds only found terms, so cached
        zeros are dropped; expansion tuples are stored exactly as _merge_ctx
        built them (cross-segment sorted), and expansion terms always exist in
        the dictionary so their cached dfs are all positive."""
        if self._stats_cache is None:
            return None
        expanded: Dict[ExpansionSpec, tuple] = {}
        for spec in reqs.expansions:
            terms = self._exp_cache.get(spec)
            if terms is None:
                return None
            expanded[spec] = terms
        c = self._df_cache
        if any(ft not in c for ft in reqs.exact):
            return None
        needed_exp = [
            (spec.field, t) for spec, terms in expanded.items() for t in terms
        ]
        if any(ft not in c for ft in needed_exp):
            return None
        df = {ft: c[ft] for ft in reqs.exact if c[ft]}
        for ft in needed_exp:
            if c[ft]:
                df[ft] = c[ft]
        stats = self._global_stats()
        ctx = EvalContext(
            n_docs=stats["n_docs"], avgdl=stats["avgdl"], df=df,
            expanded=expanded,
        )
        return q, reqs, ctx

    def plan_many(
        self, queries: Sequence[QueryLike]
    ) -> List[Tuple[qn.Query, TermRequests, EvalContext]]:
        """Plan a batch with ONE driver round-trip: all (query, scorer) resolve
        futures in flight at once instead of a blocking ray.get per query."""
        parsed = [parse(q) if isinstance(q, str) else q for q in queries]
        reqs_list = [collect_term_requests(q) for q in parsed]
        out: List[Optional[tuple]] = [
            self._plan_from_cache(q, reqs) for q, reqs in zip(parsed, reqs_list)
        ]
        need = [i for i, p in enumerate(out) if p is None]
        if not need:
            return out  # type: ignore[return-value]
        sets = self._scorer_sets()
        if not self.parallel:
            per_query = [[sets[0][0].resolve(reqs_list[i])] for i in need]
        else:
            import ray

            # spread query i's resolve fan-out over replica set i % R
            futs = [
                a.resolve.remote(reqs_list[i])
                for j, i in enumerate(need)
                for a in sets[j % len(sets)]
            ]
            flat = ray.get(futs)
            ns = len(sets[0])
            per_query = [flat[j * ns:(j + 1) * ns] for j in range(len(need))]
        for j, i in enumerate(need):
            out[i] = self._merge_resolved(parsed[i], reqs_list[i], per_query[j])
        return out  # type: ignore[return-value]

    def _merge_resolved(
        self, q: qn.Query, reqs: TermRequests, resolved_list: list
    ) -> Tuple[qn.Query, TermRequests, EvalContext]:
        stats = self._global_stats()
        ctx, df, expanded = _merge_ctx(
            reqs, resolved_list, stats["n_docs"], stats["avgdl"]
        )
        self._fill_plan_caches(reqs, df, expanded)
        return q, reqs, ctx

    def _fill_plan_caches(
        self,
        reqs: TermRequests,
        df: Dict[Tuple[str, str], int],
        expanded: Dict[ExpansionSpec, tuple],
    ) -> None:
        for key, v in df.items():
            self._df_cache[key] = v
        for ft in reqs.exact:
            self._df_cache.setdefault(ft, 0)  # known-absent
        for spec, terms in expanded.items():
            self._exp_cache[spec] = terms

    def search(
        self, query: QueryLike, k: int = 10, *, with_meta: bool = True
    ) -> pa.Table:
        """Top-k as an Arrow table (doc_id, conv_id, turn_idx, score).

        Driver round-trips per query (VERDICT r04 #4): plan-from-cache hits
        take ONE (score_meta / score); cache misses on a warm parallel engine
        take ONE folded resolve_score trip (resolve futures submitted without
        blocking, each scorer merges global stats itself); only the very
        first query on a cold engine pays the classic stats+resolve+score
        sequence."""
        q = parse(query) if isinstance(query, str) else query
        reqs = collect_term_requests(q)
        hit = self._plan_from_cache(q, reqs)
        if hit is None and self.parallel and self._stats_cache is not None:
            return self._search_folded(q, reqs, k, with_meta)
        if hit is not None:
            q, reqs, ctx = hit
        else:
            q, reqs, ctx = self.plan(q)
        if with_meta:
            results = self._call(
                "score_meta", [(q, reqs, ctx, k) for _ in self._scorers()]
            )
            metas = [r[2] for r in results if r[2] is not None]
        else:
            results = self._call(
                "score", [(q, reqs, ctx, k) for _ in self._scorers()]
            )
            metas = None
        docs = np.concatenate([r[0] for r in results])
        scores = np.concatenate([r[1] for r in results])
        docs, scores = top_k(docs, scores, k)
        return self._to_table(docs, scores, with_meta, metas=metas)

    def _search_folded(
        self, q: qn.Query, reqs: TermRequests, k: int, with_meta: bool
    ) -> pa.Table:
        """One-round-trip resolve+score (+meta) over one replica set."""
        import ray

        scorers = self._scorers()
        stats = self._global_stats()
        rfuts = [a.resolve.remote(reqs) for a in scorers]
        outs = ray.get(
            [
                a.resolve_score.remote(
                    q, reqs, rfuts, k, stats["n_docs"], stats["avgdl"], with_meta
                )
                for a in scorers
            ]
        )
        # every scorer merged the same integer sums; refill the driver's plan
        # caches from the first so the NEXT repeat plans resolve-free
        self._fill_plan_caches(reqs, outs[0][2], outs[0][3])
        docs = np.concatenate([o[0] for o in outs])
        scores = np.concatenate([o[1] for o in outs])
        docs, scores = top_k(docs, scores, k)
        metas = [o[4] for o in outs if o[4] is not None] if with_meta else None
        return self._to_table(docs, scores, with_meta, metas=metas)

    def match_all(self, query: QueryLike, *, with_meta: bool = False) -> pa.Table:
        """Corpus filtering: EVERY matching doc with its BM25 score, sorted by
        doc_id — the 'keep all turns matching X' curation primitive (no top-k)."""
        q, reqs, ctx = self.plan(query)
        results = self._call("score", [(q, reqs, ctx, None) for _ in self._scorers()])
        docs = np.concatenate([r[0] for r in results])
        scores = np.concatenate([r[1] for r in results])
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        if not with_meta:
            return pa.table(
                {"doc_id": pa.array(docs, pa.int64()), "score": pa.array(scores)}
            )
        return self._to_table(docs, scores, True)

    def warm(self, query: QueryLike = "the", k: int = 10) -> None:
        """Fan one cheap query to EVERY scorer across ALL replica sets so
        segment metadata, norms and caches load before serving traffic — a
        plain ``search()`` warms only the one set the round-robin picks."""
        q, reqs, ctx = self.plan(query)
        sets = self._scorer_sets()
        if not self.parallel:
            sets[0][0].score(q, reqs, ctx, k)
            return
        import ray

        ray.get([a.score.remote(q, reqs, ctx, k) for s in sets for a in s])

    def warm_many(self, queries: Sequence[QueryLike], k: int = 10) -> None:
        """Warm EVERY replica set on a whole batch's vocabulary: plan the batch
        once, then fan the full plan list to every scorer in every set.
        ``warm()`` with one term leaves the other sets' postings cold on the
        batch's actual terms — the first striped pass then pays R-1 sets of
        cold decodes (VERDICT r03 #1)."""
        plans = self.plan_many(queries)
        items = [(q, reqs, ctx, k) for (q, reqs, ctx) in plans]
        sets = self._scorer_sets()
        if not self.parallel:
            sets[0][0].score_many(items)
            return
        import ray

        ray.get([a.score_many.remote(items) for s in sets for a in s])

    def calibrate(self, queries: Sequence[QueryLike], k: int = 10,
                  passes: int = 2) -> str:
        """Benchmark-gate batch striping: time ``queries`` striped across all
        replica sets vs served by a single set (best-of-``passes`` each,
        interleaved) and keep the winner for subsequent ``search_many`` calls.
        Call after :meth:`warm_many`; answers are bit-identical either way
        (both modes score every segment), only the fan-out differs."""
        import time as _time

        sets = self._scorer_sets()
        if not self.parallel or len(sets) == 1:
            self._mode = "single"
            return self._mode
        best = {"striped": float("inf"), "single": float("inf")}
        for _ in range(max(1, passes)):
            for mode in ("striped", "single"):
                self._mode = mode
                t0 = _time.perf_counter()
                self.search_many(queries, k)
                best[mode] = min(best[mode], _time.perf_counter() - t0)
        self._mode = "striped" if best["striped"] <= best["single"] else "single"
        return self._mode

    def match_all_stream(self, query: QueryLike, *, with_meta: bool = False):
        """Corpus filtering as a STREAMING ``ray.data.Dataset``: each scorer
        materializes its segments' matches as one Arrow table in the object
        store and the result is assembled with ``from_arrow_refs`` — the match
        set never lands on the driver. This is the 100-TB curation shape: feed
        the returned Dataset straight into ``map_batches`` / joins /
        ``write_parquet`` (``match_all`` gathers, so it is for small results)."""
        import ray.data as rd

        q, reqs, ctx = self.plan(query)
        if not self.parallel:
            return rd.from_arrow(
                self._scorers()[0].match_all_table(q, reqs, ctx, with_meta)
            )
        refs = [
            a.match_all_table.remote(q, reqs, ctx, with_meta)
            for a in self._scorers()
        ]
        return rd.from_arrow_refs(refs)

    def suggest(self, query: QueryLike, k: int = 10, *, with_meta: bool = True) -> pa.Table:
        """Search-as-you-type: rewrite the last positional Term into
        ``Term OR Prefix`` (the reference's mapLastTerm use case,
        docs/index.md:67-96) and search the expanded query."""
        q = parse(query) if isinstance(query, str) else query
        expanded = q.map_last_term(
            lambda t: qn.Or(qn.Term(t.value), qn.Prefix(t.value))
        )
        return self.search(expanded, k, with_meta=with_meta)

    def search_many(
        self, queries: Sequence[QueryLike], k: int = 10
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Batch scoring: one batched resolve round-trip + one score round-trip
        for the whole query set (not a driver round-trip per query); with
        ``replicas>1`` the batch is striped across replica sets so the whole
        pool scores concurrently."""
        plans = self.plan_many(queries)
        sets = self._scorer_sets()
        if not self.parallel or len(sets) == 1 or self._mode == "single":
            scorers = sets[0]
            items = [(q, reqs, ctx, k) for (q, reqs, ctx) in plans]
            results = self._call("score_many", [(items,) for _ in scorers])
            out = []
            for qi in range(len(plans)):
                docs = np.concatenate([r[qi][0] for r in results])
                scores = np.concatenate([r[qi][1] for r in results])
                out.append(top_k(docs, scores, k))
            return out
        import ray

        nr = len(sets)
        futs, owners = [], []
        for r, s in enumerate(sets):
            sub = plans[r::nr]  # stripe r
            if not sub:
                continue
            items = [(q, reqs, ctx, k) for (q, reqs, ctx) in sub]
            for a in s:
                futs.append(a.score_many.remote(items))
                owners.append(r)
        flat = ray.get(futs)
        by_set: Dict[int, list] = {}
        for r, res in zip(owners, flat):
            by_set.setdefault(r, []).append(res)
        out: List[Optional[tuple]] = [None] * len(plans)
        for r, per_actor in by_set.items():
            for li in range(len(per_actor[0])):
                docs = np.concatenate([res[li][0] for res in per_actor])
                scores = np.concatenate([res[li][1] for res in per_actor])
                out[r + li * nr] = top_k(docs, scores, k)
        return out

    def _to_table(
        self, docs: np.ndarray, scores: np.ndarray, with_meta: bool,
        metas: Optional[List[pa.Table]] = None,
    ):
        base = pa.table(
            {"doc_id": pa.array(docs, pa.int64()), "score": pa.array(scores)}
        )
        if not with_meta:
            return base
        if docs.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "score": pa.array([], pa.float64()),
                }
            )
        if metas is None:
            metas = self._call("doc_meta", [(docs,) for _ in self._scorers()])
        meta = pa.concat_tables(metas)
        joined = base.join(meta, keys="doc_id", join_type="left outer")
        order = pa.compute.sort_indices(
            joined,
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        )
        joined = joined.take(order)
        return joined.select(["doc_id", "conv_id", "turn_idx", "score"])

    def shutdown(self) -> None:
        if self._actors:
            import ray

            for a in self._actors:
                ray.kill(a)
            self._actors = None
            self._sets = None
