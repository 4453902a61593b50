"""ANSI-SQL (DuckDB) oracle builders mirroring the engine's semantics exactly.

The driver's correctness gate runs each ``queries()`` Ray pipeline AND the
corresponding SQL from ``oracle_sql()`` over the same parquet tables, then
hash-compares values. Everything here is therefore written to be *bit-compatible*
with the engine:

* same analyzer expression (:data:`lucille_ray.analysis.SQL_TOKENS_EXPR`)
* same BM25 (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5))) in float64
* same boolean semantics (MUST/SHOULD/MUST_NOT, minimum-match counting)
* phrase/proximity frequencies as count-of-start-positions via token-position
  self-joins (never regex scans, whose non-overlapping counting diverges)
* classification thresholds in integer arithmetic (no float boundaries)
* scores rounded to 4 decimals AFTER ranking, identical column names both sides
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .analysis import SQL_TOKENS_EXPR
from .transcripts import TRANSCRIPTS_SQL_CTE

K1 = "1.2"
K1P1 = "2.2"
ONE_MINUS_B = "0.25"
B = "0.75"


def tokens_expr(col: str) -> str:
    return SQL_TOKENS_EXPR.format(col=col)


def field_ctes(fields: Sequence[str] = ("text",)) -> str:
    """Token/tf/df/dl/stat CTE block per indexed field, over `transcripts`."""
    parts = []
    for f in fields:
        te = tokens_expr(f)
        parts.append(
            f"""arr_{f} AS (
  SELECT doc_id, {te} AS arr FROM transcripts
),
tok_{f} AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) - 1 AS pos
  FROM arr_{f}
),
tf_{f} AS (SELECT doc_id, term, count(*) AS tf FROM tok_{f} GROUP BY 1, 2),
df_{f} AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok_{f} GROUP BY 1),
dl_{f} AS (SELECT doc_id, len(arr) AS dl FROM arr_{f}),
st_{f} AS (
  SELECT (SELECT count(*) FROM transcripts) AS n,
         (SELECT sum(dl) FROM dl_{f}) * 1.0 / (SELECT count(*) FROM transcripts) AS avgdl
)"""
        )
    return ",\n".join(parts)


def _idf(field: str) -> str:
    return f"ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))"


def _tfnorm(tf_expr: str) -> str:
    return (
        f"({tf_expr} * {K1P1}) / "
        f"({tf_expr} + {K1} * ({ONE_MINUS_B} + {B} * dl.dl / st.avgdl))"
    )


def term_clause(field: str, term: str, boost: float = 1.0) -> str:
    """(doc_id, s) rows for one exact term."""
    b = f" * {boost!r}" if boost != 1.0 else ""
    return f"""SELECT tf.doc_id, {_idf(field)} * {_tfnorm('tf.tf')}{b} AS s
FROM tf_{field} tf
JOIN df_{field} df USING (term)
JOIN dl_{field} dl ON dl.doc_id = tf.doc_id
CROSS JOIN st_{field} st
WHERE tf.term = '{term}'"""


def expansion_clause(field: str, term_predicate: str, boost: float = 1.0) -> str:
    """(doc_id, s) rows summing per-term BM25 over all dictionary matches —
    identical to the engine's multi-term expansion scoring."""
    b = f" * {boost!r}" if boost != 1.0 else ""
    return f"""SELECT tf.doc_id, sum({_idf(field)} * {_tfnorm('tf.tf')}){b} AS s
FROM tf_{field} tf
JOIN df_{field} df USING (term)
JOIN dl_{field} dl ON dl.doc_id = tf.doc_id
CROSS JOIN st_{field} st
WHERE {term_predicate}
GROUP BY tf.doc_id"""


def phrase_clause(field: str, terms: Sequence[str], boost: float = 1.0) -> str:
    """Exact-adjacency phrase: freq = count of start positions; idf = sum of the
    constituent term idfs (engine contract)."""
    assert len(terms) >= 2
    joins, conds = [], []
    for i, t in enumerate(terms):
        joins.append(f"tok_{field} p{i}")
        conds.append(f"p{i}.term = '{t}'")
        if i:
            conds.append(f"p{i}.doc_id = p0.doc_id")
            conds.append(f"p{i}.pos = p0.pos + {i}")
    idf_sum = " + ".join(
        f"(SELECT ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) "
        f"FROM df_{field} df CROSS JOIN st_{field} st WHERE df.term = '{t}')"
        for t in terms
    )
    b = f" * {boost!r}" if boost != 1.0 else ""
    return f"""SELECT pf.doc_id, ({idf_sum}) * {_tfnorm('pf.freq')}{b} AS s
FROM (
  SELECT p0.doc_id, count(*) AS freq
  FROM {', '.join(joins)}
  WHERE {' AND '.join(conds)}
  GROUP BY p0.doc_id
) pf
JOIN dl_{field} dl ON dl.doc_id = pf.doc_id
CROSS JOIN st_{field} st"""


def proximity_clause(
    field: str, terms: Sequence[str], gap: int, boost: float = 1.0
) -> str:
    """N-term ordered proximity (each consecutive gap <= ``gap``): freq = count of
    DISTINCT start positions from which a full chain exists — exactly the
    engine's backward-reachability rule, expressed as nested EXISTS chains."""
    assert len(terms) >= 2
    b = f" * {boost!r}" if boost != 1.0 else ""
    idf_sum = " + ".join(
        f"(SELECT ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) "
        f"FROM df_{field} df CROSS JOIN st_{field} st WHERE df.term = '{t}')"
        for t in terms
    )
    # innermost-out EXISTS chain: p_{i+1} strictly after p_i, within gap+1
    chain = ""
    for i in range(len(terms) - 1, 0, -1):
        inner = chain and f" AND {chain}"
        chain = (
            f"EXISTS (SELECT 1 FROM tok_{field} p{i} "
            f"WHERE p{i}.doc_id = p0.doc_id AND p{i}.term = '{terms[i]}' "
            f"AND p{i}.pos > p{i-1}.pos AND p{i}.pos <= p{i-1}.pos + {gap + 1}"
            f"{inner})"
        )
    return f"""SELECT pf.doc_id, ({idf_sum}) * {_tfnorm('pf.freq')}{b} AS s
FROM (
  SELECT p0.doc_id, count(DISTINCT p0.pos) AS freq
  FROM tok_{field} p0
  WHERE p0.term = '{terms[0]}' AND {chain}
  GROUP BY p0.doc_id
) pf
JOIN dl_{field} dl ON dl.doc_id = pf.doc_id
CROSS JOIN st_{field} st"""


def proximity2_clause(field: str, t1: str, t2: str, gap: int, boost: float = 1.0) -> str:
    return proximity_clause(field, [t1, t2], gap, boost)


def bool_query(
    clauses: Sequence[str],
    *,
    mode: str = "or",  # or | and | minmatch
    min_match: int = 1,
    exclude: Sequence[str] = (),
    k: Optional[int] = 10,
) -> str:
    """Combine (doc_id, s) clause subqueries with Lucene boolean semantics and emit
    the final top-k ``(doc_id, score_r)`` (``k=None`` -> all matches)."""
    unioned = "\nUNION ALL\n".join(f"SELECT doc_id, s FROM ({c})" for c in clauses)
    having = {
        "or": "TRUE",
        "and": f"count(*) = {len(clauses)}",
        "minmatch": f"count(*) >= {min_match}",
    }[mode]
    not_filter = ""
    if exclude:
        ex = "\nUNION ALL\n".join(f"SELECT doc_id FROM ({c})" for c in exclude)
        not_filter = f"AND agg.doc_id NOT IN (SELECT doc_id FROM ({ex}))"
    limit = f"LIMIT {k}" if k is not None else ""
    return f"""SELECT agg.doc_id, round(agg.score, 4) AS score_r
FROM (
  SELECT doc_id, sum(s) AS score, count(*) AS cnt
  FROM ({unioned})
  GROUP BY doc_id
  HAVING {having}
) agg
WHERE TRUE {not_filter}
ORDER BY agg.score DESC, agg.doc_id ASC
{limit}"""


def search_sql(
    clauses: Sequence[str],
    *,
    fields: Sequence[str] = ("text",),
    mode: str = "or",
    min_match: int = 1,
    exclude: Sequence[str] = (),
    k: Optional[int] = 10,
    transcripts_where: Optional[str] = None,
    by_turn: bool = False,
) -> str:
    """Full statement: transcripts CTE + per-field stats + boolean combination.

    ``transcripts_where`` restricts the corpus itself (a predicate over the
    ``documents`` view) — BM25 stats then describe the restricted corpus, the
    oracle twin of an index whose tombstones were purged at compaction.
    ``by_turn`` emits ``(conv_id, turn_idx, score_r)`` instead of doc_id —
    the comparison key for appended indexes, whose doc ids are arrival-ordered
    rather than global-rank-ordered."""
    cte = TRANSCRIPTS_SQL_CTE
    if transcripts_where:
        cte = cte.replace(
            "FROM documents", f"FROM documents\n  WHERE {transcripts_where}"
        )
    body = bool_query(clauses, mode=mode, min_match=min_match, exclude=exclude, k=k)
    if by_turn:
        return (
            f"WITH {cte},\n{field_ctes(fields)},\nhits AS (\n{body}\n)\n"
            "SELECT t.conv_id, t.turn_idx, h.score_r\n"
            "FROM hits h JOIN transcripts t USING (doc_id)"
        )
    return f"WITH {cte},\n{field_ctes(fields)}\n" + body


# ---------------------------------------------------------------------------
# MinHash / SimHash twins (exact integer hash contract — see ops/dedup.py)
# ---------------------------------------------------------------------------


def _fold_expr(operands: Sequence[str], c: int, p: int) -> str:
    """cur = (cur*C + x) % P left fold with init 0 (first step reduces to x%P...
    operands here are already < P, so the first step is the bare operand)."""
    expr = operands[0]
    for x in operands[1:]:
        expr = f"(({expr}) * {c} + {x}) % {p}"
    return expr


def _minhash_ctes(
    num_perm: int,
    shingle_k: int,
    bands: int,
    seed: int,
    table: str,
    text_col: str,
    id_col: str,
) -> str:
    """Shared CTE block ending in ``sigf`` (doc_id, i, sv) and ``buckets``
    (doc_id, band, bucket) — the exact twin of ops.dedup.MinHasher."""
    from .ops.dedup import FOLD_C, P31, minhash_params

    a, b = minhash_params(num_perm, seed)
    perm_rows = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm)
    )
    r = num_perm // bands
    k = shingle_k
    te = tokens_expr(text_col)
    win = _fold_expr([f"us[i + {j}]" for j in range(k)], FOLD_C, P31)
    short_cases = "\n".join(
        f"    WHEN n = {m} THEN [{_fold_expr([f'us[{j + 1}]' for j in range(m)], FOLD_C, P31)}]"
        for m in range(k - 1, 0, -1)
    )
    bucket_fold = _fold_expr([f"ss[{j + 1}]" for j in range(r)], FOLD_C, P31)
    return f"""tok AS (
  SELECT {id_col} AS doc_id, {te} AS toks FROM {table}
),
u AS (
  SELECT doc_id,
         list_transform(toks, t -> CAST(md5_number_lower(t) % {P31} AS BIGINT)) AS us,
         len(toks) AS n
  FROM tok
),
sh AS (
  SELECT doc_id,
    CASE WHEN n >= {k} THEN list_transform(range(1, n - {k} + 2), i -> {win})
{short_cases}
    ELSE [] END AS shs
  FROM u
),
shing AS (SELECT doc_id, unnest(shs) AS s FROM sh),
perms(i, a, b) AS (VALUES {perm_rows}),
sig AS (
  SELECT t.doc_id, p.i, min((p.a * t.s + p.b) % {P31}) AS sv
  FROM shing t CROSS JOIN perms p
  GROUP BY t.doc_id, p.i
),
sigf AS (
  SELECT d.doc_id, p.i, coalesce(s.sv, {P31}) AS sv
  FROM (SELECT {id_col} AS doc_id FROM {table}) d
  CROSS JOIN perms p
  LEFT JOIN sig s ON s.doc_id = d.doc_id AND s.i = p.i
),
bandagg AS (
  SELECT doc_id, i // {r} AS band, list(sv ORDER BY i) AS ss
  FROM sigf GROUP BY doc_id, i // {r}
),
buckets AS (
  SELECT doc_id, band, {bucket_fold} AS bucket FROM bandagg
)"""


def minhash_sql(
    num_perm: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    seed: int = 42,
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """SQL twin of ops.dedup.MinHasher: (doc_id, band, bucket) rows, bit-exact.

    Reuses the identical seeded permutation constants (inlined as VALUES) and
    the identical fold/universal-hash arithmetic mod 2^31-1 — every product
    stays below 2^62, exact in DuckDB BIGINT and numpy uint64 alike."""
    ctes = _minhash_ctes(num_perm, shingle_k, bands, seed, table, text_col, id_col)
    return f"""WITH {ctes}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(band AS INT) AS band,
       CAST(bucket AS BIGINT) AS bucket
FROM buckets"""


def minhash_pairs_sql(
    threshold: float = 0.5,
    num_perm: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    seed: int = 42,
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """SQL twin of ops.dedup.minhash_dedup: near-dup pairs (a < b) whose
    signature agreement >= threshold, surfaced by any shared LSH bucket.
    Agreement is a multiple of 1/num_perm, so the float compare is exact when
    the threshold is too (e.g. 0.5 with 64 perms)."""
    ctes = _minhash_ctes(num_perm, shingle_k, bands, seed, table, text_col, id_col)
    return f"""WITH {ctes},
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
est AS (
  SELECT c.a, c.b,
         sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) / {float(num_perm)} AS ej
  FROM cand c
  JOIN sigf sa ON sa.doc_id = c.a
  JOIN sigf sb ON sb.doc_id = c.b AND sb.i = sa.i
  GROUP BY c.a, c.b
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(ej AS DOUBLE) AS est_jaccard
FROM est WHERE ej >= {threshold!r}"""


def minhash_verified_sql(
    est_threshold: float = 0.3,
    jaccard_threshold: float = 0.5,
    num_perm: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    seed: int = 42,
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """SQL twin of ops.dedup.minhash_dedup_verified: LSH candidates (estimated
    agreement >= est_threshold) verified by EXACT distinct-shingle Jaccard.
    Intersection/union sizes are integers and the division is the same IEEE
    operation on both sides; both-empty docs define jaccard = 1.0."""
    ctes = _minhash_ctes(num_perm, shingle_k, bands, seed, table, text_col, id_col)
    li = "len(list_intersect(sa.ss, sb.ss))"
    return f"""WITH {ctes},
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
est AS (
  SELECT c.a, c.b,
         sum(CASE WHEN p1.sv = p2.sv THEN 1 ELSE 0 END) / {float(num_perm)} AS ej
  FROM cand c
  JOIN sigf p1 ON p1.doc_id = c.a
  JOIN sigf p2 ON p2.doc_id = c.b AND p2.i = p1.i
  GROUP BY c.a, c.b
),
keep AS (SELECT a, b FROM est WHERE ej >= {est_threshold!r}),
shd AS (SELECT doc_id, list_distinct(shs) AS ss FROM sh),
verified AS (
  SELECT k.a, k.b,
         CASE WHEN len(sa.ss) = 0 AND len(sb.ss) = 0 THEN 1.0
              ELSE CAST({li} AS DOUBLE) / (len(sa.ss) + len(sb.ss) - {li})
         END AS jaccard
  FROM keep k
  JOIN shd sa ON sa.doc_id = k.a
  JOIN shd sb ON sb.doc_id = k.b
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(jaccard AS DOUBLE) AS jaccard
FROM verified WHERE jaccard >= {jaccard_threshold!r}"""


def simhash_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """SQL twin of ops.dedup.SimHasher (32-bit, md5_number_lower token hashes)."""
    from .ops.dedup import SIMHASH_BITS

    te = tokens_expr(text_col)
    return f"""WITH tok AS (
  SELECT {id_col} AS doc_id, unnest({te}) AS tk FROM {table}
),
bits AS (
  SELECT doc_id, ks.k AS k,
         sum(CASE WHEN (md5_number_lower(tk) >> ks.k) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tok CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS k) ks
  GROUP BY doc_id, ks.k
),
sh AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT CAST(d.{id_col} AS BIGINT) AS doc_id,
       CAST(coalesce(sh.simhash, 0) AS BIGINT) AS simhash
FROM {table} d LEFT JOIN sh ON sh.doc_id = d.{id_col}"""
