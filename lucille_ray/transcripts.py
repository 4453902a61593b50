"""The transcripts table: schema, deterministic derivation from the shared
``documents`` test table, and a scalable synthetic generator.

Schema (BASELINE.json ``input_hint``)::

    conv_id: string, turn_idx: int32, role: string, text: string, tool: string,
    ts: timestamp[us]

Two deterministic sources:

* :func:`derive_from_documents` — maps the driver-provided ``documents`` parquet into
  transcripts 1:1 (one turn per document, 8 turns per conversation). The derivation is
  intentionally expressible in ANSI SQL (:data:`TRANSCRIPTS_SQL_CTE`) so the DuckDB
  correctness oracle can reconstruct the identical table from the same parquet.
* :func:`generate` — a seeded generator per FIXTURES.md §2 (Zipf vocabulary, planted
  collocations / prefix families / rare markers) used by tests and the benchmark at
  scales the tiny shared tables don't reach.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TURNS_PER_CONV = 8
_BASE_TS_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

#: SQL CTE body reconstructing the derived transcripts from the `documents` view.
#: MUST stay in lock-step with derive_batch() below — both sides are hashed against
#: each other by the driver's correctness gate.
TRANSCRIPTS_SQL_CTE = """
transcripts AS (
  SELECT
    'conv-' || lpad(CAST(doc_id // 8 AS VARCHAR), 8, '0') AS conv_id,
    CAST(doc_id % 8 AS INTEGER) AS turn_idx,
    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
    text,
    CASE WHEN doc_id % 8 IN (3, 6)
         THEN CASE doc_id % 3 WHEN 0 THEN 'search' WHEN 1 THEN 'code' ELSE 'browse' END
         ELSE 'none' END AS tool,
    TIMESTAMP '2025-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS ts,
    doc_id
  FROM documents
)
""".strip()


def derive_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> transcripts rows; vectorized, Arrow in/out.

    Mirrors :data:`TRANSCRIPTS_SQL_CTE` exactly (same conv grouping, roles, tools,
    timestamps). ``doc_id`` is retained as a convenience column equal to the global
    (conv_id, turn_idx) rank — the engine re-derives it independently.
    """
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    conv_num = doc_id // TURNS_PER_CONV
    conv_id = pa.array([f"conv-{c:08d}" for c in conv_num], pa.string())
    turn_idx = pa.array((doc_id % TURNS_PER_CONV).astype(np.int32))
    role = pc.if_else(
        pa.array(doc_id % 2 == 0), pa.scalar("user"), pa.scalar("assistant")
    )
    mod8 = doc_id % TURNS_PER_CONV
    is_tool = (mod8 == 3) | (mod8 == 6)
    mod3 = doc_id % 3
    tool_kind = np.where(mod3 == 0, "search", np.where(mod3 == 1, "code", "browse"))
    tool = pa.array(np.where(is_tool, tool_kind, "none"))
    ts = pa.array(_BASE_TS_US + doc_id * 1_000_000, pa.timestamp("us"))
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": batch["text"],
            "tool": tool,
            "ts": ts,
            "doc_id": pa.array(doc_id),
        }
    )


def derive_from_documents(sf_dir: str, *, keep_doc_id: bool = False):
    """Read ``{sf_dir}/documents.parquet`` -> transcripts Dataset (lazy, streaming)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ds = ds.map_batches(derive_batch, batch_format="pyarrow")
    if not keep_doc_id:
        ds = ds.select_columns([f.name for f in TRANSCRIPT_SCHEMA])
    return ds


# ---------------------------------------------------------------------------
# Synthetic generator (FIXTURES.md §2) — seeded, vectorized, multi-file output
# ---------------------------------------------------------------------------

_BASE_VOCAB = [
    # data-engineering core (overlaps the shared documents vocabulary)
    "data", "table", "row", "column", "batch", "query", "join", "hash", "scan",
    "filter", "merge", "sort", "group", "agg", "window", "stream", "vector",
    "key", "value", "part", "order", "line", "customer", "small", "big", "fast",
    "slow", "the", "a", "spark",
    # prefix families (prefix / wildcard / fuzzy probes)
    "deploy", "deployed", "deployment", "deploys", "jump", "jumps", "jumping",
    "jumped", "test", "tests", "testing", "tested", "cat", "cats", "catch",
    # filler
    "pipeline", "cluster", "worker", "driver", "shuffle", "block", "object",
    "store", "actor", "task", "node", "memory", "disk", "spill", "retry",
    "error", "timeout", "commit", "index", "segment", "posting", "score",
    "rank", "search", "token", "phrase", "parser", "engine", "result",
]

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("none", "bash", "search", "browser", "editor", "python")

RARE_MARKER = "xylophone42"  # planted in known turns for exact-hit assertions
COLLOCATION = ("lazy", "evaluation")  # planted adjacent pair for phrase tests


def generate(
    num_turns: int,
    out_dir: str,
    *,
    seed: int = 42,
    num_files: int = 8,
    mean_turn_tokens: int = 24,
    zipf_s: float = 1.1,
) -> str:
    """Write a deterministic synthetic transcripts dataset to ``out_dir``.

    Zipf-distributed vocabulary draws (hot terms exercise skew salting), planted
    collocations for phrase/proximity queries, a rare marker term every 997th turn,
    conversations of TURNS_PER_CONV turns, multiple parquet files for parallel read.
    """
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir  # deterministic: same args -> same data; treat as cache
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array(_BASE_VOCAB)
    V = len(vocab)
    ranks = np.arange(1, V + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()

    per_file = int(np.ceil(num_turns / num_files))
    doc0 = 0
    for fidx in range(num_files):
        n = min(per_file, num_turns - doc0)
        if n <= 0:
            break
        doc_id = np.arange(doc0, doc0 + n, dtype=np.int64)
        lens = np.maximum(3, rng.poisson(mean_turn_tokens, n))
        total = int(lens.sum())
        draws = rng.choice(V, size=total, p=probs)
        words = vocab[draws]
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        texts = []
        for i in range(n):
            toks = list(words[offsets[i]: offsets[i + 1]])
            d = int(doc_id[i])
            if d % 97 == 0 and len(toks) >= 2:  # collocation for phrase tests
                toks[1:1] = list(COLLOCATION)
            if d % 997 == 0:  # rare marker
                toks.append(RARE_MARKER)
            texts.append(" ".join(toks))
        conv_num = doc_id // TURNS_PER_CONV
        turn_idx = (doc_id % TURNS_PER_CONV).astype(np.int32)
        role = np.array(ROLES)[
            np.where(turn_idx % 2 == 0, 0, np.where(doc_id % 11 == 5, 3, 1))
        ]
        tool = np.where(
            role == "tool", np.array(TOOLS)[1 + (doc_id % 5).astype(np.int64)], "none"
        )
        table = pa.table(
            {
                "conv_id": pa.array([f"conv-{c:010d}" for c in conv_num]),
                "turn_idx": pa.array(turn_idx),
                "role": pa.array(role.astype(str)),
                "text": pa.array(texts),
                "tool": pa.array(tool.astype(str)),
                "ts": pa.array(_BASE_TS_US + doc_id * 1_000_000, pa.timestamp("us")),
            }
        )
        pq.write_table(table, os.path.join(out_dir, f"part-{fidx:05d}.parquet"))
        doc0 += n
    return out_dir


def read_transcripts(path: str):
    """Lazy Ray Dataset over a transcripts parquet directory/file.

    The source path is remembered on the dataset so column-pruned side scans
    (build's conv-offsets pass) can re-read just what they need:
    ``select_columns`` does NOT push into ReadParquet in this Ray version, so
    a narrow re-read with ``columns=`` is ~2.5x cheaper than projecting the
    full-width stream.

    INVARIANT (ADVICE r04): ``_lucille_parquet_src`` asserts the dataset is
    the UNTRANSFORMED read of exactly ``path`` whose files do not change for
    the dataset's lifetime — build's counts pass re-reads the path narrowly
    and its docmap pass consumes the dataset, and the two must see identical
    rows or doc_ids desync silently. The tag must be set ONLY here, right on
    the read. This is structurally safe today because every Dataset transform
    returns a NEW object and instance attributes do not propagate; never copy
    the attribute onto a derived dataset."""
    import ray.data

    ds = ray.data.read_parquet(path)
    try:
        ds._lucille_parquet_src = path
    except AttributeError:
        pass
    return ds


def _normalize_batch(batch: pa.Table) -> pa.Table:
    """Cast a loosely-typed batch (JSON/CSV inference) to TRANSCRIPT_SCHEMA.

    Arrow's cast covers every inference gap in one kernel each: int64 ->
    int32 turn indexes, ISO-8601 strings or any-unit timestamps ->
    timestamp[us], integer epoch-microseconds -> timestamp[us], and null ->
    typed-null for sparse columns (e.g. ``tool``)."""
    cols = []
    for f in TRANSCRIPT_SCHEMA:
        if f.name not in batch.column_names:
            cols.append(pa.nulls(batch.num_rows, f.type))
            continue
        col = batch[f.name]
        if col.type != f.type:
            col = pc.cast(col, f.type)
        cols.append(col)
    return pa.table(dict(zip(TRANSCRIPT_SCHEMA.names, cols)))


def read_transcripts_jsonl(path: str):
    """Transcripts from JSON-Lines files (one turn object per line) — the
    common raw-ingest format. ``ts`` may be an ISO-8601 string, an epoch-µs
    integer, or an inferred timestamp; everything normalizes to
    TRANSCRIPT_SCHEMA in a single vectorized cast per batch, so downstream
    stages (index build, ops) are source-agnostic."""
    import ray.data

    return ray.data.read_json(path).map_batches(
        _normalize_batch, batch_format="pyarrow"
    )


def read_transcripts_csv(path: str):
    """Transcripts from CSV files (header row required), normalized to
    TRANSCRIPT_SCHEMA like :func:`read_transcripts_jsonl`."""
    import ray.data

    return ray.data.read_csv(path).map_batches(
        _normalize_batch, batch_format="pyarrow"
    )
