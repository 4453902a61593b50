"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself BEFORE importing this module; nothing here
(or in the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship pipeline on /root/testdata/sf0.001: derive transcripts
  from the documents table, build (resume-cached) a compressed inverted index via
  Ray Data, run a compound BM25 query, return the top-k as a pyarrow Table.
* ``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2 +
  training-data ops); each callable takes ``sf_dir``.
* ``oracle_sql()`` — DuckDB-equivalent SQL per query. As of round 2 EVERY entry
  has an oracle: the formerly rows-only ops (LSH signatures, simhash, image
  features, IVF ANN) became SQL-checkable by pinning their hashing to an exact
  integer contract both numpy and DuckDB evaluate (md5_number_lower + mod-2^31
  folds; digest-byte reconstruction for the fake image payloads; exhaustive
  probing for the IVF driver entry, with recall@k pytest goldens covering the
  pruned path).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from lucille_ray.pipelines import registry, run_search


def entry() -> Any:
    """Flagship: index sf0.001 transcripts, answer a compound boolean query."""
    return run_search(
        "/root/testdata/sf0.001",
        'role:assistant AND (join OR "batch window" OR s*)^1.5 -slow',
        k=20,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in registry().items() if sql is not None
    }
