"""Mirror of the driver's correctness gate on sf0.001: run a representative subset
of __ray_entry__ queries against their DuckDB oracles (full sweep lives in
tools/check_oracle.py; run it manually against sf0.01)."""

import os
import sys

import duckdb
import pandas.testing as pdt
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, canon

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "transcripts_build",
    "token_counts",
    "doc_stats",
    "exact_dedup",
    "lang_id",
    "fingerprints",
    "knn_cosine",
    "revenue_by_nation",
    "grouped_topk",
    "search_facets",
    "search_snippets",
    "pii_scrub",
    "kmv_distinct",
    "cms_frequencies",
    "curation_pipeline",
    "search_term",
    "search_phrase",
    "search_proximity",
    "search_expansions",  # round 5: also carries Fuzzy + TermRange clauses
    "search_not",
    "search_nested",  # round 5: also carries the Boost node (scan^2)
    "hash_sample",  # rotated into the driver registry (VERDICT r04 #8)
    "dedup_components",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_smoke(entry_mod):
    t = entry_mod.entry()
    assert t.num_rows >= 0
    assert t.column_names == ["doc_id", "score_r"]


def test_every_query_has_callable_and_oracle_keys_subset(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(entry_mod, con, name):
    got = canon(entry_mod.queries()[name](SF_DIR))
    exp = canon(con.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pdt.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, atol=1e-12, rtol=0)
