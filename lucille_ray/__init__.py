"""lucille-ray: a Ray-Data-native fulltext indexing + BM25 query engine with the
query capabilities of the reference library (cozydev-pink/lucille).

Layers:

* :mod:`lucille_ray.query` — pure-Python Lucene-syntax parser / printer / AST.
* :mod:`lucille_ray.analysis` — the analyzer shared by index build and oracles.
* :mod:`lucille_ray.index` — Ray Data inverted-index build (tokenize map_batches ->
  groupby shuffle -> compressed segments with lineage manifests).
* :mod:`lucille_ray.search` — AST-compiled BM25 top-k execution over segments.
* :mod:`lucille_ray.ops` — large-scale training-data pipeline operators (dedup,
  similarity search, text stats, multimodal stubs).
"""

from .query import parse, print_query, ParseError, QueryParser  # noqa: F401

__version__ = "0.1.0"
