from .batch import QueryScorerStage, score_query_dataset  # noqa: F401
from .engine import SearchEngine, SegmentScorer  # noqa: F401
from .eval import (  # noqa: F401
    EvalContext,
    K1,
    B,
    MAX_EXPANSIONS,
    SegmentEval,
    collect_term_requests,
    top_k,
)
from .oracle import BruteForceOracle  # noqa: F401
