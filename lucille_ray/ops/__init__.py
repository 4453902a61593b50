from .dedup import (  # noqa: F401
    MinHasher,
    SimHasher,
    dedup_components,
    exact_dedup,
    minhash_dedup,
    minhash_dedup_verified,
    minhash_signatures,
    ngram_jaccard,
    simhash_signatures,
)
from .multimodal import (  # noqa: F401
    FakeImageCodec,
    ImageFeatureStage,
    attach_fake_images,
    image_features,
    video_frame_sample,
    video_temporal_features,
)
from .relational import (  # noqa: F401
    group_quantiles,
    group_quantiles_distributed,
    grouped_topk,
    pricing_summary,
)
from .sessions import (  # noqa: F401
    SESSIONIZE_SQL,
    TUMBLING_WINDOW_SQL,
    sessionize,
    tumbling_window_agg,
)
from .similarity import (  # noqa: F401
    IVFIndex,
    embedding_near_dups,
    embedding_near_dups_ann,
    knn_brute,
)
from .textstats import (  # noqa: F401
    bpe_token_counts,
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)
