from incubator_sedona_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_dup_pairs,
    simhash64,
    simhash_dup_pairs,
    ngram_jaccard_pairs,
    embedding_cosine_dup_pairs,
)
from incubator_sedona_spark.pipeline.text import (  # noqa: F401
    token_count_col,
    quality_score_cols,
    langid_col,
    fingerprint_col,
)
from incubator_sedona_spark.pipeline.ann import (  # noqa: F401
    brute_force_topk,
    ivf_build,
    ivf_topk,
    lsh_topk,
)
from incubator_sedona_spark.pipeline.components import (  # noqa: F401
    connected_components,
    dedup_representatives,
)
from incubator_sedona_spark.pipeline.setjoin import exact_jaccard_self_join  # noqa: F401
