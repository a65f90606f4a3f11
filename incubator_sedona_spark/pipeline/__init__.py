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
from incubator_sedona_spark.pipeline.ann import brute_force_topk, lsh_topk  # noqa: F401
