from nativeextractor_spark.textops.dedup import (
    dedup_exact,
    minhash_bands,
    lsh_duplicate_pairs,
    simhash,
    simhash_duplicate_pairs,
    ngram_jaccard_pairs,
)
from nativeextractor_spark.textops.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from nativeextractor_spark.textops.quality import (
    language_id,
    quality_scores,
    token_counts,
    fingerprint,
)
from nativeextractor_spark.textops.lines import (
    gopher_repetition,
    drop_duplicate_lines,
)
from nativeextractor_spark.textops.redact import redact_pii

__all__ = [
    "dedup_exact",
    "minhash_bands",
    "lsh_duplicate_pairs",
    "simhash",
    "simhash_duplicate_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "language_id",
    "quality_scores",
    "gopher_repetition",
    "drop_duplicate_lines",
    "redact_pii",
    "token_counts",
    "fingerprint",
]
