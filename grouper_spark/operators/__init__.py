from .core import (
    asof_join,
    binned_range_join,
    salted_join,
    merge_intervals,
    sessionize,
    topk_per_group,
)
from .linalg import gramian_upper
from .dedup import (
    canonicalize_exact,
    cooccurrence_pairs,
    dedup_clusters,
    minhash_signatures,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from .similarity import (
    ann_topk_bruteforce,
    ivf_ann,
    lsh_bucket_ann,
    lsh_neardup_pairs,
    tfidf_knn,
)

__all__ = [
    "asof_join",
    "binned_range_join",
    "gramian_upper",
    "salted_join",
    "merge_intervals",
    "sessionize",
    "topk_per_group",
    "canonicalize_exact",
    "cooccurrence_pairs",
    "dedup_clusters",
    "shingle_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ann_topk_bruteforce",
    "tfidf_knn",
    "ivf_ann",
    "lsh_bucket_ann",
    "lsh_neardup_pairs",
]
