from cuttana_ray.functions.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from cuttana_ray.functions.multimodal import (
    extract_features,
    sample_frames,
    synth_media_table,
)
from cuttana_ray.functions.simsearch import kmeans_lite, knn_brute_force, knn_ivf
from cuttana_ray.functions.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_stats,
)

__all__ = [
    "embedding_cosine_pairs",
    "exact_dedup",
    "extract_features",
    "fingerprints",
    "kmeans_lite",
    "knn_brute_force",
    "knn_ivf",
    "lang_id",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "quality_scores",
    "sample_frames",
    "simhash_pairs",
    "synth_media_table",
    "token_stats",
]
