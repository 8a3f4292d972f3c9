from cuttana_ray.functions.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    pair_components,
    simhash_pairs,
)
from cuttana_ray.functions.decontam import benchmark_shingles, decontaminate
from cuttana_ray.functions.multimodal import (
    extract_features,
    sample_frames,
    synth_media_table,
)
from cuttana_ray.functions.bpe import learn_bpe
from cuttana_ray.functions.chunking import chunk_documents
from cuttana_ray.functions.quantiles import (
    grouped_mad,
    grouped_weighted_median,
    float_quantiles,
    grouped_float_quantiles,
)
from cuttana_ray.functions.dsir import dsir_weights
from cuttana_ray.functions.sampling import (
    hash_sample,
    source_mixture_weights,
    stratified_sample,
)
from cuttana_ray.functions.terms import (
    bigram_counts,
    build_postings,
    doc_term_counts,
    doc_tfidf_topk,
    pmi_bigrams,
    term_counts,
    top_bigrams,
    unigram_logppl,
    top_terms,
)
from cuttana_ray.functions.simsearch import kmeans_lite, knn_brute_force, knn_ivf
from cuttana_ray.functions.sketches import (
    QuantileSketch,
    approx_distinct,
    grouped_approx_distinct,
    heavy_hitters,
    quantile_sketch,
)
from cuttana_ray.functions.embeddings import (
    covariance_matrix,
    kmeans,
    knn_quantized,
    label_centroids,
    pca_scores,
    quantize_embeddings,
    standardize_embeddings,
)
from cuttana_ray.functions.cooccur import cooccurrence_cosine
from cuttana_ray.functions.editdist import edit_distance_pairs
from cuttana_ray.functions.packing import sequence_pack
from cuttana_ray.functions.pii import scrub_pii
from cuttana_ray.functions.textstats import (
    fingerprints,
    grouped_int_quantiles,
    int_quantiles,
    lang_id,
    quality_scores,
    repetition_stats,
    token_stats,
)

__all__ = [
    "QuantileSketch",
    "approx_distinct",
    "build_postings",
    "chunk_documents",
    "learn_bpe",
    "covariance_matrix",
    "grouped_approx_distinct",
    "grouped_float_quantiles",
    "knn_quantized",
    "pca_scores",
    "quantile_sketch",
    "quantize_embeddings",
    "standardize_embeddings",
    "benchmark_shingles",
    "decontaminate",
    "embedding_cosine_pairs",
    "exact_dedup",
    "extract_features",
    "fingerprints",
    "float_quantiles",
    "label_centroids",
    "grouped_int_quantiles",
    "hash_sample",
    "heavy_hitters",
    "kmeans_lite",
    "knn_brute_force",
    "knn_ivf",
    "lang_id",
    "int_quantiles",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "pair_components",
    "quality_scores",
    "sample_frames",
    "simhash_pairs",
    "source_mixture_weights",
    "stratified_sample",
    "synth_media_table",
    "kmeans",
    "repetition_stats",
    "pmi_bigrams",
    "unigram_logppl",
    "scrub_pii",
    "sequence_pack",
    "token_stats",
    "term_counts",
    "bigram_counts",
    "top_bigrams",
    "top_terms",
    "doc_term_counts",
    "doc_tfidf_topk",
    "cooccurrence_cosine",
    "edit_distance_pairs",
    "grouped_mad",
    "grouped_weighted_median",
]
