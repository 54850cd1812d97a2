from dw_etl_spark.operators.bins import bin_numeric
from dw_etl_spark.operators.dedup import dedup_keep_first
from dw_etl_spark.operators.interpolate import interpolate_by_group
from dw_etl_spark.operators.joins import fuzzy_top1_join, resolve_surrogate_key
from dw_etl_spark.operators.keys import add_sequential_id, add_unique_id
from dw_etl_spark.operators.multimodal import (
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
)
from dw_etl_spark.operators.pivot import pivot_wide
from dw_etl_spark.operators.profile import (
    iqr_outlier_count,
    profile_columns,
    standardize,
    top_k_values,
    winsorize,
)
from dw_etl_spark.operators.project import project_rename
from dw_etl_spark.operators.qcut import ntile_buckets, qcut_by_group
from dw_etl_spark.operators.scd import scd1_apply, scd2_apply, scd2_current
from dw_etl_spark.operators.graph import cluster_dedup, connected_components
from dw_etl_spark.operators.ir import hashed_embedding, tfidf_top_terms
from dw_etl_spark.operators.lm import bigram_logppl, unigram_logppl
from dw_etl_spark.operators.neardup_index import (
    build_neardup_index,
    compact_neardup_index,
    drop_neardup_index,
    merge_into_neardup_index,
    query_neardup_index,
)
from dw_etl_spark.operators.packing import chunk_documents, pack_into_shards, write_training_shards
from dw_etl_spark.operators.sampling import (
    deterministic_sample,
    deterministic_shuffle,
    mix_corpora,
    quota_sample,
    stratified_sample,
    train_val_test_split,
    weighted_sample,
)
from dw_etl_spark.operators.drift import ks_statistic, token_shift
from dw_etl_spark.operators.expectations import (
    check_expectations,
    expect,
    expectation_report,
    observe_expectations,
)
from dw_etl_spark.operators.sketches import (
    distinct_sketch,
    merge_distinct_sketches,
)
from dw_etl_spark.operators.scale import (
    bloom_prefilter_anti_join,
    build_bloom,
    compact_parquet,
    rebalance_for_write,
    file_zone_map,
    read_pruned,
    salted_join,
    two_phase_count_distinct,
    write_bucketed,
    zorder_by,
)
from dw_etl_spark.operators.similarity import (
    ann_recall,
    cosine_topk,
    embedding_dup_pairs,
    ivf_topk,
    ivf_train_centroids,
    ivfpq_topk,
    lsh_topk,
    pq_encode,
    pq_topk,
    pq_train_codebooks,
    semantic_dedup,
    semantic_dedup_pairs,
    suggest_lsh_params,
)
from dw_etl_spark.operators.temporal_joins import asof_join, range_join
from dw_etl_spark.operators.text_dedup import (
    contamination_flags,
    duplicate_line_stats,
    duplicated_span_stats,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    normalize_unicode,
    remove_duplicate_lines,
    remove_duplicated_spans,
    simhash_pairs,
)

__all__ = [
    "ann_recall",
    "bigram_logppl",
    "bloom_prefilter_anti_join",
    "build_bloom",
    "build_neardup_index",
    "check_expectations",
    "chunk_documents",
    "compact_neardup_index",
    "cluster_dedup",
    "compact_parquet",
    "connected_components",
    "contamination_flags",
    "deterministic_sample",
    "deterministic_shuffle",
    "duplicate_line_stats",
    "ivf_topk",
    "ivf_train_centroids",
    "ivfpq_topk",
    "ks_statistic",
    "normalize_unicode",
    "pack_into_shards",
    "query_neardup_index",
    "quota_sample",
    "scd1_apply",
    "pq_encode",
    "pq_topk",
    "pq_train_codebooks",
    "read_pruned",
    "rebalance_for_write",
    "remove_duplicate_lines",
    "remove_duplicated_spans",
    "semantic_dedup",
    "standardize",
    "semantic_dedup_pairs",
    "stratified_sample",
    "suggest_lsh_params",
    "tfidf_top_terms",
    "token_shift",
    "train_val_test_split",
    "unigram_logppl",
    "weighted_sample",
    "winsorize",
    "write_training_shards",
    "zorder_by",
    "add_sequential_id",
    "add_unique_id",
    "asof_join",
    "bin_numeric",
    "cosine_topk",
    "dedup_keep_first",
    "embedding_dup_pairs",
    "distinct_sketch",
    "drop_neardup_index",
    "duplicated_span_stats",
    "exact_dedup",
    "expect",
    "expectation_report",
    "file_zone_map",
    "extract_features",
    "fuzzy_top1_join",
    "hashed_embedding",
    "interpolate_by_group",
    "iqr_outlier_count",
    "lsh_topk",
    "media_stats",
    "merge_distinct_sketches",
    "merge_into_neardup_index",
    "mix_corpora",
    "observe_expectations",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ntile_buckets",
    "pivot_wide",
    "profile_columns",
    "project_rename",
    "qcut_by_group",
    "range_join",
    "resize_images",
    "resolve_surrogate_key",
    "salted_join",
    "sample_frames",
    "scd2_apply",
    "scd2_current",
    "simhash_pairs",
    "top_k_values",
    "two_phase_count_distinct",
    "write_bucketed",
]
