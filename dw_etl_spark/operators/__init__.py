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
    top_k_values,
)
from dw_etl_spark.operators.project import project_rename
from dw_etl_spark.operators.qcut import ntile_buckets, qcut_by_group
from dw_etl_spark.operators.scd import scd2_apply, scd2_current
from dw_etl_spark.operators.scale import (
    salted_join,
    two_phase_count_distinct,
    write_bucketed,
)
from dw_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    lsh_topk,
)
from dw_etl_spark.operators.temporal_joins import asof_join, range_join
from dw_etl_spark.operators.text_dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

__all__ = [
    "add_sequential_id",
    "add_unique_id",
    "asof_join",
    "bin_numeric",
    "cosine_topk",
    "dedup_keep_first",
    "embedding_dup_pairs",
    "exact_dedup",
    "extract_features",
    "fuzzy_top1_join",
    "interpolate_by_group",
    "iqr_outlier_count",
    "lsh_topk",
    "media_stats",
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
