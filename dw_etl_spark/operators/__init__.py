from dw_etl_spark.operators.bins import bin_numeric
from dw_etl_spark.operators.dedup import dedup_keep_first
from dw_etl_spark.operators.interpolate import interpolate_by_group
from dw_etl_spark.operators.joins import fuzzy_top1_join, resolve_surrogate_key
from dw_etl_spark.operators.keys import add_sequential_id, add_unique_id
from dw_etl_spark.operators.pivot import pivot_wide
from dw_etl_spark.operators.project import project_rename
from dw_etl_spark.operators.qcut import ntile_buckets, qcut_by_group

__all__ = [
    "bin_numeric",
    "dedup_keep_first",
    "interpolate_by_group",
    "fuzzy_top1_join",
    "resolve_surrogate_key",
    "add_sequential_id",
    "add_unique_id",
    "pivot_wide",
    "project_rename",
    "ntile_buckets",
    "qcut_by_group",
]
