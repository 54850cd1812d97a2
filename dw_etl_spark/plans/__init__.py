from dw_etl_spark.plans.star_schema import (
    build_dim_date,
    build_dim_indicator,
    build_dim_order,
    build_dim_part,
    build_fact,
    build_star_schema,
)

__all__ = [
    "build_dim_date",
    "build_dim_indicator",
    "build_dim_order",
    "build_dim_part",
    "build_fact",
    "build_star_schema",
]
