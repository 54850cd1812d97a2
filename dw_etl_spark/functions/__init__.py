from dw_etl_spark.functions.scalar import (
    clean_whitespace,
    decade,
    domain_whitelist,
    map_lookup,
    strict_cast,
)

__all__ = [
    "clean_whitespace",
    "decade",
    "domain_whitelist",
    "map_lookup",
    "strict_cast",
]
