from dw_etl_spark.sinks.warehouse import (
    ConstraintViolation,
    ForeignKey,
    JdbcWarehouse,
    ParquetWarehouse,
    TableSpec,
    check_foreign_key,
    check_primary_key,
    load_star_schema,
)

__all__ = [
    "ConstraintViolation",
    "ForeignKey",
    "JdbcWarehouse",
    "ParquetWarehouse",
    "TableSpec",
    "check_foreign_key",
    "check_primary_key",
    "load_star_schema",
]
