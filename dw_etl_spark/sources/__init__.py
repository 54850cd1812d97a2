from dw_etl_spark.sources.files import (
    read_csv,
    read_csv_with_quarantine,
    read_jsonl_with_quarantine,
    read_parquet,
    read_table,
    split_malformed,
    validate_required_columns,
)
from dw_etl_spark.sources.rest import PaginatedJsonSource, rest_to_dataframe
from dw_etl_spark.sources.warc import parse_warc, read_warc, write_warc

__all__ = [
    "parse_warc",
    "read_warc",
    "write_warc",
    "read_csv",
    "read_csv_with_quarantine",
    "read_jsonl_with_quarantine",
    "read_parquet",
    "read_table",
    "split_malformed",
    "validate_required_columns",
    "PaginatedJsonSource",
    "rest_to_dataframe",
]
