"""DBF (dBase III/IV) scan → DataFrame (SURVEY.md §2.1 S4).

Capability parity: the reference's raw-analysis stage reads a legacy
``.dbf`` export (reference raw_analysis/main.py:12-13, via the dbfread
package). That package isn't available here, and the format is simple
enough that a dependency isn't warranted: fixed 32-byte header, 32-byte
field descriptors terminated by 0x0D, then fixed-width ASCII records
with a 1-byte deletion flag.

Scale notes: DBF is a single-file legacy format with a hard 2 GB cap —
there is no distributed-scan story to build, and none is needed. The
parse is driver-side (like the reference's); rows land in a DataFrame
via ``createDataFrame`` with an explicit schema, after which everything
is distributed. For many DBF files, parallelize across files
(``spark.read.format("binaryFile")`` + ``mapInPandas`` over this same
record parser) — the per-file logic below is the reusable piece.

Field type mapping (dBase III):
  C (character) → string    N/F (numeric/float) → long or double
  L (logical)   → boolean   D (date, YYYYMMDD)  → date
"""

from __future__ import annotations

import datetime
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dw_etl_spark.sources.files import SchemaValidationError, validate_required_columns


@dataclass
class DbfField:
    name: str
    type_code: str  # C N F L D
    length: int
    decimals: int


def parse_dbf_header(data: bytes) -> tuple[int, int, int, list[DbfField]]:
    """Header → (n_records, header_size, record_size, fields)."""
    if len(data) < 32:
        raise SchemaValidationError("not a DBF file: truncated header")
    n_records, header_size, record_size = struct.unpack_from("<IHH", data, 4)
    fields: list[DbfField] = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        desc = data[off : off + 32]
        if len(desc) < 32:
            raise SchemaValidationError("not a DBF file: truncated descriptor")
        name = desc[:11].split(b"\x00", 1)[0].decode("ascii", "replace")
        fields.append(
            DbfField(
                name=name,
                type_code=chr(desc[11]),
                length=desc[16],
                decimals=desc[17],
            )
        )
        off += 32
    if not fields:
        raise SchemaValidationError("not a DBF file: no field descriptors")
    return n_records, header_size, record_size, fields


def _convert(raw: bytes, f: DbfField):
    text = raw.decode("ascii", "replace").strip()
    if f.type_code == "C":
        return text or None
    if text == "":
        return None
    if f.type_code in ("N", "F"):
        try:
            return float(text) if f.decimals or f.type_code == "F" else int(text)
        except ValueError:
            return None  # DBF numerics are untyped text; blanks/junk → NULL
    if f.type_code == "L":
        return (
            True if text in "YyTt" else False if text in "NnFf" else None
        )
    if f.type_code == "D":
        try:
            return datetime.date(int(text[:4]), int(text[4:6]), int(text[6:8]))
        except ValueError:
            return None
    return text or None


_SPARK_TYPES = {
    "C": T.StringType(),
    "L": T.BooleanType(),
    "D": T.DateType(),
}


def _spark_type(f: DbfField) -> T.DataType:
    if f.type_code in ("N", "F"):
        return (
            T.DoubleType() if f.decimals or f.type_code == "F" else T.LongType()
        )
    return _SPARK_TYPES.get(f.type_code, T.StringType())


def read_dbf(
    spark: SparkSession,
    path: str,
    required_columns: list[str] | None = None,
    include_deleted: bool = False,
) -> DataFrame:
    """DBF scan (S4): parse one .dbf file into a typed DataFrame.

    Records flagged deleted (0x2A flag byte) are skipped unless
    ``include_deleted``. ``required_columns`` validates the declared
    field names the same way the CSV/parquet scans do (S2).
    """
    with open(path, "rb") as fh:
        data = fh.read()
    n_records, header_size, record_size, fields = parse_dbf_header(data)

    rows = []
    off = header_size
    for _ in range(n_records):
        rec = data[off : off + record_size]
        off += record_size
        if len(rec) < record_size:
            break
        if rec[0:1] == b"*" and not include_deleted:
            continue
        vals, pos = [], 1
        for f in fields:
            vals.append(_convert(rec[pos : pos + f.length], f))
            pos += f.length
        rows.append(tuple(vals))

    schema = T.StructType(
        [T.StructField(f.name, _spark_type(f), True) for f in fields]
    )
    df = spark.createDataFrame(rows, schema)
    if required_columns:
        validate_required_columns(df, required_columns)
    return df
