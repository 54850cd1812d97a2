"""S4 DBF scan: parse a byte-level dBase III fixture (built here with
struct, no dbf library on either side) covering C/N/F/L/D types, blank
numerics, and deleted-record skipping."""

from __future__ import annotations

import struct

import pytest

from dw_etl_spark.sources.dbf import read_dbf
from dw_etl_spark.sources.files import SchemaValidationError


def _make_dbf(tmp_path, records, deleted_mask=None):
    fields = [
        ("NAME", "C", 10, 0),
        ("QTY", "N", 6, 0),
        ("PRICE", "N", 10, 2),
        ("ACTIVE", "L", 1, 0),
        ("BORN", "D", 8, 0),
    ]
    record_size = 1 + sum(ln for _, _, ln, _ in fields)
    header_size = 32 + 32 * len(fields) + 1
    head = struct.pack(
        "<B3BIHH20x", 0x03, 24, 1, 1, len(records), header_size, record_size
    )
    descs = b""
    for name, tc, ln, dec in fields:
        descs += struct.pack(
            "<11sc4xBB14x", name.encode(), tc.encode(), ln, dec
        )
    body = b""
    deleted_mask = deleted_mask or [False] * len(records)
    for rec, dead in zip(records, deleted_mask):
        body += b"*" if dead else b" "
        for (name, tc, ln, dec), val in zip(fields, rec):
            body += val.encode().rjust(ln) if tc in "NF" else val.encode().ljust(ln)
    p = tmp_path / "fixture.dbf"
    p.write_bytes(head + descs + b"\x0d" + body + b"\x1a")
    return str(p)


def test_read_dbf_types_and_deleted(spark, tmp_path):
    path = _make_dbf(
        tmp_path,
        [
            ("alpha", "42", "19.95", "T", "19991231"),
            ("beta", "", "", "F", ""),
            ("gone", "1", "1.00", "T", "20200101"),
        ],
        deleted_mask=[False, False, True],
    )
    df = read_dbf(spark, path, required_columns=["NAME", "QTY", "PRICE"])
    assert [f.name for f in df.schema.fields] == [
        "NAME", "QTY", "PRICE", "ACTIVE", "BORN",
    ]
    assert dict(df.dtypes) == {
        "NAME": "string", "QTY": "bigint", "PRICE": "double",
        "ACTIVE": "boolean", "BORN": "date",
    }
    rows = {r["NAME"]: r for r in df.collect()}
    assert set(rows) == {"alpha", "beta"}  # deleted record skipped
    a = rows["alpha"]
    assert (a["QTY"], a["PRICE"], a["ACTIVE"], str(a["BORN"])) == (
        42, 19.95, True, "1999-12-31",
    )
    b = rows["beta"]
    assert (b["QTY"], b["PRICE"], b["BORN"]) == (None, None, None)
    # include_deleted surfaces the third row
    assert read_dbf(spark, path, include_deleted=True).count() == 3


def test_read_dbf_validates_columns_and_format(spark, tmp_path):
    path = _make_dbf(tmp_path, [("x", "1", "1.0", "T", "20200101")])
    with pytest.raises(SchemaValidationError):
        read_dbf(spark, path, required_columns=["MISSING"])
    bad = tmp_path / "bad.dbf"
    bad.write_bytes(b"\x03short")
    with pytest.raises(SchemaValidationError):
        read_dbf(spark, str(bad))
