"""Golden-string snapshot tests for the SQL Server dialect DDL.

The Derby e2e (test_sinks.py) executes the ``"derby"`` branch against a
real database; the ``"sqlserver"`` branch can't run in this sandbox, so
every generated T-SQL statement is pinned here against golden strings
matching the reference's DDL (resources.py:89-180, load.py:143-159).
A refactor that changes any emitted statement fails loudly instead of
silently drifting from the only dialect the reference actually targets.

Deliberate deltas from the reference, pinned as such:
- FK constraint names: reference uses ``FK_{column}`` (resources.py:123)
  which collides when two tables FK the same column name; ours embeds
  source columns AND the referenced table (``FK_{cols}__{ref_table}``).
- PK type map: reference maps int64->INT / object->VARCHAR(255)
  (load.py:21-33); ours maps the full Spark type palette (BIGINT,
  NVARCHAR(255), DATETIME2, ...) since Spark longs are 64-bit.
"""

from __future__ import annotations

from pyspark.sql import types as T

from dw_etl_spark.sinks.warehouse import (
    ForeignKey,
    ddl_add_foreign_key,
    ddl_alter_column_type,
    ddl_drop_foreign_key,
    ddl_drop_table,
    ddl_set_primary_key,
    sql_type_for,
)


def test_golden_drop_table():
    # reference resources.py:90
    assert ddl_drop_table("FACT_MemberExpedition") == (
        "DROP TABLE IF EXISTS FACT_MemberExpedition"
    )


def test_golden_set_primary_key():
    # reference resources.py:101-108: NOT-NULL retrofit then PK_{table}
    stmts = ddl_set_primary_key("DIM_Date", ["Id"], {"Id": "INT"})
    assert stmts == [
        "ALTER TABLE DIM_Date ALTER COLUMN Id INT NOT NULL",
        "ALTER TABLE DIM_Date ADD CONSTRAINT PK_DIM_Date PRIMARY KEY (Id)",
    ]


def test_golden_set_primary_key_composite():
    stmts = ddl_set_primary_key(
        "DIM_CountryIndicator",
        ["CountryName", "Year"],
        {"CountryName": "NVARCHAR(255)", "Year": "INT"},
    )
    assert stmts == [
        "ALTER TABLE DIM_CountryIndicator ALTER COLUMN CountryName "
        "NVARCHAR(255) NOT NULL",
        "ALTER TABLE DIM_CountryIndicator ALTER COLUMN Year INT NOT NULL",
        "ALTER TABLE DIM_CountryIndicator ADD CONSTRAINT "
        "PK_DIM_CountryIndicator PRIMARY KEY (CountryName, Year)",
    ]


def test_golden_add_foreign_key():
    # reference resources.py:121-124 (name scheme delta documented above)
    fk = ForeignKey(["DateId"], "DIM_Date", ["Id"])
    assert fk.name == "FK_DateId__DIM_Date"
    assert ddl_add_foreign_key("FACT_MemberExpedition", fk) == (
        "ALTER TABLE FACT_MemberExpedition ADD CONSTRAINT "
        "FK_DateId__DIM_Date FOREIGN KEY (DateId) REFERENCES DIM_Date (Id)"
    )


def test_golden_drop_foreign_key_guarded_and_table_scoped():
    # reference resources.py:136-144: IF EXISTS guard on sys.foreign_keys
    # scoped to the parent table via OBJECT_ID
    got = ddl_drop_foreign_key("FACT_MemberExpedition", "FK_DateId__DIM_Date")
    assert got == (
        "IF EXISTS (SELECT 1 FROM sys.foreign_keys "
        "WHERE name = 'FK_DateId__DIM_Date' "
        "AND parent_object_id = OBJECT_ID('FACT_MemberExpedition')) "
        "ALTER TABLE FACT_MemberExpedition "
        "DROP CONSTRAINT FK_DateId__DIM_Date"
    )


def test_golden_alter_column_type():
    # reference resources.py:167-171 / load.py:149-158 FK-type retrofit
    assert ddl_alter_column_type("FACT_MemberExpedition", "DateId", "INT") == (
        "ALTER TABLE FACT_MemberExpedition ALTER COLUMN DateId INT"
    )
    assert ddl_alter_column_type(
        "FACT_MemberExpedition", "PeakId", "VARCHAR(255)"
    ) == "ALTER TABLE FACT_MemberExpedition ALTER COLUMN PeakId VARCHAR(255)"


def test_golden_sql_type_map():
    # the Spark-side analog of reference load.py:21-33 get_id_datatype
    assert sql_type_for(T.LongType()) == "BIGINT"
    assert sql_type_for(T.IntegerType()) == "INT"
    assert sql_type_for(T.StringType()) == "NVARCHAR(255)"
    assert sql_type_for(T.DoubleType()) == "FLOAT"
    assert sql_type_for(T.BooleanType()) == "BIT"
    assert sql_type_for(T.DateType()) == "DATE"
    assert sql_type_for(T.TimestampType()) == "DATETIME2"
    assert sql_type_for(T.DecimalType(18, 4)) == "DECIMAL(18,4)"
    # unmapped types degrade to a lossless string column
    assert sql_type_for(T.BinaryType()) == "NVARCHAR(MAX)"


def test_golden_full_fact_load_statement_sequence():
    """The exact DDL statement stream a SQL Server fact load emits
    (write_table's sqlserver branch): PK retrofit then per-FK type
    retrofit + constraint — the reference's load.py:143-159 sequence."""
    fks = [
        ForeignKey(["DateId"], "DIM_Date", ["Id"]),
        ForeignKey(["PartId"], "DIM_Part", ["Id"]),
    ]
    stmts = ddl_set_primary_key("FACT_LineItem", ["Id"], {"Id": "BIGINT"})
    for fk in fks:
        stmts.append(ddl_alter_column_type("FACT_LineItem", fk.columns[0], "BIGINT"))
        stmts.append(ddl_add_foreign_key("FACT_LineItem", fk))
    assert stmts == [
        "ALTER TABLE FACT_LineItem ALTER COLUMN Id BIGINT NOT NULL",
        "ALTER TABLE FACT_LineItem ADD CONSTRAINT PK_FACT_LineItem "
        "PRIMARY KEY (Id)",
        "ALTER TABLE FACT_LineItem ALTER COLUMN DateId BIGINT",
        "ALTER TABLE FACT_LineItem ADD CONSTRAINT FK_DateId__DIM_Date "
        "FOREIGN KEY (DateId) REFERENCES DIM_Date (Id)",
        "ALTER TABLE FACT_LineItem ALTER COLUMN PartId BIGINT",
        "ALTER TABLE FACT_LineItem ADD CONSTRAINT FK_PartId__DIM_Part "
        "FOREIGN KEY (PartId) REFERENCES DIM_Part (Id)",
    ]
