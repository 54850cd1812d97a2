"""Local replica of the driver's correctness gate: every ``queries()``
entry vs its ``oracle_sql()`` DuckDB twin at sf0.001 (fast smoke; the
driver runs sf0.01 — run with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
for the full check)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_matches_oracle, duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle():
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql())
    # non-SQL-expressible ops may be absent; keep the list explicit.
    allowed_missing: set[str] = set()
    assert missing <= allowed_missing, f"queries missing oracles: {missing}"


# lsh_topk / embedding_dup_pairs derive n_planes from the live corpus
# count (suggest_lsh_params); their static oracles inline the derivation
# for the 500-row embeddings fixture the gate SFs share. At other SFs
# the two sides legitimately use different plane counts — skip there.
_GATE_CORPUS_COUPLED = {"lsh_topk", "embedding_dup_pairs"}


def _embeddings_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, oracle, name):
    if name in _GATE_CORPUS_COUPLED and _embeddings_rows(SF_DIR) != 500:
        pytest.skip("oracle planes are derived for the 500-row gate corpus")
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0  # rows-only check
        return
    assert_matches_oracle(df, oracle, sql)


def test_query_count_fits_driver_sweep_cap():
    """The external correctness sweep records at most 50 rows (r4
    declared 57 and the last 7 dict entries silently got no row).
    Adding a gate query requires freeing a slot first — merge
    near-duplicate queries rather than exceeding the cap."""
    n = len(entrymod.queries())
    assert n <= 50, (
        f"queries() declares {n} entries but the driver sweep caps at 50 — "
        "the trailing entries would get no correctness row"
    )
