"""Pin tools/gen_sf.py (the scale-sweep fixture generator) to the
driver testdata contract: identical arrow schemas per table, and the
key invariants the gate queries rely on (sorted event ts, planted doc
duplicates, unit-norm embeddings). The sf1 scale sweep (PLANS #52) is
only evidence about the real pipeline if the generated corpus is
schema- and shape-faithful to the driver's; this test makes that a
suite invariant instead of a one-time eyeball."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
)
from gen_sf import BASE, gen  # noqa: E402

DRIVER = SF_SMOKE
TABLES = [
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gensf") / "sf0.001"
    gen(0.001, str(out))
    return str(out)


@pytest.mark.parametrize("table", TABLES)
def test_schema_matches_driver(gen_dir, table):
    got = pq.read_schema(f"{gen_dir}/{table}.parquet")
    want = pq.read_schema(f"{DRIVER}/{table}.parquet")
    got_f = [(f.name, str(f.type)) for f in got]
    want_f = [(f.name, str(f.type)) for f in want]
    assert got_f == want_f


def test_linear_rowcounts(gen_dir):
    # The driver floors documents/embeddings at 500 below sf0.1; every
    # other table is observed linear in sf (TESTDATA.md, sf0.01→sf0.1).
    # The generator is linear everywhere — assert that rule at sf0.001
    # so a BASE edit that breaks the sweep's 10× denominator is caught.
    for t in ("supplier", "customer", "part", "orders", "lineitem", "events"):
        n = pq.read_metadata(f"{gen_dir}/{t}.parquet").num_rows
        assert n == max(1, round(BASE[t] * 0.001)), t
        assert n == pq.read_metadata(f"{DRIVER}/{t}.parquet").num_rows, t


def test_fixture_invariants(gen_dir):
    ev = pq.read_table(f"{gen_dir}/events.parquet")
    ts = ev.column("ts").to_numpy()
    assert (np.diff(ts.astype("int64")) >= 0).all(), "events.ts must be sorted"

    emb = pq.read_table(f"{gen_dir}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    assert vecs.shape[1] == 64
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)

    docs = pq.read_table(f"{gen_dir}/documents.parquet")
    texts = docs.column("text").to_pylist()
    n_chars = docs.column("n_chars").to_pylist()
    assert all(len(t) == c for t, c in zip(texts, n_chars))
    # planted exact duplicates exist at every sf (~1/600 with a floor of 2)
    assert len(texts) - len(set(texts)) >= 1, "no planted exact duplicates"
