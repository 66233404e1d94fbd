"""Every declared (query, oracle) pair must hash-match — the local twin of the
driver's CORRECTNESS gate, run at sf0.001 for speed (driver runs sf0.01)."""

from __future__ import annotations

import pandas as pd
import pytest

from demo_bigdata_spark.suites import _ALL_SUITES
from tests.oracle import compare, duckdb_conn

ALL_PAIRS = [
    (name, fn, sql)
    for mod in _ALL_SUITES
    for name, (fn, sql) in mod.QUERIES.items()
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name,fn,sql", ALL_PAIRS, ids=[p[0] for p in ALL_PAIRS]
)
def test_oracle_match(name, fn, sql, spark, sf_dir, con):
    df = fn(spark, sf_dir)
    if sql is None:
        # non-SQL-expressible op: every rows-only query must carry a
        # falsifiable invariant (tests/invariants.py) — a missing entry
        # fails, so `(fn, None)` rows can't ship unchecked
        from tests.invariants import INVARIANTS

        out = df.toPandas()
        assert isinstance(out, pd.DataFrame)
        inv = INVARIANTS.get(name)
        assert inv is not None, f"{name}: rows-only query without an invariant"
        inv(out, spark, sf_dir, con)
    else:
        compare(df, con, sql, name)
