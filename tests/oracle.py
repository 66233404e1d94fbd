"""Local replica of the driver's oracle-differential check.

Runs a suite query on Spark and its ANSI twin on DuckDB over the same parquet
tables, then compares row count, sorted column names, and an order-insensitive
value multiset (normalized: floats rounded, NaN/None unified). Catches
alias/typing/precision mismatches before the driver does.
"""

from __future__ import annotations

import math

import duckdb

from demo_bigdata_spark.schemas import ALL_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # kill -0.0 and residual representation noise past the explicit rounding
        r = round(v, 6)
        return 0.0 if r == 0 else r
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _strict(v):
    """Stringify WITHOUT unifying int/float — mirrors a driver that hashes
    serialized values, where 3549 (Spark bigint) != 3549.0 (DuckDB hugeint
    via pandas float). Type drift must be fixed in the SQL, not papered over."""
    n = _norm(v)
    return f"{type(n).__name__}:{n}"


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_strict(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    sdf = spark_df.toPandas()
    ddf = con.sql(sql).df()
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    assert s_cols == d_cols, f"{name}: columns differ spark={s_cols} duck={d_cols}"
    # dtype parity: a schema-comparing driver would flag int32 vs int64 etc.
    dt_diff = [
        (c, str(sdf[c].dtype), str(ddf[c].dtype))
        for c in s_cols
        if str(sdf[c].dtype) != str(ddf[c].dtype)
    ]
    assert not dt_diff, f"{name}: dtype drift {dt_diff}"
    assert len(sdf) == len(ddf), f"{name}: rowcount spark={len(sdf)} duck={len(ddf)}"
    s_rows = _multiset(sdf.itertuples(index=False, name=None), list(sdf.columns))
    d_rows = _multiset(
        (tuple(None if (isinstance(x, float) and math.isnan(x)) else x for x in r)
         for r in ddf.itertuples(index=False, name=None)),
        list(ddf.columns),
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
