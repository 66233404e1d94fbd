"""Vectorized UDAF tier: pandas grouped-aggregate UDFs.

Completes the §2.8 UDF surface (the reference defines zero UDFs; the core
here stays UDF-free too). When an aggregate genuinely isn't expressible with
built-ins, a ``pandas_udf`` GROUPED_AGG runs Arrow-batched per group —
10-100x faster than a row-at-a-time Python UDAF, though still off the
codegen path: prefer built-in rewrites (geometric mean below HAS one —
exp(avg(ln)) — which is exactly how the DuckDB oracle checks it; it exists
to pin the Arrow plumbing, and the rewrite is documented for the hot path).

The UDF is built lazily on first access: decorating at import time calls
``_parse_datatype_string``, which needs an ACTIVE SparkSession — a bare
``import demo_bigdata_spark.functions.udafs`` before session creation would
otherwise crash (SESSION_OR_CONTEXT_NOT_EXISTS).
"""

from __future__ import annotations

# numpy/pandas import session-free; they stay module-global so the UDF's
# string annotations ('pd.Series') resolve when pyspark inspects them
import numpy as np
import pandas as pd

_geometric_mean = None


def __getattr__(name: str):
    global _geometric_mean
    if name == "geometric_mean":
        if _geometric_mean is None:
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("double")
            def geometric_mean(v: pd.Series) -> float:
                """Grouped-agg pandas UDF: exp(mean(ln(x))) over positive
                values. Built-in rewrite for the hot path:
                F.exp(F.avg(F.log(col)))."""
                return float(np.exp(np.log(v[v > 0]).mean()))

            _geometric_mean = geometric_mean
        return _geometric_mean
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
