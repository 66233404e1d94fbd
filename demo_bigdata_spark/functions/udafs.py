"""Vectorized UDAF tier: pandas grouped-aggregate UDFs.

Completes the §2.8 UDF surface (the reference defines zero UDFs; the core
here stays UDF-free too). When an aggregate genuinely isn't expressible with
built-ins, a ``pandas_udf`` GROUPED_AGG runs Arrow-batched per group —
10-100x faster than a row-at-a-time Python UDAF, though still off the
codegen path: prefer built-in rewrites (geometric mean below HAS one —
exp(avg(ln)) — which is exactly how the DuckDB oracle checks it; it exists
to pin the Arrow plumbing, and the rewrite is documented for the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: exp(mean(ln(x))) over positive values.
    Built-in rewrite for the hot path: F.exp(F.avg(F.log(col)))."""
    return float(np.exp(np.log(v[v > 0]).mean()))
