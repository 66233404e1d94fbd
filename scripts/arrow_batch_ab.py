"""A/B probe for `spark.sql.execution.arrow.maxRecordsPerBatch` over the
blocked-GEMM MapInPandas family (r13 VERDICT item 7): same bench
methodology (best-of-5 noop materialization), one fresh session per
setting (the conf is read at plan time), control row `tpch_q1` to detect
environment drift. Records numbers only — the decision rule is "keep the
default unless a setting wins consistently with a flat control".

    python scripts/arrow_batch_ab.py [batch_size ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_bigdata_spark.session import get_spark
from demo_bigdata_spark.suites import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "tpch_q1",  # control (no Python boundary)
    "semantic_dedup",
    "semantic_dedup_capped",
    "knn_graph",
    "multi_query_topk",
    "rp_topk",
    "soft_dedup",
]


def run_setting(batch: int | None) -> dict[str, float]:
    extra = {}
    if batch is not None:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(batch)
    spark = get_spark(f"arrow_ab_{batch or 'default'}", extra_conf=extra)
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    queries = all_queries()
    out: dict[str, float] = {}
    for name in QUERIES:
        df = queries[name](spark, SF_DIR)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    spark.stop()
    return out


def main() -> None:
    sizes = [None] + [int(a) for a in sys.argv[1:]] if len(sys.argv) > 1 else [
        None, 2048, 50000,
    ]
    results = {}
    for b in sizes:
        label = "default(10000)" if b is None else str(b)
        results[label] = run_setting(b)
        print(json.dumps({label: results[label]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
