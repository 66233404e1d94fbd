"""Dump the formatted physical plan AND the executed job/stage counts for
named queries into plans/<tag>/ — the durable evidence for iterative
(checkpoint-hidden) queries the r13 VERDICT asked for (item 3): a text plan
of a checkpoint-driven loop only shows the last resolution join, so the
round/shuffle structure is recorded as statusTracker job/stage counts
instead of timing claims.

Usage:
    python scripts/dump_plan.py <tag> <suffix> <query> [<query> ...]
e.g.
    python scripts/dump_plan.py r14 before dedup_survivors knn_clusters

Writes plans/<tag>/<query>_<suffix>.txt (formatted plan) and
plans/<tag>/<query>_jobs_<suffix>.txt (job/stage counts for one full
construction + noop materialization, measured via setJobGroup +
statusTracker).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_bigdata_spark.session import get_spark
from demo_bigdata_spark.suites import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plan")
    sc = spark.sparkContext
    queries = all_queries()
    # warm the JVM once so compile jobs don't pollute the first query's count
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    for name in names:
        fn = queries[name]
        group = f"dump:{name}"
        sc.setJobGroup(group, f"dump_plan {name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)  # CONSTRUCT-side jobs count too (iterative readers)
        t_construct = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            n_stages += len(info.stageIds)
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    n_tasks += sinfo.numTasks
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        with open(os.path.join(outdir, f"{name}_jobs_{suffix}.txt"), "w") as f:
            f.write(
                f"query: {name}\n"
                f"sf_dir: {SF_DIR}\n"
                f"jobs: {len(job_ids)}\n"
                f"stages: {n_stages}\n"
                f"tasks: {n_tasks}\n"
                f"construct_sec: {t_construct:.3f}\n"
                f"total_sec: {elapsed:.3f}\n"
                f"(one construction + one noop materialization, "
                f"setJobGroup-scoped statusTracker counts)\n"
            )
        print(
            f"{name}: jobs={len(job_ids)} stages={n_stages} tasks={n_tasks} "
            f"construct={t_construct:.2f}s total={elapsed:.2f}s"
        )


if __name__ == "__main__":
    main()
