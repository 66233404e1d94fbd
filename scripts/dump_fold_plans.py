"""Plan evidence for the epoch-partitioned histogram/KL fold layout (r14,
r13 VERDICT item 4): build a small 2-epoch fixture with the CURRENT
appenders, then dump the committed readers' formatted plans. Run once from
the pre-change tree (suffix 'before') and once from the optimized tree
(suffix 'after'); the diff shows the dropDuplicates Exchange gone.

    python scripts/dump_fold_plans.py <outdir> <suffix>
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from demo_bigdata_spark.operators.sketches import (  # noqa: E402
    append_histogram_batch,
    read_histogram,
)
from demo_bigdata_spark.operators.text import (  # noqa: E402
    append_term_counts_batch,
    read_group_kl,
)
from demo_bigdata_spark.plans.inspect import explain_formatted  # noqa: E402
from demo_bigdata_spark.session import get_spark  # noqa: E402
from demo_bigdata_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("fold_plans", shuffle_partitions=8)
    docs = load_table(spark, SF_DIR, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        hpath = os.path.join(tmp, "qhist")
        kpath = os.path.join(tmp, "klcounts")
        for e in range(2):
            part = docs.filter(F.col("doc_id") % 2 == e)
            append_histogram_batch(
                spark, part, hpath, e, value_col="n_chars",
                lo=0.0, hi=2048.0, n_bins=256,
            )
            append_term_counts_batch(spark, part, kpath, e)
        # read_group_kl pins its committed (grp, tok) sum behind a
        # localCheckpoint, which hides the committed-view subtree from the
        # final plan — dump that subtree separately (the same expression
        # read_group_kl builds before _kl_from_counts)
        try:
            from demo_bigdata_spark.streaming.pipeline import (
                committed_view_epoch_partitioned,
            )

            kl_counts = committed_view_epoch_partitioned(
                spark, kpath, kpath + "_epochs",
                "grp string, tok string, n bigint, epoch_id long",
            )
        except ImportError:  # pre-r14 tree: flat layout + dedup keys
            from demo_bigdata_spark.streaming.pipeline import committed_view

            kl_counts = committed_view(
                spark, kpath, kpath + "_epochs",
                ["grp", "tok", "epoch_id"],
                "grp string, tok string, n bigint, epoch_id long",
            )
        kl_counts = kl_counts.groupBy("grp", "tok").agg(F.sum("n").alias("n"))
        for name, df in (
            ("read_histogram", read_histogram(spark, hpath)),
            ("read_group_kl", read_group_kl(spark, kpath, top_v=64)),
            ("read_group_kl_counts", kl_counts),
        ):
            df.write.format("noop").mode("overwrite").save()
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(explain_formatted(df))
            print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
