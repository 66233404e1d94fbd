"""Scale patterns: bucketed co-located joins (no Exchange), salted aggregation
equivalence, merge/upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_bigdata_spark.operators.relational import merge_upsert, salted_aggregate
from demo_bigdata_spark.plans.inspect import executed_plan
from demo_bigdata_spark.sources.catalog import load_table


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path_factory):
    """Writing both sides bucketed+sorted on the join key lets the sort-merge
    join run without any Exchange — THE pattern for repeated fact-fact joins
    at 100 TB (pay the shuffle once at write time, never per query)."""
    wh = str(tmp_path_factory.mktemp("warehouse"))  # explicit path per table
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{wh}/li_b").mode("overwrite").saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{wh}/ord_b").mode("overwrite").saveAsTable("ord_b")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(
            spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        joined.collect()
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        # sanity: same result as the plain join
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_aggregate(
        ev,
        ["event_type"],
        {"n": ("value", "count"), "total": ("value", "sum"), "mx": ("value", "max")},
        salt_buckets=8,
    ).withColumn("total", F.round("total", 2))
    plain = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.max("value").alias("mx"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_aggregate_rejects_non_algebraic(spark, sf_dir):
    import pytest

    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(ev, ["event_type"], {"a": ("value", "avg")})


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "tag", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["id", "tag", "v"]
    )
    merged = {r["id"]: (r["tag"], r["v"]) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert merged == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """At cluster scale a selective dim-side filter should inject a runtime
    bloom filter on the fact side (row-level pruning BEFORE the shuffle).
    Local testdata sits under the size thresholds and small dims broadcast,
    so emulate scale: force shuffle join + zero the scan threshold, then pin
    that Catalyst injects bloom_filter_agg/might_contain — and that results
    are unchanged by the injection."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").filter(
            F.col("o_totalprice") > 300000
        )
        q = lambda: (  # noqa: E731
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )
        baseline = sorted(map(tuple, q().collect()))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        df = q()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        assert sorted(map(tuple, df.collect())) == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_aqe_splits_skewed_join_partitions(spark):
    """At cluster scale a hot join key straggles one shuffle partition; AQE
    skew-join splits it into subpartitions at runtime (skew=true on the
    join node). Emulated locally by shrinking the skew thresholds; results
    must be identical with the optimization active."""
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 199_000, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        expected_n = len(left.join(right, "k").collect())

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
        j = left.join(right, "k")
        n = len(j.collect())  # collect executes THIS plan (count() plans its own)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert n == expected_n
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            saved["spark.sql.autoBroadcastJoinThreshold"],
        )
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            spark.conf.unset(k)


def test_scd2_point_lookup_clustered_fact_prunes(spark, sf_dir, tmp_path):
    """Round-7 VERDICT item 7, pinned: the SCD2 point lookup over a fact
    table range-clustered on the lookup key must (a) push the key filter
    to the parquet scan, (b) broadcast the sliced dimension (no fact
    shuffle), (c) actually skip most row groups (footer-measured), and
    (d) return the same rows as the unclustered plan."""
    from demo_bigdata_spark.operators.relational import scd2_merge
    from demo_bigdata_spark.sources.layout import (
        skipping_report,
        sort_for_skipping,
    )

    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("MACHINERY").alias("c_mktsegment"),
        F.lit("1996-01-01").alias("ts"),
    )
    versioned = scd2_merge(
        dim, updates, "c_custkey", ["c_mktsegment"], "ts"
    ).localCheckpoint(eager=True)

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("_d"),
    )
    path = str(tmp_path / "orders_by_cust")
    sort_for_skipping(orders, path, ["o_custkey"], n_files=8)
    facts = spark.read.parquet(path)

    hi = cust.agg(F.max("c_custkey")).first()[0]
    probes = [hi // 7, hi // 3, hi - 1]
    dim_slice = versioned.filter(versioned.c_custkey.isin(probes))
    point = (
        facts.filter(F.col("o_custkey").isin(probes))
        .join(
            F.broadcast(dim_slice),
            (F.col("o_custkey") == dim_slice.c_custkey)
            & (F.col("valid_from") <= F.col("_d"))
            & (dim_slice.valid_to.isNull() | (F.col("_d") < dim_slice.valid_to)),
        )
        .select("o_orderkey", "c_mktsegment")
    )
    plan = executed_plan(point)
    assert "BroadcastHashJoin" in plan, plan  # (b) no fact shuffle
    assert "PushedFilters: [In(o_custkey" in plan, plan  # (a) scan-level
    rep = skipping_report(spark, path, "o_custkey", probes)
    assert rep["skipped_frac"] > 0.5, rep  # (c) clustering pays

    # (d) same answer as the plain unclustered join
    plain = (
        orders.filter(F.col("o_custkey").isin(probes))
        .join(
            versioned,
            (F.col("o_custkey") == versioned.c_custkey)
            & (F.col("valid_from") <= F.col("_d"))
            & (versioned.valid_to.isNull() | (F.col("_d") < versioned.valid_to)),
        )
        .select("o_orderkey", "c_mktsegment")
    )
    assert sorted(map(tuple, point.collect())) == sorted(
        map(tuple, plain.collect())
    )
