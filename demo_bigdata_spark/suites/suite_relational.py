"""Relational-tier [EXT] queries over the TPC-H-ish star schema (SURVEY.md
§2.5): joins (broadcast + shuffle), semi/anti, set ops, ranking/analytic/frame
windows, rollup/cube/grouping-sets, pivot, and the custom as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_bigdata_spark.functions.scalar import round_signsafe, round_signsafe_sql
from demo_bigdata_spark.operators import relational as R
from demo_bigdata_spark.sources.catalog import load_table

def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- TPC-H Q1: pricing summary (scan -> filter -> wide hash aggregate) ------

def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --- Multi-join revenue by nation (broadcast dims, shuffle fact joins) -------

def q_revenue_by_nation(spark, sf_dir):
    li, orders, cust = (_t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    nation, region = (_t(spark, sf_dir, n) for n in ("nation", "region"))
    # fact-fact: shuffle joins on their keys (AQE picks strategy);
    # nation/region: bounded dims -> broadcast (no shuffle of the fact side).
    facts = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    enriched = R.join_dim(
        R.join_dim(facts, nation, facts.c_nationkey == nation.n_nationkey),
        region,
        F.col("n_regionkey") == region.r_regionkey,
    )
    return (
        enriched.groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


SQL_REVENUE_BY_NATION = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""

# --- Top-k customers by revenue (join -> agg -> TakeOrderedAndProject) -------

def q_top_customers(spark, sf_dir):
    li, orders, cust = (_t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""

# --- TPC-H Q6-style: pure predicate aggregation (pushdown showcase) -----------

def q_tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# --- TPC-H Q4-style: semi-join with mixed equi + range condition ----------------

def q_late_shipment_orders(spark, sf_dir):
    orders, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 90)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_LATE_SHIPMENT_ORDERS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# --- Semi / anti joins --------------------------------------------------------

def q_segments_with_big_orders(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        R.semi_join(cust, big, cust.c_custkey == big.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SQL_SEGMENTS_WITH_BIG_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_customers_without_orders(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        R.anti_join(cust, orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_nationkey")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

# --- Set operations ------------------------------------------------------------

def _spenders(spark, sf_dir, year):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01"))
            & (F.col("o_totalprice") > 200000)
        )
        .select("o_custkey")
    )


def q_set_union(spark, sf_dir):
    return (
        _spenders(spark, sf_dir, 1997)
        .unionByName(_spenders(spark, sf_dir, 1998))
        .distinct()
        .orderBy("o_custkey")
    )


SQL_SET_UNION = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice > 200000
UNION
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' AND o_totalprice > 200000
ORDER BY o_custkey
"""


def q_set_intersect(spark, sf_dir):
    return _spenders(spark, sf_dir, 1997).intersect(_spenders(spark, sf_dir, 1998)).orderBy("o_custkey")


SQL_SET_INTERSECT = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice > 200000
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' AND o_totalprice > 200000
ORDER BY o_custkey
"""


def q_set_except(spark, sf_dir):
    # subtract == SQL EXCEPT (distinct); exceptAll would keep multiplicity
    return _spenders(spark, sf_dir, 1997).subtract(_spenders(spark, sf_dir, 1998)).orderBy("o_custkey")


SQL_SET_EXCEPT = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice > 200000
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' AND o_totalprice > 200000
ORDER BY o_custkey
"""

def q_set_intersect_all(spark, sf_dir):
    return (
        _spenders(spark, sf_dir, 1997)
        .intersectAll(_spenders(spark, sf_dir, 1998))
        .orderBy("o_custkey")
    )


SQL_SET_INTERSECT_ALL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice > 200000
INTERSECT ALL
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' AND o_totalprice > 200000
ORDER BY o_custkey
"""


def q_set_except_all(spark, sf_dir):
    return (
        _spenders(spark, sf_dir, 1997)
        .exceptAll(_spenders(spark, sf_dir, 1998))
        .orderBy("o_custkey")
    )


SQL_SET_EXCEPT_ALL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice > 200000
EXCEPT ALL
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' AND o_totalprice > 200000
ORDER BY o_custkey
"""

# --- MERGE/upsert emulation -----------------------------------------------------

def q_merge_upsert(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    updates = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("event_type", F.lit("error_resolved"))
        .withColumn("value", F.round(F.col("value") * 2, 2))
    )
    merged = R.merge_upsert(ev, updates, ["event_id"])
    return (
        merged.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_type")
    )


SQL_MERGE_UPSERT = """
WITH updates AS (
  SELECT event_id, ts, user_id, 'error_resolved' AS event_type,
         round(value * 2, 2) AS value, props
  FROM events WHERE event_type = 'error'
),
merged AS (
  SELECT * FROM events WHERE event_id NOT IN (SELECT event_id FROM updates)
  UNION ALL
  SELECT * FROM updates
)
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM merged
GROUP BY event_type
ORDER BY event_type
"""

# --- Skew-salted aggregation (identical results to direct groupBy) ----------------

def q_salted_aggregate(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = R.salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("sum_qty", 2).alias("sum_qty"),
        "min_qty",
        "max_qty",
    ).orderBy("l_returnflag")


SQL_SALTED_AGGREGATE = """
SELECT l_returnflag, count(l_quantity) AS n, round(sum(l_quantity), 2) AS sum_qty,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --- Window functions ------------------------------------------------------------

def q_top_orders_per_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return R.rank_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.col("o_orderkey")], k=2
    ).select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), F.col("rnk").cast("bigint").alias("rnk"))


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 2
"""


def q_running_revenue(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return R.running_aggregate(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        "o_totalprice",
        out_col="running_total",
    ).select(
        "o_custkey", "o_orderkey", F.round("running_total", 2).alias("running_total")
    )


SQL_RUNNING_REVENUE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


def q_order_gaps(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    lagged = R.with_lag(
        orders, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")],
        "o_orderdate", out_col="prev_date",
    )
    return lagged.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
    )


SQL_ORDER_GAPS = """
SELECT o_custkey, o_orderkey,
       datediff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate)::INT AS gap_days
FROM orders
"""

# --- RANGE frame: rolling 7-day revenue per customer -------------------------

def q_rolling_weekly_revenue(spark, sf_dir):
    """RANGE-framed window (vs running_revenue's ROWS frame): per customer,
    the sum of order totals in the 7 days up to and including each order's
    date. RANGE frames include all peers of the boundary values, so the
    result is deterministic even when a customer places several orders the
    same day — no tiebreak column needed in the frame ordering."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    w = Window.partitionBy("o_custkey").orderBy(days).rangeBetween(-7, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("weekly_revenue"),
    )


SQL_ROLLING_WEEKLY_REVENUE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2) AS weekly_revenue
FROM orders
"""

# --- first_value / last_value / nth_value ------------------------------------

def q_order_value_extremes(spark, sf_dir):
    """first_value/last_value/nth_value over the full per-customer frame
    (last_value needs the explicit unbounded-following frame or it sees
    only the running frame — a classic window gotcha, made explicit here)."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.first_value("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.last_value("o_totalprice").over(w), 2).alias("last_price"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
        )
    )


SQL_ORDER_VALUE_EXTREMES = """
SELECT o_custkey, o_orderkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER w, 2) AS last_price,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

# --- Argmin per group (TPC-H Q2 flavor: cheapest supplier per part) -------------------

def q_cheapest_supplier_per_part(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    best = R.rank_per_group(
        li,
        ["l_partkey"],
        [F.col("l_extendedprice"), F.col("l_suppkey"), F.col("l_orderkey"), F.col("l_linenumber")],
        k=1,
    )
    return best.select(
        "l_partkey",
        "l_suppkey",
        F.round("l_extendedprice", 2).alias("best_price"),
    ).orderBy("l_partkey")


SQL_CHEAPEST_SUPPLIER_PER_PART = """
SELECT l_partkey, l_suppkey, round(l_extendedprice, 2) AS best_price
FROM (
  SELECT l_partkey, l_suppkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_partkey
             ORDER BY l_extendedprice, l_suppkey, l_orderkey, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1
ORDER BY l_partkey
"""

# --- Outer joins --------------------------------------------------------------------

def q_left_join_order_counts(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        cust.join(counts, cust.c_custkey == counts.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


SQL_LEFT_JOIN_ORDER_COUNTS = """
SELECT c_custkey, c_mktsegment, coalesce(n_orders, 0) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def q_full_outer_nations(spark, sf_dir):
    cust, sup = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    c = cust.groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = sup.groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


SQL_FULL_OUTER_NATIONS = """
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
ORDER BY nationkey
"""

# --- TPC-H Q13-style: count-of-counts histogram over an outer join ---------------------

def q_order_count_histogram(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_ORDER_COUNT_HISTOGRAM = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# --- Analytic window distribution functions -------------------------------------------

def q_window_analytics(spark, sf_dir):
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


SQL_WINDOW_ANALYTICS = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""

# --- Correlation / covariance aggregates -----------------------------------------------

def q_correlations(spark, sf_dir):
    # covar_samp(l_discount, l_tax) is ~ -2.4e-07 for returnflag N: rounding
    # to 6dp lands on ZERO, and DuckDB keeps the negative sign (-0.0) while
    # Spark yields +0.0 — both correct, but byte-distinguishable. The
    # sign-safe round (x + 0.0) normalizes both twins to +0.0.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round_signsafe(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            round_signsafe(F.covar_samp("l_discount", "l_tax"), 6).alias(
                "covar_disc_tax"
            ),
        )
        .orderBy("l_returnflag")
    )


SQL_CORRELATIONS = f"""
SELECT l_returnflag,
       {round_signsafe_sql('corr(l_quantity, l_extendedprice)', 4)} AS corr_qty_price,
       {round_signsafe_sql('covar_samp(l_discount, l_tax)', 6)} AS covar_disc_tax
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --- Multi-dimensional aggregates --------------------------------------------------

def q_rollup_flags(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return R.rollup_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")],
    ).orderBy("l_returnflag", "l_linestatus")


SQL_ROLLUP_FLAGS = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_cube_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return R.cube_aggregate(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price")],
    ).orderBy("o_orderstatus", "o_orderpriority")


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def q_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""

# --- Pivot --------------------------------------------------------------------------

def q_pivot_linestatus(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pivoted = R.pivot_table(
        li, "l_returnflag", "l_linestatus", ["O", "F"], F.round(F.sum("l_quantity"), 2)
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O").alias("qty_o"),
        F.col("F").alias("qty_f"),
    ).orderBy("l_returnflag")


SQL_PIVOT_LINESTATUS = """
SELECT l_returnflag,
       round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_o,
       round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_f
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --- As-of join (custom operator; DuckDB twin is native ASOF JOIN) -------------------

def q_asof_purchase_click(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = R.asof_join(purchases, clicks, on="user_id", ts_col="ts", right_value_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.round("asof_value", 2).alias("last_click_value"),
    )


SQL_ASOF_PURCHASE_CLICK = """
SELECT p.event_id, p.user_id, round(c.value, 2) AS last_click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --- Unpivot / melt: wide metric columns -> long (metric, value) rows ---------

def q_unpivot_metrics(spark, sf_dir):
    """df.unpivot (SQL UNPIVOT / melt): lineitem's four measure columns to
    long form, then one aggregate per metric. Unpivot is a zero-shuffle
    projection (each input row emits 4 rows in place); the only shuffle is
    the 4-group aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("val"), 4).alias("avg_val"),
            F.round(F.max("val"), 2).alias("max_val"),
        )
        .orderBy("l_returnflag", "metric")
    )


SQL_UNPIVOT_METRICS = """
WITH long AS (
  SELECT l_returnflag, metric, val
  FROM (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem)
  UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
)
SELECT l_returnflag, metric, count(*) AS n,
       round(avg(val), 4) AS avg_val, round(max(val), 2) AS max_val
FROM long
GROUP BY l_returnflag, metric
ORDER BY l_returnflag, metric
"""

# --- Bucketed range join: clicks inside per-user incident windows -------------

def q_events_in_windows(spark, sf_dir):
    """Point-in-interval range join via coarse-bucket equi-join (operator:
    relational.bucketed_range_join): each 'error' event opens a 30-minute
    per-user window; count the user's clicks inside it. A bare inequality
    join would be a per-key nested loop; bucketing makes it a hash join on
    (user_id, bucket) + exact refine — linear in both inputs."""
    ev = _t(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    j = R.bucketed_range_join(
        clicks, windows, "ts", "lo", "hi", keys=["user_id"], bucket_seconds=1800
    )
    return (
        j.groupBy("win_id")
        .agg(F.count("*").alias("n_clicks"), F.round(F.sum("value"), 2).alias("click_value"))
        .orderBy("win_id")
    )


SQL_EVENTS_IN_WINDOWS = """
SELECT w.win_id, count(*) AS n_clicks, round(sum(p.value), 2) AS click_value
FROM (SELECT event_id AS win_id, user_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi
      FROM events WHERE event_type = 'error') w
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') p
  ON p.user_id = w.user_id AND p.ts >= w.lo AND p.ts <= w.hi
GROUP BY w.win_id
ORDER BY w.win_id
"""

# --- TPC-H Q2-style: correlated min-per-group subquery, keeping ties ---------

def q_min_price_supplier(spark, sf_dir):
    """TPC-H Q2-style correlated subquery: for each part, the EUROPE
    supplier(s) offering the minimum price (lineitem stands in for partsupp;
    ties kept, unlike rank_per_group's row_number). The correlated
    `= (SELECT min(..) WHERE same part)` is expressed Spark-first as a window
    min over the part partition — one shuffle on l_partkey, no self-join.
    nation/region are fixed-size (25/5 rows) -> broadcast; supplier scales
    with SF -> left to AQE (broadcasts at test SF, shuffles at cluster SF)."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = li.join(eu_supp, li.l_suppkey == eu_supp.s_suppkey)
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("min_price", F.min("l_extendedprice").over(w)).filter(
        F.col("l_extendedprice") == F.col("min_price")
    )
    part = _t(spark, sf_dir, "part")
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("min_price", 2).alias("min_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


SQL_MIN_PRICE_SUPPLIER = """
WITH eu_offers AS (
  SELECT l.l_partkey, l.l_extendedprice, s.s_name, s.s_acctbal, n.n_name
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT round(o.s_acctbal, 2) AS s_acctbal, o.s_name, o.n_name,
       p.p_partkey, p.p_type, round(o.l_extendedprice, 2) AS min_price
FROM eu_offers o
JOIN part p ON o.l_partkey = p.p_partkey
WHERE o.l_extendedprice = (
  SELECT min(o2.l_extendedprice) FROM eu_offers o2 WHERE o2.l_partkey = o.l_partkey
)
ORDER BY p.p_partkey, o.s_name
"""

# --- TPC-H Q15-style: view-over-aggregate, suppliers at the max --------------

def q_top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15-style: a revenue 'view' (per-supplier quarter aggregate),
    then the supplier(s) whose revenue equals the global max. The scalar max
    is a 1-row aggregate broadcast back onto the view — no global sort, no
    single-partition window. Revenue is rounded before the equality so the
    comparison is stable against float summation-order noise."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("max_rev"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_TOP_REVENUE_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


# --- TPC-H Q3-style: shipping priority (3-way join -> agg -> top-k) ----------

def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3: unshipped-order revenue by order, top 10. Both joins are
    key-equi on the fact keys — AQE picks broadcast at small SF, shuffle at
    cluster SF; the final top-k is TakeOrderedAndProject (no global sort)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""

# --- TPC-H Q19-style: disjunction of conjunctions, single scan ---------------

def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs over part x lineitem. The per-branch
    lineitem predicates (quantity bands) are OR-able and push to the scan;
    the part-side predicates filter the build side before the join. One
    scan each, one join, no union-of-three-plans."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    branch1 = (F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (
        F.col("p_size").between(1, 5)
    )
    branch2 = (F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 20)) & (
        F.col("p_size").between(1, 10)
    )
    branch3 = (F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 30)) & (
        F.col("p_size").between(1, 15)
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


SQL_DISJUNCTIVE_REVENUE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
"""


# --- TPC-H Q14-style: conditional-share aggregation over a join --------------

def q_promo_share(spark, sf_dir):
    """TPC-H Q14: share of revenue from PROMO parts in one quarter — the
    conditional-numerator / unconditional-denominator single-pass shape
    (no second scan, no self-join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # integer 1/10000ths revenue, exact bigint sums, one division — see
    # q_market_share for the cross-engine float rationale
    rev10k = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                (
                    100
                    * F.sum(F.when(F.col("p_type") == "PROMO", rev10k).otherwise(F.lit(0)))
                )
                / F.sum(rev10k)
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


SQL_PROMO_SHARE = """
SELECT 100 * sum(CASE WHEN p.p_type = 'PROMO'
                      THEN round(l.l_extendedprice * 100)::BIGINT * round((1 - l.l_discount) * 100)::BIGINT
                      ELSE 0 END)
           / sum(round(l.l_extendedprice * 100)::BIGINT * round((1 - l.l_discount) * 100)::BIGINT)
       AS promo_share_pct,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
"""


# --- TPC-H Q5-style: local supplier volume (join cycle with nation equality) --

def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue per nation where the customer and the supplier share
    the nation, ASIA region, one order-year. The c_nationkey = s_nationkey
    cycle is expressed as a post-join filter on the already-joined facts (no
    extra join); nation/region are bounded dims -> broadcast, so the only
    shuffles are the fact-fact key joins (lineitem-orders, orders-customer,
    lineitem-supplier), each on its own key."""
    li, orders, cust = (_t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    supp = _t(spark, sf_dir, "supplier")
    nation, region = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    facts = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    enriched = facts.join(
        F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
    ).join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == region.r_regionkey,
    )
    return (
        enriched.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

# --- TPC-H Q7-style: volume shipping between a nation pair, by ship year -----

def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations per ship-year.
    The disjunctive nation-pair predicate is applied on the raw int keys
    before the dim joins, so the fact side is pruned early (predicate
    pushdown on s_nationkey/c_nationkey); the two nation-name lookups are
    broadcast joins against the 25-row dim aliased twice."""
    li, orders, cust = (_t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = ((F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2)) | (
        (F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1)
    )
    facts = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(pair)
    )
    return (
        facts.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_nationkey = 1 AND n2.n_nationkey = 2) OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# --- TPC-H Q8-style: national market share within a region/type segment ------

def q_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_3 suppliers' share of ECONOMY-part revenue sold to
    region-1 customers, per order year. Single pass: conditional numerator /
    unconditional denominator inside one aggregate (same shape as promo_share,
    but over a 5-way join with the share keyed by the supplier's nation)."""
    li, orders, cust = (_t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    # revenue in integer 1/10000ths (prices/discounts have exactly 2dp):
    # bigint sums are order-independent, so both ratio operands are exact and
    # the single bigint/bigint division is bit-identical across engines
    # (ROUND_NOTES fact 5 — a double-sum ratio flips round()'s .xxxx5
    # boundary between Spark and DuckDB at some scale factor)
    vol10k = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    facts = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 1)),
            F.col("c_nationkey") == nation.n_nationkey,
        )
    )
    return (
        facts.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("s_nationkey") == 3, vol10k).otherwise(F.lit(0))
                )
                / F.sum(vol10k)
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_year")
    )


SQL_MARKET_SHARE = """
SELECT year(o_orderdate) AS o_year,
       sum(CASE WHEN s_nationkey = 3
                THEN round(l_extendedprice * 100)::BIGINT * round((1 - l_discount) * 100)::BIGINT
                ELSE 0 END)
           / sum(round(l_extendedprice * 100)::BIGINT * round((1 - l_discount) * 100)::BIGINT)
       AS mkt_share,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
WHERE p_type = 'ECONOMY' AND n_regionkey = 1
GROUP BY o_year
ORDER BY o_year
"""

# --- TPC-H Q10-style: returned-item losses, top customers --------------------

def q_returned_item_losses(spark, sf_dir):
    """TPC-H Q10: top-20 customers by revenue on returned (flag 'R') items in
    one quarter. Filters reach both scans before the joins; the final top-k
    is TakeOrderedAndProject over the aggregate, not a global sort."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_RETURNED_ITEM_LOSSES = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# --- TPC-H Q11-style: important parts vs a global-share threshold ------------

def q_important_parts(spark, sf_dir):
    """TPC-H Q11: per-part value from a 3-nation supplier group, keeping
    parts above 0.1% of the group's total. The grouped 'view' is computed
    once; the global total is a 1-row aggregate of it broadcast back for the
    HAVING comparison (no second scan of lineitem, no single-partition
    window). Prices/discounts carry exactly 2 decimal places, so the value
    is computed in integer 1/10000ths (bigint sums are order-independent —
    a double sum is not, and its last-ULP noise flips round()'s .xx5
    boundary between engines); the 0.1% HAVING is likewise compared in
    integer space."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey").isin(1, 2, 3))
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    pv = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("v10k"))
    )
    total = pv.agg(F.sum("v10k").alias("total10k"))
    return (
        pv.join(F.broadcast(total), pv.v10k * 1000 > F.col("total10k"))
        .select("l_partkey", F.round(F.col("v10k") / 10000.0, 2).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


SQL_IMPORTANT_PARTS = """
WITH pv AS (
  SELECT l_partkey,
         sum(round(l_extendedprice * 100)::BIGINT * round((1 - l_discount) * 100)::BIGINT) AS v10k
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey IN (1, 2, 3)
  GROUP BY l_partkey
)
SELECT l_partkey, round(v10k / 10000.0, 2) AS value
FROM pv
WHERE v10k * 1000 > (SELECT sum(v10k) FROM pv)
ORDER BY value DESC, l_partkey
"""

# --- TPC-H Q17-style: small-quantity orders vs per-part average --------------

def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from Brand#5 line items whose quantity is below
    half the part's average quantity. The correlated per-part AVG subquery
    is a window average over l_partkey — one shuffle, no self-join (the
    textbook plan joins lineitem to a per-part aggregate of itself). The
    brand filter shrinks the window input first via a broadcast-able part
    dim join."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5").select("p_partkey")
    branded = li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    small = branded.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    # exact bigint cents sum, one division (sum(double)/7 rounds an
    # order-dependent float — ROUND_NOTES fact 5)
    return small.agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) / 700.0, 2
        ).alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


SQL_SMALL_QUANTITY_REVENUE = """
SELECT round(sum(round(l_extendedprice * 100)::BIGINT) / 700.0, 2) AS avg_yearly,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""

# --- TPC-H Q18-style: large-volume orders --------------------------------------

def q_large_volume_orders(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 150, with their
    customer. lineitem is pre-aggregated to one row per order BEFORE the
    joins (the HAVING prunes ~95% of orders), so the join input is the small
    filtered aggregate, not the raw fact."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders, cust = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


SQL_LARGE_VOLUME_ORDERS = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

# --- TPC-H Q9-style: product-line profit by nation and year ------------------

def q_product_profit(spark, sf_dir):
    """TPC-H Q9: per-nation, per-year profit on 'widget' parts. Profit uses
    p_retailprice*l_quantity*0.6 as the cost stand-in (no partsupp table in
    the corpus). Part filter prunes the build side before the join; nation
    is broadcast; orders joins only to supply the year."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


SQL_PRODUCT_PROFIT = """
SELECT n_name, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity), 2)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""

# --- TPC-H Q16-style: supplier diversity per part attribute ------------------

def q_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16: distinct suppliers per (brand, size) over the lineitem
    association (partsupp stand-in), excluding one brand, PROMO types, and
    negative-balance suppliers. The NOT IN over a never-null key is a
    left_anti join (broadcast: the exclusion list is tiny); countDistinct
    shuffles on the already-filtered pairs."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


SQL_PARTS_SUPPLIER_COUNTS = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""

# --- TPC-H Q20-style: semi-join over an aggregate-with-having ----------------

def q_heavy_widget_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who moved > 100 units of some single
    widget part — a HAVING aggregate feeding a semi-join. The aggregate runs
    on the pruned (supp, part) pairs first, so the semi-join probe side is
    tiny; supplier/nation enrichment happens after the semi-join, not
    before."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


SQL_HEAVY_WIDGET_SUPPLIERS = """
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%widget%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_suppkey
"""

# --- TPC-H Q22-style: wealthy lapsed customers (anti-join + scalar avg) ------

def q_lapsed_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers whose balance exceeds the average positive
    balance and who placed no order since 1999, grouped by nation. The
    scalar average is a 1-row aggregate broadcast into the filter; the
    NOT EXISTS is a left_anti join against the date-filtered orders (filter
    pushed below the anti-join build side)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal), cust.c_acctbal > F.col("avg_bal")).drop("avg_bal")
    recent = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01")).select("o_custkey")
    lapsed = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return (
        lapsed.groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


SQL_LAPSED_CUSTOMERS = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- SCD2 dimension maintenance (operator: relational.scd2_merge) -------------


def q_scd2_merge(spark, sf_dir):
    """Type-2 slowly-changing dimension update: a deltas batch moves every
    10th customer to the MACHINERY segment as of 2024-01-01 — changed keys
    get their open row closed + a new open row, customers already in
    MACHINERY are exercised as the no-op path, everyone else passes
    through. The oracle replays close/insert/no-op set algebra directly."""
    from demo_bigdata_spark.operators.relational import scd2_merge

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("MACHINERY").alias("c_mktsegment"),
        F.lit("2024-01-01").alias("ts"),
    )
    return scd2_merge(
        dim, updates, "c_custkey", ["c_mktsegment"], "ts"
    ).orderBy("c_custkey", "valid_from")


SQL_SCD2_MERGE = """
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         '1990-01-01' AS valid_from, NULL::VARCHAR AS valid_to
  FROM customer
),
changed AS (
  SELECT c_custkey FROM dim
  WHERE c_custkey % 10 = 0 AND c_mktsegment <> 'MACHINERY'
)
SELECT c_custkey, c_mktsegment, valid_from, valid_to
FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT d.c_custkey, d.c_mktsegment, d.valid_from, '2024-01-01'
FROM dim d JOIN changed USING (c_custkey)
UNION ALL
SELECT c_custkey, 'MACHINERY', '2024-01-01', NULL::VARCHAR
FROM changed
ORDER BY c_custkey, valid_from
"""



def q_scd2_point_lookup(spark, sf_dir):
    """Point-in-time join against the versioned dimension: each order picks
    the customer segment VALID AT its order date (valid_from <= d <
    valid_to, open row = infinity), then revenue rolls up by that
    historical segment. Versions per key are bounded (2 here), so the
    temporal lookup is a plain equi-join on the key plus a validity
    filter — no range-join machinery, no row explosion. The canonical
    'report as of the facts' warehouse query over scd2_merge output."""
    from demo_bigdata_spark.operators.relational import scd2_merge

    cust = _t(spark, sf_dir, "customer")
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
    versioned = scd2_merge(dim, updates, "c_custkey", ["c_mktsegment"], "ts")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("_d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_cents"),
    )
    joined = orders.join(
        versioned, orders.o_custkey == versioned.c_custkey
    ).filter(
        (F.col("_d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("_d") < F.col("valid_to")))
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("_cents").alias("revenue_cents"),
        )
        .orderBy("c_mktsegment")
    )


SQL_SCD2_POINT_LOOKUP = """
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         '1990-01-01' AS valid_from, NULL::VARCHAR AS valid_to
  FROM customer
),
changed AS (
  SELECT c_custkey FROM dim
  WHERE c_custkey % 10 = 0 AND c_mktsegment <> 'MACHINERY'
),
versioned AS (
  SELECT c_custkey, c_mktsegment, valid_from, valid_to
  FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, '1996-01-01'
  FROM dim d JOIN changed USING (c_custkey)
  UNION ALL
  SELECT c_custkey, 'MACHINERY', '1996-01-01', NULL::VARCHAR FROM changed
),
o AS (
  SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
)
SELECT v.c_mktsegment,
       count(*) AS n_orders,
       sum(cents)::BIGINT AS revenue_cents
FROM o JOIN versioned v ON o.o_custkey = v.c_custkey
WHERE o.d >= v.valid_from AND (v.valid_to IS NULL OR o.d < v.valid_to)
GROUP BY v.c_mktsegment
ORDER BY v.c_mktsegment
"""




def q_zorder_keys(spark, sf_dir):
    """Z-order (Morton) clustering keys over (l_partkey, l_suppkey) —
    the multi-dimension data-skipping layout (sources.layout.zorder_sort):
    the interleaved key is pure statically-unrolled bit arithmetic, so the
    oracle replays it bit for bit. Emits per-returnflag key checksums plus
    the curve extremes — the full key column verified without shipping a
    lineitem-sized result."""
    from demo_bigdata_spark.sources.layout import morton_key

    li = _t(spark, sf_dir, "lineitem")
    z = li.select(
        "l_returnflag",
        morton_key([F.col("l_partkey"), F.col("l_suppkey")], bits=16).alias("_z"),
    )
    return (
        z.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_z").alias("z_sum"),
            F.min("_z").alias("z_min"),
            F.max("_z").alias("z_max"),
        )
        .orderBy("l_returnflag")
    )


def _sql_morton(col_a: str, col_b: str, bits: int = 16) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({col_a} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({col_b} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


SQL_ZORDER_KEYS = f"""
WITH z AS (
  SELECT l_returnflag, ({_sql_morton('l_partkey', 'l_suppkey')})::BIGINT AS zk
  FROM lineitem
)
SELECT l_returnflag, count(*) AS n_rows, sum(zk)::BIGINT AS z_sum,
       min(zk) AS z_min, max(zk) AS z_max
FROM z GROUP BY l_returnflag ORDER BY l_returnflag
"""




def q_waiting_suppliers(spark, sf_dir):
    """TPC-H q21 analog (suppliers who kept orders waiting) on the
    available columns: for multi-supplier orders where EXACTLY ONE
    supplier shipped late (>90 days after the order date), blame that
    supplier; count blamed orders per supplier, top 20.

    Spark-first decorrelation: the classic EXISTS / NOT-EXISTS pair
    becomes one per-order aggregate (distinct suppliers, distinct LATE
    suppliers) + a semi join — no correlated-subquery rewrite machinery,
    one shuffle keyed by order, one by supplier. The oracle replays the
    identical aggregate formulation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias(
                "_late"
            ),
        )
        .localCheckpoint(eager=False)  # feeds the order profile AND the blame join
    )
    profile = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("_ns"),
        F.count_distinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_nlate"),
    )
    target = profile.filter((F.col("_ns") >= 2) & (F.col("_nlate") == 1)).select(
        "l_orderkey"
    )
    blamed = (
        lines.filter(F.col("_late"))
        .join(target, "l_orderkey", "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_waiting_orders"))
        .join(supp, blamed.l_suppkey == supp.s_suppkey)
        .select("s_name", "n_waiting_orders")
        .orderBy(F.desc("n_waiting_orders"), F.asc("s_name"))
        .limit(20)
    )


SQL_WAITING_SUPPLIERS = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
profile AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
  FROM lines GROUP BY l_orderkey
),
blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lines l JOIN profile p USING (l_orderkey)
  WHERE l.late AND p.ns >= 2 AND p.nlate = 1
)
SELECT s_name, count(*)::BIGINT AS n_waiting_orders
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY n_waiting_orders DESC, s_name ASC
LIMIT 20
"""


def q_priority_shipping(spark, sf_dir):
    """TPC-H Q12 analog on the reduced schema (no l_shipmode/receiptdate:
    l_returnflag stands in for the ship mode): lines shipped in 1997,
    split per flag into high- vs low-priority order line counts. Fact-fact
    equi-join on the order key; the priority CASE folds inside the
    aggregate, so the join output never widens past the two keys."""
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_PRIORITY_SHIPPING = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- Weighted PageRank over the nation trade graph (operators/graph.py) -----

PAGERANK_ITERS = 10


def q_nation_pagerank(spark, sf_dir):
    """Iterative weighted PageRank (operator: graph.pagerank) over the
    customer-nation -> supplier-nation trade graph (edge weight = lineitem
    count between the pair, derived from lineitem x orders x customer x
    supplier). Ten damped iterations in exact scaled-integer arithmetic
    (rank bigints, 17/20 damping, dangling mass redistributed), so the
    DuckDB oracle replays every iteration bit-exactly through ten unrolled
    CTE levels — no float drift. The iteration itself is the Spark-first
    shape: one pinned co-partitioned edge frame reused per step, a
    lineage cut per iteration, dangling mass via a 1-row broadcast."""
    from demo_bigdata_spark.operators.graph import PAGERANK_SCALE, pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    ranks = pagerank(nodes, edges, iters=PAGERANK_ITERS)
    return (
        ranks.join(n, ranks["node"] == n["n_nationkey"])
        .select(
            F.col("node").cast("bigint").alias("nation_key"),
            F.col("n_name").alias("nation"),
            F.col("rank"),
            (F.col("rank") / F.lit(float(PAGERANK_SCALE))).alias("score"),
        )
        .orderBy(F.desc("rank"), "nation_key")
    )


def _pagerank_sql(iters: int, seed: int | None = None) -> str:
    """Unrolled integer-exact PageRank oracle: one CTE level per
    iteration replaying graph.pagerank's update rule verbatim (DuckDB
    ``//`` == Spark ``div`` on nonnegative bigints). ``seed`` switches to
    the personalized form (teleport flag multiplies inside the shared
    update expression, n_tele = 1, exactly graph.pagerank's sources=
    path). Every iteration level MUST be MATERIALIZED: each is referenced
    twice (dangling + contribution), so un-materialized CTEs re-expand
    exponentially and the oracle never finishes."""
    scale = 10**12
    if seed is None:
        t_expr, n_t, r0_rank = "1", "cnt.n", f"({scale} // cnt.n)"
    else:
        t_expr = f"(CASE WHEN n.node = {seed} THEN 1 ELSE 0 END)"
        n_t = "1"
        r0_rank = f"(CASE WHEN node = {seed} THEN {scale} ELSE 0 END)"
    levels = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        levels.append(
            f"""d{i} AS MATERIALIZED (
  SELECT coalesce(sum(rank), 0)::BIGINT AS dang
  FROM {prev} WHERE node NOT IN (SELECT src FROM wout)
),
r{i} AS MATERIALIZED (
  SELECT n.node,
         ({t_expr} * ((({scale} // {n_t}) * 3) // 20)
          + (17 * (coalesce(c.s, 0) + {t_expr} * (d{i}.dang // {n_t}))) // 20)::BIGINT AS rank
  FROM nodes n
  CROSS JOIN cnt
  CROSS JOIN d{i}
  LEFT JOIN (
    SELECT e.dst AS node, sum((r.rank * e.w) // e.wout)::BIGINT AS s
    FROM en e JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) c USING (node)
)"""
        )
    unrolled = ",\n".join(levels)
    return f"""
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*)::BIGINT AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nodes AS (SELECT n_nationkey AS node FROM nation),
cnt AS (SELECT count(*)::BIGINT AS n FROM nodes),
wout AS (SELECT src, sum(w)::BIGINT AS wout FROM edges GROUP BY src),
en AS MATERIALIZED (SELECT e.src, e.dst, e.w, wo.wout FROM edges e JOIN wout wo USING (src)),
r0 AS MATERIALIZED (SELECT node, {r0_rank}::BIGINT AS rank FROM nodes CROSS JOIN cnt),
{unrolled}
SELECT r.node::BIGINT AS nation_key, n.n_name AS nation, r.rank,
       r.rank / {float(scale)} AS score
FROM r{iters} r JOIN nation n ON r.node = n.n_nationkey
ORDER BY r.rank DESC, nation_key
"""


SQL_NATION_PAGERANK = _pagerank_sql(PAGERANK_ITERS)

PPR_SEED_NATION = 0


def q_nation_ppr(spark, sf_dir):
    """Personalized PageRank (graph.pagerank with sources=) from one seed
    nation over the same trade graph: teleport mass and dangling
    redistribution land only on the seed, so ranks measure trade
    proximity TO it rather than global centrality. Identical integer
    arithmetic and unrolled-CTE oracle as nation_pagerank, with the
    teleport flag folded into the shared update expression."""
    from demo_bigdata_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    seeds = n.filter(F.col("n_nationkey") == PPR_SEED_NATION).select(
        F.col("n_nationkey").alias("node")
    )
    ranks = pagerank(nodes, edges, iters=PAGERANK_ITERS, sources=seeds)
    return (
        ranks.join(n, ranks["node"] == n["n_nationkey"])
        .select(
            F.col("node").cast("bigint").alias("nation_key"),
            F.col("n_name").alias("nation"),
            F.col("rank"),
            (F.col("rank") / F.lit(float(10**12))).alias("score"),
        )
        .orderBy(F.desc("rank"), "nation_key")
    )


SQL_NATION_PPR = _pagerank_sql(PAGERANK_ITERS, seed=PPR_SEED_NATION)


def q_trade_triangles(spark, sf_dir):
    """Per-nation triangle counts (operator: graph.triangle_counts) over
    the undirected simple trade graph — the local-clustering signal:
    ordered-pair canonicalization, (a,b)x(b,c) equi-join semi-joined
    against (a,c), three exploded corners aggregated. Exact integers; the
    oracle replays the same three joins in SQL."""
    from demo_bigdata_spark.operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
    )
    tc = triangle_counts(edges)
    return (
        tc.join(n, tc["node"] == n["n_nationkey"])
        .select(
            F.col("node").cast("bigint").alias("nation_key"),
            F.col("n_name").alias("nation"),
            "n_triangles",
        )
        .orderBy(F.desc("n_triangles"), "nation_key")
    )


SQL_TRADE_TRIANGLES = """
WITH raw AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw
  WHERE src <> dst
),
tris AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  WHERE EXISTS (SELECT 1 FROM und e3 WHERE e3.a = e1.a AND e3.b = e2.b)
),
corners AS (
  SELECT x AS node FROM tris
  UNION ALL SELECT y FROM tris
  UNION ALL SELECT z FROM tris
)
SELECT n.n_nationkey::BIGINT AS nation_key, n.n_name AS nation,
       count(*)::BIGINT AS n_triangles
FROM corners c JOIN nation n ON c.node = n.n_nationkey
GROUP BY 1, 2
ORDER BY n_triangles DESC, nation_key
"""


QUERIES = {
    "set_intersect": (q_set_intersect, SQL_SET_INTERSECT),
    "set_except": (q_set_except, SQL_SET_EXCEPT),
    "set_intersect_all": (q_set_intersect_all, SQL_SET_INTERSECT_ALL),
    "top_orders_per_customer": (q_top_orders_per_customer, SQL_TOP_ORDERS_PER_CUSTOMER),
    "full_outer_nations": (q_full_outer_nations, SQL_FULL_OUTER_NATIONS),
    "order_count_histogram": (q_order_count_histogram, SQL_ORDER_COUNT_HISTOGRAM),
    "cheapest_supplier_per_part": (q_cheapest_supplier_per_part, SQL_CHEAPEST_SUPPLIER_PER_PART),
    "correlations": (q_correlations, SQL_CORRELATIONS),
    "rolling_weekly_revenue": (q_rolling_weekly_revenue, SQL_ROLLING_WEEKLY_REVENUE),
    "order_value_extremes": (q_order_value_extremes, SQL_ORDER_VALUE_EXTREMES),
    "order_gaps": (q_order_gaps, SQL_ORDER_GAPS),
    "rollup_flags": (q_rollup_flags, SQL_ROLLUP_FLAGS),
    "cube_orders": (q_cube_orders, SQL_CUBE_ORDERS),
    "min_price_supplier": (q_min_price_supplier, SQL_MIN_PRICE_SUPPLIER),
    "top_revenue_supplier": (q_top_revenue_supplier, SQL_TOP_REVENUE_SUPPLIER),
    "waiting_suppliers": (q_waiting_suppliers, SQL_WAITING_SUPPLIERS),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "nation_pagerank": (q_nation_pagerank, SQL_NATION_PAGERANK),
    "nation_ppr": (q_nation_ppr, SQL_NATION_PPR),
    "trade_triangles": (q_trade_triangles, SQL_TRADE_TRIANGLES),
    "priority_shipping": (q_priority_shipping, SQL_PRIORITY_SHIPPING),
    "local_supplier_volume": (q_local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME),
    "volume_shipping": (q_volume_shipping, SQL_VOLUME_SHIPPING),
    "market_share": (q_market_share, SQL_MARKET_SHARE),
    "returned_item_losses": (q_returned_item_losses, SQL_RETURNED_ITEM_LOSSES),
    "important_parts": (q_important_parts, SQL_IMPORTANT_PARTS),
    "small_quantity_revenue": (q_small_quantity_revenue, SQL_SMALL_QUANTITY_REVENUE),
    "large_volume_orders": (q_large_volume_orders, SQL_LARGE_VOLUME_ORDERS),
    "lapsed_customers": (q_lapsed_customers, SQL_LAPSED_CUSTOMERS),
    "product_profit": (q_product_profit, SQL_PRODUCT_PROFIT),
    "parts_supplier_counts": (q_parts_supplier_counts, SQL_PARTS_SUPPLIER_COUNTS),
    "heavy_widget_suppliers": (q_heavy_widget_suppliers, SQL_HEAVY_WIDGET_SUPPLIERS),
    "promo_share": (q_promo_share, SQL_PROMO_SHARE),
    "shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "disjunctive_revenue": (q_disjunctive_revenue, SQL_DISJUNCTIVE_REVENUE),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "late_shipment_orders": (q_late_shipment_orders, SQL_LATE_SHIPMENT_ORDERS),
    "revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "segments_with_big_orders": (q_segments_with_big_orders, SQL_SEGMENTS_WITH_BIG_ORDERS),
    "customers_without_orders": (q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS),
    "set_union": (q_set_union, SQL_SET_UNION),
    "set_except_all": (q_set_except_all, SQL_SET_EXCEPT_ALL),
    "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
    "salted_aggregate": (q_salted_aggregate, SQL_SALTED_AGGREGATE),
    "left_join_order_counts": (q_left_join_order_counts, SQL_LEFT_JOIN_ORDER_COUNTS),
    "window_analytics": (q_window_analytics, SQL_WINDOW_ANALYTICS),
    "running_revenue": (q_running_revenue, SQL_RUNNING_REVENUE),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "pivot_linestatus": (q_pivot_linestatus, SQL_PIVOT_LINESTATUS),
    "asof_purchase_click": (q_asof_purchase_click, SQL_ASOF_PURCHASE_CLICK),
    "events_in_windows": (q_events_in_windows, SQL_EVENTS_IN_WINDOWS),
    "unpivot_metrics": (q_unpivot_metrics, SQL_UNPIVOT_METRICS),
}
