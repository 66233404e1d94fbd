"""Iterative graph algorithms on DataFrames: weighted PageRank.

[EXT] Beyond the reference surface (the reference has no graph operators;
its closest shape is the entity top-k over events — services/
analytics-service/queries.py): link-style analysis over relationships the
engine's tables already encode (who-trades-with-whom, doc-cites-doc,
user-follows-user), implemented the way iterative algorithms belong on
Spark — a driver-side loop of declarative joins with a lineage cut per
iteration, never a collect of the graph.

Scale shape:
- The edge frame is normalized (out-weight joined in) ONCE, repartitioned
  by source and pinned; every iteration reuses that one co-partitioned
  artifact, so the per-iteration cost is one join keyed by src + one
  aggregate keyed by dst — no re-scan, no re-shuffle of the edges.
- Ranks are a (node, rank) frame; each iteration ends in an EAGER
  localCheckpoint — without the cut, iteration k's plan contains k copies
  of the join tree (the classic iterative-lineage explosion) and Catalyst
  re-optimizes an exponentially growing DAG. This is the Pregel/GraphX
  discipline expressed in DataFrames.
- Dangling mass (nodes with no out-edges) is folded back through a 1-row
  broadcast aggregate (the pct-of-total pattern, functions/scalar.py), so
  total mass stays conserved without any driver-side collect of ranks.

Cross-engine exactness: ranks are SCALED BIGINTS (initial mass
``scale // N`` per node) and every update is integer arithmetic —
``rank' = ((scale // N) * (den - num)) // den
        + (num * (contrib_sum + dangling // N)) // den``
with ``contrib(u->v) = (rank_u * w_uv) div wout_u``. Integer sums are
accumulation-order-free, and both engines floor-divide identically on
nonnegative operands, so a DuckDB oracle replays every iteration EXACTLY —
no float drift across iterations, the same money-in-cents discipline as
the revenue queries (ROUND_NOTES fact 5). Doubles only appear in the final
presentation column (one division), identical IEEE on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    damping: tuple[int, int] = (17, 20),
    scale: int = PAGERANK_SCALE,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank over ``edges`` restricted to the ``nodes``
    universe, in exact scaled-integer arithmetic (see module docstring).

    ``damping = (num, den)`` is the damping factor as a RATIONAL (17/20 =
    the standard 0.85) so the update stays integer-exact. Returns
    (node, rank) with rank a scaled bigint; ``rank / scale`` is the usual
    probability-like score. Nodes outside every edge still receive the
    teleport base plus their dangling share. ``iters`` is a fixed count —
    the deterministic, oracle-replayable form; convergence-threshold
    stopping is a trivial wrapper (loop until max |delta| < eps) that
    trades replayability for adaptivity."""
    num, den = damping
    n_nodes = nodes.count()  # bounded: the node universe is dimension-sized
    if n_nodes == 0:
        raise ValueError("pagerank: empty node universe")
    base = ((scale // n_nodes) * (den - num)) // den

    wout = edges.groupBy(src_col).agg(
        F.sum(F.col(weight_col)).cast("bigint").alias("_wout")
    )
    # normalize + co-partition the edges ONCE; every iteration reuses this
    en = (
        edges.join(wout, src_col)
        .select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            F.col(weight_col).cast("bigint").alias("_w"),
            "_wout",
        )
        .repartition(F.col("_src"))
        .localCheckpoint(eager=True)
    )
    out_nodes = wout.select(F.col(src_col).alias(node_col)).distinct()

    ranks = nodes.select(
        F.col(node_col), F.lit(scale // n_nodes).cast("bigint").alias("rank")
    ).localCheckpoint(eager=True)

    for _ in range(iters):
        contribs = (
            en.join(ranks, en["_src"] == ranks[node_col])
            .select(
                F.col("_dst").alias(node_col),
                F.expr("(rank * _w) div _wout").alias("_c"),
            )
            .groupBy(node_col)
            .agg(F.sum("_c").cast("bigint").alias("_s"))
        )
        dang = ranks.join(out_nodes, node_col, "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("bigint").alias("_dang")
        )
        ranks = (
            nodes.select(node_col)
            .crossJoin(F.broadcast(dang))
            .join(contribs, node_col, "left")
            .select(
                node_col,
                F.expr(
                    f"cast({base} as bigint) + ({num} * (coalesce(_s, 0)"
                    f" + _dang div {n_nodes})) div {den}"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # lineage cut: the iterative discipline
        )
    return ranks
