"""Deterministic, hash-based sampling / splitting for training-data pipelines.

`df.sample()` is seed-dependent per partition layout, so the same logical
corpus can sample differently across runs, engines, or repartitions. A
large-scale corpus pipeline wants *content-addressed* sampling instead: a
document's fate depends only on its key, so samples are reproducible,
join-stable across tables sharing the key, and identical on any engine
(which is also what makes these ops DuckDB-oracle-checkable).

All ops are pure narrow column expressions over the scan — no shuffle, no
UDF, fully codegen'd — except the quota op, which is one hash shuffle on the
group key (TakeOrdered-per-group semantics).

Parity: reference has no sampling tier; this is part of the [EXT]
LLM-data-pipeline surface (SURVEY.md §2.8 note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 7 hex chars = 28 bits: small enough for an exact BIGINT everywhere,
# large enough that bucket skew at any corpus size is negligible.
_HEX_CHARS = 7


def hash_bucket(
    key: Column | str, n_buckets: int = 10_000, portable: bool = True
) -> Column:
    """Deterministic bucket in [0, n_buckets) from a hash of the key's string
    form. The default md5 is engine-portable (md5 is md5 everywhere), unlike
    hash()/xxhash64 whose seeds and algorithms differ between engines — the
    property the DuckDB oracle needs. ``portable=False`` switches to
    xxhash64 (Spark-deterministic, ~10x cheaper per row — the production
    path when no cross-engine replay is required); both paths are pure
    functions of the key, so samples stay reproducible and join-stable,
    they just select a different (equally unbiased) subset."""
    key = F.col(key) if isinstance(key, str) else key
    if portable:
        h = F.conv(F.substring(F.md5(key.cast("string")), 1, _HEX_CHARS), 16, 10)
        return F.pmod(h.cast("long"), F.lit(n_buckets))
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(n_buckets))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    n_buckets: int = 10_000,
    portable: bool = True,
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of buckets.
    Reproducible on any engine / partitioning; resolution is 1/n_buckets."""
    cutoff = int(round(fraction * n_buckets))
    return df.filter(hash_bucket(key_col, n_buckets, portable=portable) < cutoff)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    n_buckets: int = 10_000,
    split_col: str = "split",
) -> DataFrame:
    """Append a split label ('train'/'val'/'test', …) by cumulative bucket
    ranges. Weights must sum to 1. A key always lands in the same split —
    the property a train/test boundary must have across pipeline re-runs."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(key_col, n_buckets)
    expr = None
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w
        cond = b < int(round(cum * n_buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(splits[-1][0]) if expr is None else expr.otherwise(F.lit(splits[-1][0]))
    return df.withColumn(split_col, expr)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    n_shards: int = 1024,
    shard_col: str = "shard",
    pos_col: str = "pos",
    portable: bool = True,
) -> DataFrame:
    """[EXT] content-addressed global shuffle — the reproducible corpus
    permutation a pre-training run needs before sharding to data loaders.
    A row's place is a pure function of (salt, key): identical on any
    engine, partitioning, or rerun; a new ``salt`` is a fresh epoch-level
    reshuffle with zero state.

    Spark-first shape: the permutation is exposed as ``(shard, pos)`` —
    hash-shard the corpus (ONE shuffle on the shard key), then
    ``row_number`` within each shard ordered by the row's hash. Reading
    shards in index order replays the exact global permutation, but no
    stage ever runs a corpus-wide total sort or a single-partition window:
    per-shard volume is ~corpus/n_shards, so ``n_shards`` is the memory
    knob (thousands at bench scale, hundreds of thousands at 100 TB —
    conveniently also the training-side file-shard count).

    ``portable=False`` switches the hash to xxhash64 (the cheaper
    production path, same contract, not DuckDB-replayable)."""
    from pyspark.sql.window import Window

    key = F.col(key_col)
    if portable:
        h: Column = F.md5(F.concat(F.lit(salt), key.cast("string")))
    else:
        h = F.xxhash64(F.concat(F.lit(salt), key.cast("string"))).cast("string")
    shard = F.pmod(
        F.conv(F.substring(F.col("_h"), 1, _HEX_CHARS), 16, 10).cast("long")
        if portable
        else F.xxhash64(F.col("_h")),
        F.lit(n_shards),
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_h"), key)
    return (
        df.withColumn("_h", h)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("_h")
    )


def per_group_quota(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key_col: str,
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by the deterministic
    hash order of ``key_col`` (an unbiased, reproducible 'random' n —
    no seed, no partition-layout dependence). One shuffle on the group
    key; rank is computed partially per partition by AQE where possible."""
    from pyspark.sql.window import Window

    order = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    n_buckets: int = 10_000,
    portable: bool = True,
) -> DataFrame:
    """[EXT] per-stratum fractional sampling with explicit keep rates —
    the class-balancing step of a corpus build (e.g. downsample English to
    20%, keep every low-resource-language doc). Complements
    :func:`mixture_sample` (which derives rates from a row target) and
    :func:`per_group_quota` (exact n per group, needs a shuffle).

    Shape: ONE content-addressed hash-bucket filter — the per-stratum
    cutoff folds into a CASE on ``strata_col``, so there is no join, no
    window, and no shuffle; at 100 TB this is a map-only pass that
    Catalyst keeps inside the scan's WholeStageCodegen. Strata missing
    from ``fractions`` keep ``default_fraction`` of their rows. Which
    rows survive is a pure function of (stratum, key): reruns, engines,
    and partitionings agree row-for-row, and shrinking a fraction only
    ever drops a deterministic suffix of buckets (sample nesting)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"stratified_sample: fraction {v} for {k!r} not in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"stratified_sample: default_fraction {default_fraction} not in [0, 1]")
    cut = None
    for name in sorted(fractions):
        c = F.lit(int(round(fractions[name] * n_buckets)))
        cond = F.col(strata_col) == name
        cut = F.when(cond, c) if cut is None else cut.when(cond, c)
    default_cut = F.lit(int(round(default_fraction * n_buckets)))
    cut = default_cut if cut is None else cut.otherwise(default_cut)
    return df.filter(hash_bucket(key_col, n_buckets, portable=portable) < cut)


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_frac: float,
    key_col: str,
    ascending: bool = False,
) -> DataFrame:
    """[EXT] per-group quality-percentile filter: keep the best
    ``keep_frac`` of each group by ``score_col`` (the FineWeb/CCNet move —
    rank within each crawl dump/source and keep the top slice, so a strong
    source can't crowd out a weak one globally).

    Deterministic total order: (score, key hash) — equal scores are
    admitted in content-addressed hash order, never by partition layout.
    One shuffle on the group key; ``percent_rank`` needs no second pass
    (Spark computes the window in one sort per partition group). Skewed
    group sizes are the usual window caveat — groups here are sources
    (bounded cardinality), and a per-group sort at 100 TB is the same
    cost class as the salted-aggregate tier's documented shapes."""
    from pyspark.sql.window import Window

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"top_fraction_per_group: keep_frac {keep_frac} not in (0, 1]")
    score = F.col(score_col) if ascending else F.col(score_col).desc()
    tie = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(score, tie)
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_frac)
        .drop("_pr")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
    target_rows: int,
    n_buckets: int = 10_000,
) -> DataFrame:
    """[EXT] deterministic corpus mixing: downsample each source so the
    output approximates ``target_rows`` distributed by ``weights`` (the
    pre-training data-mixture step — e.g. web 0.6 / code 0.25 / papers
    0.15).

    Per-group keep-rate = min(1, weight*target/|group|), applied as a
    content-addressed hash-bucket cutoff (same md5 bucketing as
    hash_sample): which documents survive is a pure function of their key,
    so re-runs, engines, and partitionings agree row-for-row, and rates
    only ever drop a deterministic SUFFIX of buckets when targets shrink.
    Group sizes come from one count aggregate broadcast back onto the scan
    (groups = sources, a tiny dim); undersized groups keep everything
    (rate clamps at 1 — mixture weights are targets, not guarantees)."""
    sizes = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    wmap = F.create_map(
        *[x for k, w in sorted(weights.items()) for x in (F.lit(k), F.lit(float(w)))]
    )
    with_rate = df.join(F.broadcast(sizes), group_col).withColumn(
        "_cut",
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(wmap[F.col(group_col)], F.lit(0.0))
                * target_rows
                / F.col("_gn"),
            )
            * n_buckets
        ).cast("bigint"),
    )
    return with_rate.filter(hash_bucket(key_col, n_buckets) < F.col("_cut")).drop(
        "_gn", "_cut"
    )


def mixture_sample_weighted(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
    target_weight: float,
    weight_col: Column | str,
    n_buckets: int = 10_000,
) -> DataFrame:
    """[EXT] deterministic corpus mixing against a WEIGHT budget instead of a
    row budget — the form pre-training mixtures actually use (token budgets:
    "web 60% of 1T tokens"), since documents differ wildly in length.

    Per-group keep-rate = min(1, weight*target_weight / group_weight_sum)
    where group_weight_sum = sum(weight_col) over the group; the rate is
    applied as the same content-addressed hash-bucket cutoff as
    :func:`mixture_sample`, so WHICH documents survive is still a pure
    function of their key. The sampled weight per group then concentrates
    around its target by construction (documents land in buckets
    independently of their length). Undersized groups clamp at rate 1;
    zero-weight groups drop.
    """
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # weight must be an integral column (token/byte counts): exact bigint
    # sums are order-independent, which is what keeps rates deterministic
    # across partitionings AND replayable by the oracle. A fractional
    # column would be silently floored per row by the bigint cast (a 0.7
    # weight becomes 0), so reject it loudly instead.
    wdtype = df.select(wc.alias("_w")).schema[0].dataType.simpleString()
    if wdtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"weight_col must be integral (token counts), got {wdtype}; "
            "scale fractional weights to integers first"
        )
    sizes = df.groupBy(group_col).agg(
        # greatest(1): a group whose weights sum to 0 (all-empty docs) would
        # otherwise divide by zero -> Infinity -> rate clamps to keep-all
        F.greatest(F.sum(wc.cast("bigint")), F.lit(1)).alias("_gw")
    )
    wmap = F.create_map(
        *[x for k, w in sorted(weights.items()) for x in (F.lit(k), F.lit(float(w)))]
    )
    with_rate = df.join(F.broadcast(sizes), group_col).withColumn(
        "_cut",
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(wmap[F.col(group_col)], F.lit(0.0))
                * target_weight
                / F.col("_gw"),
            )
            * n_buckets
        ).cast("bigint"),
    )
    return with_rate.filter(hash_bucket(key_col, n_buckets) < F.col("_cut")).drop(
        "_gw", "_cut"
    )


def mixture_sample_repeat(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
    target_rows: int,
    n_buckets: int = 10_000,
    max_repeat: int = 16,
) -> DataFrame:
    """[EXT] mixture sampling WITHOUT the rate-1 clamp: a group whose target
    exceeds its size is UPSAMPLED by repetition — the standard pre-training
    treatment of scarce high-quality sources (weights say 30% but the
    source holds 3% of the corpus: every doc repeats ~10x).

    rate = weight*target/|group|; every doc is emitted floor(rate) times,
    plus one more copy when its hash bucket falls under the fractional
    remainder — so repetition is content-addressed and deterministic like
    every other sampler here, and expected group size = weight*target
    exactly. Output rows carry ``epoch`` (0-based copy index): downstream
    packing/shuffling can spread copies across the token stream.
    ``max_repeat`` guards against a degenerate weight blowing a tiny group
    into the corpus (raise deliberately when a 100x repeat is intended).

    Scale shape: one tiny count aggregate broadcast back, then a narrow
    explode of sequence(0, n_copies-1) — no shuffle of the corpus at all.
    """
    sizes = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    wmap = F.create_map(
        *[x for k, w in sorted(weights.items()) for x in (F.lit(k), F.lit(float(w)))]
    )
    rate = (
        F.coalesce(wmap[F.col(group_col)], F.lit(0.0)) * target_rows / F.col("_gn")
    )
    base = F.floor(rate).cast("bigint")
    frac_cut = F.round((rate - F.floor(rate)) * n_buckets).cast("bigint")
    n_copies = base + F.when(
        hash_bucket(key_col, n_buckets) < frac_cut, F.lit(1)
    ).otherwise(F.lit(0))
    out = (
        df.join(F.broadcast(sizes), group_col)
        .withColumn("_nc", F.least(n_copies, F.lit(max_repeat)))
        .filter(F.col("_nc") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .drop("_gn", "_nc")
    )
    return out


def dsir_bucketed_features(
    df: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """[EXT] the shared DSIR feature frame: one row per token-bigram
    occurrence, bucketed — (id[, extras], bucket). The expensive part of
    every DSIR stage is this explode; materialize it ONCE (the
    dedup.shingle_hashes precedent — Spark has no cross-DAG CSE, so a
    lazily-rebuilt frame would re-explode the corpus per consumer) and
    feed it to dsir_logratio_table (raw_features/target_features) and
    dsir_weights (features). ``extra_cols`` carries the columns the
    caller filters the target slice by (e.g. lang)."""
    from demo_bigdata_spark.operators.text import _doc_bigrams

    extras = list(extra_cols or [])
    bg = _doc_bigrams(df, text_col=text_col, id_col=id_col, extra_cols=extras)
    return bg.select(
        id_col,
        *extras,
        hash_bucket(F.concat_ws(" ", "w1", "w2"), n_buckets=n_buckets).alias(
            "bucket"
        ),
    )


def dsir_logratio_table(
    raw: DataFrame | None = None,
    target: DataFrame | None = None,
    n_buckets: int = 4096,
    text_col: str = "text",
    raw_features: DataFrame | None = None,
    target_features: DataFrame | None = None,
) -> DataFrame:
    """[EXT] per-bucket log importance ratios for DSIR (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    token bigrams hash into ``n_buckets`` feature buckets; each bucket's
    ratio is log2 of its add-one-smoothed probability under the TARGET
    distribution (the domain you want more of) over the RAW distribution
    (the crawl you're selecting from). Returns (bucket, log_ratio) —
    ``n_buckets`` rows, a broadcastable model artifact like the
    classifier's weight table.

    Two hash-aggregate passes (one per corpus), each one shuffle keyed by
    the bucket id — at 100 TB the aggregate is map-side-combined down to
    n_buckets rows per partition before the exchange. Pass
    ``raw_features``/``target_features`` (dsir_bucketed_features frames,
    usually one pinned frame and a filter of it) to share the corpus
    explode across stages instead of re-running it per count table.
    """
    from demo_bigdata_spark.operators.text import _doc_bigrams

    def counts(df: DataFrame | None, feats: DataFrame | None, name: str) -> DataFrame:
        if feats is None:
            feats = _doc_bigrams(df, text_col=text_col).select(
                hash_bucket(
                    F.concat_ws(" ", "w1", "w2"), n_buckets=n_buckets
                ).alias("bucket")
            )
        return feats.groupBy("bucket").agg(F.count("*").alias(name))

    if (target is None) == (target_features is None):
        raise ValueError("pass exactly one of target / target_features")
    if (raw is None) == (raw_features is None):
        raise ValueError("pass exactly one of raw / raw_features")
    ct = counts(target, target_features, "ct")
    cr = counts(raw, raw_features, "cr")
    nt = ct.agg(F.sum("ct").alias("nt"))
    nr = cr.agg(F.sum("cr").alias("nr"))
    buckets = (raw if raw is not None else raw_features).sparkSession.range(
        n_buckets
    ).select(F.col("id").cast("long").alias("bucket"))
    return (
        buckets.join(F.broadcast(ct), "bucket", "left")
        .join(F.broadcast(cr), "bucket", "left")
        .join(F.broadcast(nt))
        .join(F.broadcast(nr))
        .select(
            "bucket",
            (
                F.log2(
                    (F.coalesce("ct", F.lit(0)) + 1)
                    / (F.col("nt") + n_buckets).cast("double")
                )
                - F.log2(
                    (F.coalesce("cr", F.lit(0)) + 1)
                    / (F.col("nr") + n_buckets).cast("double")
                )
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    df: DataFrame | None,
    log_ratios: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: DataFrame | None = None,
) -> DataFrame:
    """[EXT] per-document DSIR importance weights: sum of the bucket
    log-ratios over the document's hashed bigram occurrences (the log of
    the paper's importance weight under the hashed-ngram generative
    model), plus the occurrence count and the mean (rounded 4dp — the
    logprob convention). Docs with more target-like n-gram mass than the
    raw crawl score positive; DSIR resamples proportionally to the
    exponentiated weight, and the deterministic engine twin of that
    selection is ``dsir_select`` (top-k by weight, content-stable
    tiebreak).

    Shape: explode to bigram occurrences, broadcast-join the n_buckets-row
    ratio table, one aggregate back per doc — the classifier_quality
    plan. Pass ``features`` (a dsir_bucketed_features frame, usually the
    pinned one shared with dsir_logratio_table) to skip the explode."""
    from demo_bigdata_spark.operators.text import _doc_bigrams

    if (df is None) == (features is None):
        raise ValueError("pass exactly one of df / features")
    if features is not None:
        bg = features.select(id_col, "bucket")
    else:
        bg = _doc_bigrams(df, text_col=text_col, id_col=id_col).select(
            F.col(id_col),
            hash_bucket(
                F.concat_ws(" ", "w1", "w2"), n_buckets=n_buckets
            ).alias("bucket"),
        )
    return (
        bg.join(F.broadcast(log_ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("log_ratio"), 4).alias("log_weight"),
            F.round(F.avg("log_ratio"), 4).alias("mean_log_ratio"),
        )
    )


def dsir_select_budget(
    df: DataFrame,
    weights: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 64,
) -> DataFrame:
    """[EXT] production DSIR selection: documents in importance order
    (log_weight desc, id asc — the content-stable order of
    :func:`dsir_select`) are taken until the TOKEN budget is filled —
    every kept doc's cumulative token count (inclusive) fits within
    ``token_budget``. This is how DSIR is actually applied (Xie et al.
    2023 select to a pre-training token target, not a document count):
    document lengths vary wildly, so a top-k by weight over- or
    under-shoots the budget.

    Returns (id, log_weight, n_tokens, cum_tokens) for the selected docs.

    Scale shape — the global running sum WITHOUT a corpus-sized window:
    ``repartitionByRange`` on the selection order makes physical
    partition ids ascend with the global order, an intra-partition
    window computes local prefix sums in parallel, and the per-partition
    totals (``n_parts`` rows) take the one deliberate single-partition
    window before broadcasting back — the pack_sequences two-level
    prefix-sum, keyed by the importance order instead of doc id.
    Exactness: token counts are bigint, so the cumulative sums are
    order-exact and engine-reproducible."""
    from pyspark.sql.window import Window

    from demo_bigdata_spark.operators.text import token_count

    base = df.select(
        F.col(id_col), token_count(F.col(text_col)).cast("bigint").alias("n_tokens")
    ).join(weights.select(id_col, "log_weight"), id_col)
    order = [F.col("log_weight").desc(), F.col(id_col)]
    # pinned: BOTH consumers below (the per-pid window and the per-pid
    # totals) must see the SAME physical range boundaries — an unpinned
    # frame would replay the range exchange per consumer (2x the shuffle)
    # and, worse, leave the two branches free to sample different
    # boundaries, which would misalign local prefixes with their offsets
    ranged = (
        base.repartitionByRange(int(n_parts), *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_cum_local", F.sum("n_tokens").over(w_local))
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_pt"))
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.withColumn(
        "_prefix", F.coalesce(F.sum("_pt").over(w_pid), F.lit(0))
    ).select("_pid", "_prefix")
    return (
        local.join(F.broadcast(prefixes), "_pid")
        .withColumn(
            "cum_tokens", (F.col("_prefix") + F.col("_cum_local")).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= int(token_budget))
        .select(id_col, "log_weight", "n_tokens", "cum_tokens")
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """[EXT] deterministic DSIR selection: the k highest-importance
    documents, ties broken by id (content-stable — the paper's Gumbel
    resampling is seed-dependent; a reproducible pipeline wants the same
    k docs on every engine and run). TakeOrdered plan: no global sort
    materialization, per-partition top-k then a k-row merge on the
    driver-side exchange."""
    picked = (
        weights.orderBy(F.col("log_weight").desc(), F.col(id_col))
        .limit(int(k))
        .select(id_col, "log_weight")
    )
    return df.join(picked, id_col)


def temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    weight_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """[EXT] temperature-scaled mixture weights — the multilingual
    sampling rule (Conneau & Lample 2019 §3.1; mT5/XLM-R convention):
    p_g ∝ n_g^alpha with alpha < 1 UPWEIGHTING low-resource groups
    relative to their natural share (alpha=1 is proportional sampling,
    alpha=0 uniform). UniMax (Chung et al. 2023) is the epoch-capped
    refinement — pair these weights with ``mixture_sample_repeat``'s
    ``max_repeat`` so a tiny language is boosted but never repeated past
    its cap.

    ``n_g`` is the group row count, or the sum of ``weight_col`` (token
    counts) when given — the form token-budget mixtures need. Shape: one
    tiny group aggregate, one broadcast scalar total, zero corpus
    shuffles beyond the count. Returns (group, n, weight) with the weight
    rounded at ``scale`` — callers feed the ROUNDED values to
    mixture_sample so engine replays agree bit-for-bit."""
    agg = (
        F.count("*")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("bigint"))
    )
    sizes = df.groupBy(group_col).agg(agg.alias("n"))
    powed = sizes.withColumn(
        "_p", F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
    )
    tot = powed.agg(F.sum("_p").alias("_t"))
    return powed.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n",
        F.round(F.col("_p") / F.col("_t"), scale).alias("weight"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    score_decimals: int = 6,
) -> DataFrame:
    """[EXT] deterministic weighted sampling without replacement — the
    A-ES reservoir scheme (Efraimidis & Spirakis 2006): each row gets
    u(key) in (0, 1] from a content-addressed md5 hash and the key
    score = u ** (1/weight); the k LARGEST scores are the sample, which
    is distributionally equivalent to sequential draws proportional to
    weight. The curation use: sample documents proportional to a quality
    or importance weight instead of uniformly.

    Content-addressed u (not an RNG) keeps the sample reproducible across
    runs, engines, and partitionings — and DuckDB-replayable, so this is
    a fully value-checked sampler like the rest of the tier. Scores are
    rounded to ``score_decimals`` BEFORE ranking with a key tiebreak:
    libm pow can differ by 1 ulp between engines, and rounding plus a
    deterministic tiebreak makes the cross-engine order identical (ties
    at the grid admit by key asc — the kcenter/percentile convention).

    Rows with null or non-positive weight are excluded (a zero weight
    means "never sample"; A-ES needs w > 0).

    Plan: one scan -> TakeOrderedAndProject (per-partition partial top-k,
    then a k-row merge on the driver side of the exchange) — no shuffle
    of the data, no window over the corpus. At 100 TB the cost is the
    scan; k rows cross the wire.
    """
    if k < 1:
        raise ValueError(f"weighted_sample: k must be >= 1, got {k}")
    key = F.col(key_col)
    w = F.col(weight_col).cast("double")
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, _HEX_CHARS), 16, 10)
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2 ** (4 * _HEX_CHARS)))
    score = F.round(F.pow(u, F.lit(1.0) / w), score_decimals)
    return (
        df.filter(w > 0)
        .withColumn("sample_score", score)
        .orderBy(F.col("sample_score").desc(), key)
        .limit(k)
    )
