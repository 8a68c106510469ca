"""Corpus selection under a global token budget.

Training-data curation routinely ends with "take the best documents
until the token budget is spent" (quality-ranked selection). The naive
plan is a single global window cumsum — `Window.orderBy(score)` with no
partition key, which serialises the whole corpus through one task. This
module computes the EXACT same global prefix with distributed pieces:

1. bucket every doc by a coarse score range (map-side),
2. aggregate per-bucket token totals (one tiny shuffle — n_buckets
   rows),
3. window over the BUCKET table (n_buckets rows, driver-scale) to get
   the cumulative tokens of all better buckets,
4. per-bucket doc windows (partitioned by bucket — distributed) for the
   within-bucket running sum,

so ``global_cum(doc) = cum_of_better_buckets + cum_within_bucket(doc)``
holds exactly and no stage ever sees more than one bucket's rows in a
single task. Cliff: a corpus where every doc has the same score
collapses into one bucket — pick ``bucket_width`` so score spread maps
to hundreds of buckets (the same knob IVF has with n_cells).

Reference parity note: the reference lakehouse has no corpus-selection
ops (SURVEY.md §2.14) — north-star surface for LLM pipelines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def _require_integral_score(df: DataFrame, score_col: str, where: str) -> None:
    """Fail closed on fractional score columns: ``cast("bigint")``
    silently TRUNCATES doubles (quality scores in [0,1] all become 0),
    degenerating the promised (score DESC, id ASC) ranking to id ASC
    with no warning. Callers quantise first (the micros rule:
    ``floor(score * 10000)``)."""
    dtype = dict(df.dtypes).get(score_col)
    if dtype in ("double", "float") or (dtype or "").startswith("decimal"):
        raise ValueError(
            f"{where}: score column {score_col!r} is {dtype}; fractional "
            "scores truncate to integers (a [0,1] quality score becomes "
            "all-zero and the ranking silently degenerates to id order). "
            "Quantise first, e.g. floor(score * 10000).cast('bigint')."
        )


def token_budget_select(
    docs: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: int = 16,
) -> DataFrame:
    """Exact quality-ranked selection: order docs by (score DESC, id
    ASC) and select the prefix whose cumulative ``tokens_col`` stays
    within ``budget``. Returns every doc with its global running total
    (``cum_tokens``) and the ``selected`` verdict — the boundary doc
    that would overflow the budget is NOT selected (and neither is
    anything after it).

    Equivalent to ``sum(...) OVER (ORDER BY score DESC, id)`` but
    distributed: per-score-bucket windows plus a broadcast bucket-prefix
    table (see module docstring for the decomposition).
    """
    if bucket_width < 1:
        raise ValueError(
            f"token_budget_select: bucket_width must be >= 1 (got "
            f"{bucket_width}); width 0 divides by zero and a negative "
            "width inverts the bucket order"
        )
    _require_integral_score(docs, score_col, "token_budget_select")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("bigint").alias("score"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    ).withColumn("bucket", F.floor(F.col("score") / bucket_width).cast("bigint"))

    # per-bucket totals: n_buckets rows — tiny at any corpus scale
    bucket_tot = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    w_better = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("btok").over(w_better), F.lit(0)).alias("cum_before"),
    )

    # within-bucket running sum: partitioned by bucket → distributed
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        # null-safe on bucket: a NULL score yields a NULL bucket, and a
        # plain equi-join would DROP those docs instead of ranking them
        # last ("returns EVERY doc" — desc ordering puts NULLS LAST, so
        # the NULL bucket's w_better prefix is already the every-real-
        # bucket total; the same contract source_quota_select pins)
        base.join(
            F.broadcast(
                bucket_prefix.select(
                    F.col("bucket").alias("__bp_bucket"), "cum_before"
                )
            ),
            F.col("bucket").eqNullSafe(F.col("__bp_bucket")),
        )
        .drop("__bp_bucket")
        .withColumn("cum_in", F.sum("n_tokens").over(w_in))
        .select(
            "doc_id",
            "score",
            "n_tokens",
            (F.col("cum_before") + F.col("cum_in")).alias("cum_tokens"),
            ((F.col("cum_before") + F.col("cum_in")) <= budget).alias("selected"),
        )
    )


def dsir_scores(
    docs: DataFrame, target: F.Column, n_buckets: int = 64,
    id_col: str = "doc_id", tokens_col: str = "tokens",
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023): score every
    document by how much its hashed-unigram profile resembles the
    TARGET slice (rows where ``target`` is true) vs the RAW corpus.

    ``docs`` must carry ``(id_col, tokens_col: array<string>)``; tokens
    hash into ``n_buckets`` sha-prefix buckets (cross-engine portable).
    Per-token evidence is the exact-integer discriminant
    ``ct[b]·N_raw − cr[b]·N_tgt`` — the sign pattern of the DSIR
    log-ratio without transcendental log, so results are reproducible
    bit-for-bit on any engine (at petabyte token counts switch the
    per-bucket term to log-space doubles; the topology is identical).

    Scale contract: ONE corpus explode; the bucket table (n_buckets
    rows) and the 1-row totals broadcast; the per-doc score is a
    map-side join + one groupBy on ``id_col``. Returns
    ``(id_col, n_tokens, score, selected)``.
    """
    from football_lakehouse_spark.functions.text import portable_hash

    u = docs.select(
        F.col(id_col), target.alias("__tgt"),
        F.explode(F.col(tokens_col)).alias("token"),
    ).withColumn("b", portable_hash(F.col("token"), seed="dsir") % n_buckets)
    raw = u.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = u.where(F.col("__tgt")).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    buckets = raw.join(tgt, "b", "left").select(
        "b", "cr", F.coalesce(F.col("ct"), F.lit(0)).alias("ct")
    )
    tot = u.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("nt"),
    )
    evidence = F.col("ct") * F.col("nr") - F.col("cr") * F.col("nt")
    return (
        u.join(F.broadcast(buckets), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            # decimal(38,0) ACCUMULATOR (r12 review): per-row evidence
            # is ~(count × corpus-total), so a bigint running sum wraps
            # (non-ANSI) or crashes mid-aggregation (ANSI) orders of
            # magnitude below the 100 TB envelope. The output cast back
            # to bigint matches the oracle's schema and fails LOUDLY on
            # both engines if a final score ever outgrows it.
            F.sum(evidence.cast("decimal(38,0)")).cast("bigint").alias("score"),
        )
        .withColumn("selected", F.col("score") > 0)
    )


def bucketed_prefix(
    df: DataFrame,
    bucket: str,
    order,
    sums=None,
    rank: str | None = None,
    descending: bool = False,
    maxs=None,
    group=None,
    total: str | None = None,
) -> DataFrame:
    """The generalised two-phase global prefix (token_budget_select's
    decomposition, factored out so every global-window plan can reuse
    it): given a ``bucket`` column that is MONOTONE in the desired
    global order (same direction as ``descending``), compute exact
    global running aggregates without an unpartitioned window —

    1. per-bucket totals (one tiny shuffle, n_buckets rows),
    2. a triangular broadcast self-join over the BUCKET table for the
       strictly-better-bucket prefix (NO window at all — a windowless
       O(n_buckets²) aggregation whose cost is bounded by the
       bucket-value range, never the data; at hundreds of buckets this
       is microseconds, and it keeps the plan free of unpartitioned
       WindowExec nodes, which Spark 4's EliminateWindowPartitions
       would otherwise reintroduce by folding any constant partition
       key),
    3. per-bucket windows (partitioned → distributed) for the
       within-bucket running part,

    so ``global = better_bucket_prefix + within_bucket_running`` holds
    exactly. ``order`` is the within-bucket ordering (must refine the
    bucket order); ``sums`` maps output column name → expression whose
    global running sum is wanted; ``maxs`` does the same for global
    running MAX (prefix-max: greatest of the better-bucket max and the
    within-bucket running max — max is associative/idempotent so the
    same decomposition is exact); ``rank`` names an optional global
    row_number output. All original columns are preserved.

    Scale contract: no task ever sees more than one bucket's rows; the
    only super-linear structure is the bucket² prefix join, bounded by
    the bucket-value range, not the data (keep bucket_width sized for
    ~10²–10³ buckets). Ties across the bucket boundary are impossible
    by construction (equal order keys hash to equal buckets when the
    bucket is a function of the leading order key).

    ``group`` (r12): optional partition columns — the decomposition
    runs independently WITHIN each group (running aggregates/rank per
    group: exactly ``Window.partitionBy(*group).orderBy(...)``
    semantics). This is the scale fix for few-valued partition keys: a
    ``PARTITION BY event_type`` window over a 5-value enum serialises
    corpus/5 rows through one task's sort — the same cliff as an
    unpartitioned window — while grouped bucketing keeps every task at
    one (group, bucket) slice. Group matching is null-safe throughout
    (a NULL group value is one group).
    """
    sums = dict(sums or {})
    maxs = dict(maxs or {})
    order = list(order)
    groups = list(group or [])
    agg = (
        [F.count(F.lit(1)).alias("__bcnt")]
        + [F.sum(expr).alias(f"__btot_{name}") for name, expr in sums.items()]
        # non-null counts per sum expr: the global window returns NULL
        # until the first non-null value, so exact equivalence needs to
        # know whether ANY prior value existed (coalescing the prefix to
        # 0 alone would turn that leading NULL into 0)
        + [F.count(expr).alias(f"__bnn_{name}") for name, expr in sums.items()]
        + [F.max(expr).alias(f"__bmax_{name}") for name, expr in maxs.items()]
    )
    # bucket table materialised ONCE (eager, n_buckets×group rows —
    # control-plane sized by the scale contract below): it feeds BOTH
    # sides of the triangular prefix self-join (and the optional total),
    # and without truncation each consumer re-runs the full input
    # aggregation — 2-3 extra corpus scans per bucketed_prefix at any
    # scale (r14; measured 3 lineitem scans in q215's plan).
    bucket_tot = df.groupBy(*groups, bucket).agg(*agg).localCheckpoint(
        eager=True
    )
    other = bucket_tot.select(
        *[F.col(g).alias(f"__og{i}") for i, g in enumerate(groups)],
        F.col(bucket).alias("__ob"),
        F.col("__bcnt").alias("__ocnt"),
        *[F.col(f"__btot_{name}").alias(f"__otot_{name}") for name in sums],
        *[F.col(f"__bnn_{name}").alias(f"__onn_{name}") for name in sums],
        *[F.col(f"__bmax_{name}").alias(f"__omax_{name}") for name in maxs],
    )
    # NULL buckets sort where Spark's default null ordering puts them in
    # the equivalent global window (asc → NULLS FIRST, desc → NULLS
    # LAST); a bare </> comparison is NULL against a NULL bucket, which
    # would silently give NULL-bucket rows an EMPTY prefix (and exclude
    # them from every real bucket's prefix on the ascending side)
    if descending:
        better = (F.col("__ob") > F.col(bucket)) | (
            F.col(bucket).isNull() & F.col("__ob").isNotNull()
        )
    else:
        better = (F.col("__ob") < F.col(bucket)) | (
            F.col("__ob").isNull() & F.col(bucket).isNotNull()
        )
    # grouped: the prefix only counts better buckets of the SAME group
    for i, g in enumerate(groups):
        better = better & F.col(f"__og{i}").eqNullSafe(F.col(g))
    bucket_prefix = (
        bucket_tot.join(F.broadcast(other), better, "left")
        .groupBy(*groups, bucket)
        .agg(
            F.coalesce(F.sum("__ocnt"), F.lit(0)).alias("__pcnt"),
            *[
                F.coalesce(F.sum(f"__otot_{name}"), F.lit(0)).alias(
                    f"__p_{name}"
                )
                for name in sums
            ],
            *[
                F.coalesce(F.sum(f"__onn_{name}"), F.lit(0)).alias(
                    f"__pnn_{name}"
                )
                for name in sums
            ],
            # max prefix may legitimately be NULL for the first bucket —
            # the within-bucket running max supplies the value there
            *[F.max(f"__omax_{name}").alias(f"__p_{name}") for name in maxs],
        )
    )
    w_in = Window.partitionBy(*groups, bucket).orderBy(*order)
    w_in_cum = w_in.rowsBetween(Window.unboundedPreceding, 0)
    # null-safe join: a NULL bucket/group must rejoin its own prefix
    # row, not vanish ("All original columns are preserved")
    prefix = bucket_prefix.withColumnRenamed(bucket, "__pb")
    cond = F.col(bucket).eqNullSafe(F.col("__pb"))
    for i, g in enumerate(groups):
        prefix = prefix.withColumnRenamed(g, f"__pg{i}")
        cond = cond & F.col(g).eqNullSafe(F.col(f"__pg{i}"))
    out = df.join(F.broadcast(prefix), cond).drop(
        "__pb", *[f"__pg{i}" for i in range(len(groups))]
    )
    for name, expr in sums.items():
        within = F.sum(expr).over(w_in_cum)
        within_nn = F.count(expr).over(w_in_cum)
        # exact global-window semantics: NULL until the first non-null
        # contribution anywhere in the frame, then the sum of non-nulls
        out = out.withColumn(
            name,
            F.when(
                (F.col(f"__pnn_{name}") + within_nn) > 0,
                F.col(f"__p_{name}") + F.coalesce(within, F.lit(0)),
            ),
        )
    for name, expr in maxs.items():
        out = out.withColumn(
            name,
            F.greatest(
                F.coalesce(F.col(f"__p_{name}"), F.max(expr).over(w_in_cum)),
                F.max(expr).over(w_in_cum),
            ),
        )
    if rank is not None:
        out = out.withColumn(rank, F.col("__pcnt") + F.row_number().over(w_in))
    if total is not None:
        # global (or per-group) row count, served from the CHECKPOINTED
        # bucket table — callers that need "rank out of n" (equi-depth
        # bins, ntile) previously paid one more full input scan for it
        # (r14)
        if groups:
            tot_df = bucket_tot.groupBy(*groups).agg(
                F.sum("__bcnt").alias(total)
            )
            tcond = reduce(
                lambda a, b: a & b,
                [F.col(g).eqNullSafe(F.col(f"__tg{i}")) for i, g in enumerate(groups)],
            )
            tot_df = tot_df.select(
                *[F.col(g).alias(f"__tg{i}") for i, g in enumerate(groups)],
                total,
            )
            out = out.join(F.broadcast(tot_df), tcond).drop(
                *[f"__tg{i}" for i in range(len(groups))]
            )
        else:
            out = out.crossJoin(
                F.broadcast(bucket_tot.agg(F.sum("__bcnt").alias(total)))
            )
    drop = (
        ["__pcnt"]
        + [f"__p_{name}" for name in sums]
        + [f"__pnn_{name}" for name in sums]
        + [f"__p_{name}" for name in maxs]
    )
    return out.drop(*drop)


def ntile_expr(i, n, k: int):
    """ntile(k) reproduced arithmetically from a global rank: with n
    rows, the first n % k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ —
    bit-identical to the SQL window function, but computable from the
    (rank, n) pair `bucketed_prefix` produces, so the tile cut never
    needs an unpartitioned window. ``i`` is the 1-based global rank
    column, ``n`` the total-row-count column (broadcast 1-row agg)."""
    big = F.floor(n / k) + 1
    cut = (n % k) * big
    return (
        F.when(i <= cut, F.ceil(i / big))
        .otherwise((n % k) + F.ceil((i - cut) / F.floor(n / k)))
        .cast("int")
    )


def source_quota_select(
    docs: DataFrame,
    quota_pct: int = 50,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    bucket_width: int | None = None,
) -> DataFrame:
    """Per-source token-quota selection — the data-mixing counterpart
    of :func:`token_budget_select`: each SOURCE independently keeps its
    best docs (score DESC, id ASC) until ``quota_pct`` percent of that
    source's tokens is reached; the doc that would overflow its
    source's quota is not selected. This is how mixture recipes cap a
    dominant crawl source without starving small curated sources — a
    GLOBAL budget (token_budget_select) would let one source's
    high-scoring mass crowd out everything else.

    Integer math throughout (``src_tokens · quota_pct div 100`` — true
    integral division, never double) so the verdicts are
    bit-reproducible cross-engine AT ANY SCALE: Spark's ``/`` promotes
    to double, whose 53-bit mantissa floors off-by-one once a source's
    token sum × quota_pct exceeds 2^53 (~1.5e14 tokens at 60% — exactly
    the 100 TB regime; ADVICE r9). The DuckDB oracle mirrors with
    ``//``.

    Scale contract: the per-source totals are one map-side-combined
    aggregation producing a SOURCES-sized table (broadcast back); the
    running sum is a window PARTITIONED BY SOURCE — distributed across
    sources, never a global sort. A pathologically skewed single
    source degrades to that source's partition — pass ``bucket_width``
    (VERDICT r9 #6) to apply :func:`token_budget_select`'s bucketed
    decomposition WITHIN each source: per-(source, score-bucket)
    windows plus a broadcast (source, bucket)-prefix table, so a
    whole-crawl-sized source is never a single-partition window and the
    output is bit-identical to the plain form (same (score DESC, id
    ASC) order — buckets partition disjoint score ranges). The prefix
    table has sources × occupied-buckets rows — still driver-scale.
    """
    _require_integral_score(docs, score_col, "source_quota_select")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(score_col).cast("bigint").alias("score"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )
    quotas = base.groupBy("source").agg(
        # `div` is Spark's integral division (bigint → bigint); `/`
        # would detour through double and lose exactness past 2^53
        F.expr(f"sum(n_tokens) * {int(quota_pct)} div 100")
        .cast("bigint")
        .alias("quota")
    )
    if bucket_width is not None and bucket_width < 1:
        raise ValueError(
            f"source_quota_select: bucket_width must be >= 1 (got "
            f"{bucket_width}); width 0 divides by zero and a negative "
            "width inverts the bucket order"
        )
    # quota joins are NULL-SAFE on source: groupBy treats NULL source
    # as one group (it gets a quota row), so a plain equi-join would
    # silently DROP every unattributed doc from the output — breaking
    # the "returns EVERY doc" contract this op shares with
    # token_budget_select (whose NULL handling is pinned by tests)
    q_probe = F.broadcast(quotas.withColumnRenamed("source", "__q_source"))
    if bucket_width is None:
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            base.join(q_probe, F.col("source").eqNullSafe(F.col("__q_source")))
            .drop("__q_source")
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        )
    else:
        # NOTE on reuse: this is bucketed_prefix's decomposition with a
        # partition key in front. It keeps a window (not the triangular
        # join bucketed_prefix uses) because the prefix here is
        # PARTITIONED BY SOURCE — a non-constant key, so Spark 4's
        # EliminateWindowPartitions (the reason bucketed_prefix avoids
        # windows) cannot fold it, and the windowed form stays exact
        # over the sources × occupied-buckets table.
        bucketed = base.withColumn(
            "bucket", F.floor(F.col("score") / bucket_width).cast("bigint")
        )
        # per-(source, bucket) totals: sources × occupied buckets rows.
        # A NULL score yields a NULL bucket — kept as its own group so
        # NULL-score docs survive the decomposition (bit-identity with
        # the plain form, whose source-only join never sees the bucket):
        # desc ordering puts NULLS LAST in both engines, so the NULL
        # bucket's prefix is the sum of every real bucket, exactly the
        # plain form's "NULL scores sort after everything" position.
        bucket_tot = bucketed.groupBy("source", "bucket").agg(
            F.sum("n_tokens").alias("btok")
        )
        w_better = (
            Window.partitionBy("source")
            .orderBy(F.col("bucket").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        bucket_prefix = bucket_tot.select(
            F.col("source").alias("__bp_source"),
            F.col("bucket").alias("__bp_bucket"),
            F.coalesce(F.sum("btok").over(w_better), F.lit(0)).alias(
                "__cum_before"
            ),
        )
        # within-(source, bucket) running sum — the doc-sized window is
        # partitioned by BOTH keys, so one source spreads over its
        # score buckets instead of serialising through one task
        w_in = (
            Window.partitionBy("source", "bucket")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            bucketed.join(
                F.broadcast(bucket_prefix),
                # null-safe on BOTH keys: a plain equi-join would DROP
                # the NULL-score rows (bucket) and NULL-source docs the
                # plain form keeps
                F.col("source").eqNullSafe(F.col("__bp_source"))
                & F.col("bucket").eqNullSafe(F.col("__bp_bucket")),
            )
            .drop("__bp_source", "__bp_bucket")
            .join(q_probe, F.col("source").eqNullSafe(F.col("__q_source")))
            .drop("__q_source")
            .withColumn(
                "cum_tokens",
                F.col("__cum_before") + F.sum("n_tokens").over(w_in),
            )
        )
    return cum.select(
        "doc_id",
        "source",
        "score",
        "n_tokens",
        "cum_tokens",
        "quota",
        (F.col("cum_tokens") <= F.col("quota")).alias("selected"),
    )
