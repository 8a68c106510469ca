"""Advanced operators: bucketed zero-shuffle joins, salted aggregation
parity, approx-agg error bounds, stateful streaming accumulator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_lakehouse_spark.catalog import load_table
from football_lakehouse_spark.operators.bucketing import (
    read_bucketed_join,
    salted_aggregate,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "bo"), "o_orderkey")
    write_bucketed(li, "b_lineitem", str(tmp_path / "bl"), "o_orderkey")
    # force the sort-merge path: at fixture scale the planner would just
    # broadcast (making buckets moot); at 100 TB neither side broadcasts
    # and the bucket layout is what removes the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:800]}"
        )
        expected = li.join(orders, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_aggregate_matches_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    salted = salted_aggregate(orders, "o_orderstatus", 8, sums=["o_totalprice"])
    from football_lakehouse_spark.functions.scalars import money_sum

    plain = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("o_totalprice")).alias("sum_o_totalprice"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_approx_stats_within_bounds(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        )
        .collect()
    }
    for flag, r in got.items():
        assert abs(r.approx_parts - r.exact_parts) <= 0.1 * r.exact_parts + 5
        assert abs(r.approx_median - r.exact_median) <= 0.1 * r.exact_median


def test_stateful_running_user_state(spark, tmp_path):
    from football_lakehouse_spark.streaming.ingest import land_json_files
    from football_lakehouse_spark.streaming.stateful import (
        run_stateful_available_now,
    )

    events = load_table(spark, SF_SMOKE, "events").limit(300)
    landing, ckpt, out = (str(tmp_path / d) for d in ("landing", "ckpt", "out"))
    land_json_files(events, landing)
    run_stateful_available_now(spark, landing, ckpt, out)
    got = spark.read.parquet(out)
    # final state per user (last emitted row) must equal the batch truth
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        got.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
    )
    truth = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    f = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}
    t = {r.user_id: (r.n_events, r.total_value) for r in truth.collect()}
    assert set(f) == set(t)
    for u in t:
        assert f[u][0] == t[u][0]
        assert abs(f[u][1] - t[u][1]) < 0.05


def test_salted_join_equals_plain_join_under_adversarial_skew(spark):
    """One key owns 80% of a constructed fact table; the salted join
    must return the exact plain-join multiset AND spread the hot key
    over most of the salt space."""
    from football_lakehouse_spark.operators.bucketing import salted_join

    n_salt = 8
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id") % 40).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    salted = salted_join(fact, dim, key="k", n_salt=n_salt)
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # hot-key spread: content-derived salts cover most of the salt space
    from football_lakehouse_spark.operators.bucketing import _content_salt

    spread = (
        fact.where(F.col("k") == 7)
        .select(_content_salt(fact, n_salt).alias("s"))
        .distinct()
        .count()
    )
    assert spread >= n_salt - 1


def test_content_salt_spreads_exact_duplicate_rows(spark):
    """A hot key whose rows are EXACT duplicates (repeated events,
    constant payload) must still spread: a pure content hash collapses
    all copies onto one salt — zero mitigation in the regime salting
    exists for. The partition-id mix keeps it deterministic AND spread."""
    from football_lakehouse_spark.operators.bucketing import (
        _content_salt,
        salted_join,
    )

    n_salt = 8
    # 4096 byte-identical rows across 16 input partitions
    dup = (
        spark.range(0, 4096)
        .repartition(16)
        .select(F.lit(7).alias("k"), F.lit("same").alias("payload"))
    )
    spread = dup.select(_content_salt(dup, n_salt).alias("s")).distinct().count()
    assert spread > 1, "duplicate rows collapsed onto a single salt"
    # determinism: two evaluations of the same plan agree row-for-row
    a = dup.select(_content_salt(dup, n_salt).alias("s")).collect()
    b = dup.select(_content_salt(dup, n_salt).alias("s")).collect()
    assert [r.s for r in a] == [r.s for r in b]
    # and the join output is still exactly the plain join
    dim = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    assert (
        salted_join(dup, dim, key="k", n_salt=n_salt).count()
        == dup.join(dim, "k").count()
    )


def test_asof_null_payload_on_matched_row_stays_null(spark):
    """merge_asof parity: the payload of the LATEST matching right row
    is returned even when it is NULL — the forward fill must not reach
    past it to an older non-NULL value, and with tolerance set the
    staleness gate must test the same row it returns."""
    from football_lakehouse_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [("k", 1.0, 7.0), ("k", 2.0, None)], "k string, ts double, v double"
    )
    left = spark.createDataFrame([("k", 3.0)], "k string, ts double")
    kw = dict(key="k", left_ts="ts", right_ts="ts", payload=["v"])
    [row] = asof_join(left, right, **kw).collect()
    assert row.asof_v is None, "fill reached past the matched row"
    # tolerance: matched row is ts=2 (lag 1 <= 1.5) — still the NULL row;
    # the out-of-tolerance older value 7.0 must not leak through
    [row] = asof_join(left, right, tolerance=1.5, **kw).collect()
    assert row.asof_v is None
    # sanity: a left row matching ts=1 directly still sees 7.0
    left1 = spark.createDataFrame([("k", 1.5)], "k string, ts double")
    [row] = asof_join(left1, right, **kw).collect()
    assert row.asof_v == 7.0


def test_asof_tolerance_gates_stale_matches(spark):
    """q133 must null exactly the matches older than the bound, and
    agree with the ungated q49 operator on every in-tolerance row."""
    from football_lakehouse_spark.catalog import load_table
    from football_lakehouse_spark.operators.asof import asof_join
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    kw = dict(key="user_id", left_ts="ts", right_ts="ts",
              payload=["event_id", "value"], strictly_before=True)
    free = {r.event_id: r for r in asof_join(ev, purchases, **kw).collect()}
    tol = {r.event_id: r for r in
           asof_join(ev, purchases, tolerance=3600, **kw).collect()}
    assert free.keys() == tol.keys()
    kept = nulled = 0
    for eid, t in tol.items():
        f = free[eid]
        if t.asof_event_id is not None:
            kept += 1
            assert (t.asof_event_id, t.asof_value) == (f.asof_event_id, f.asof_value)
        elif f.asof_event_id is not None:
            nulled += 1  # had a match, too stale under the bound
    assert kept > 0 and nulled > 0, "tolerance must actually bite both ways"


def test_user_curve_queries_mutually_consistent(spark):
    """q157/q158/q149 agree on the underlying activity sets: the WAU
    curve dominates each single day's distinct actives, never exceeds
    the cumulative total, and the cumulative curve is non-decreasing
    and ends at the total distinct-user count."""
    from football_lakehouse_spark.catalog import load_table
    from football_lakehouse_spark.functions.scalars import epoch_seconds
    from football_lakehouse_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    day = F.floor(epoch_seconds(F.col("ts")) / 86400).cast("bigint")
    dau = {
        r.day: r.n
        for r in ev.select("user_id", day.alias("day"))
        .distinct().groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cum = sorted(
        (r.day, r.new_users, r.cumulative_users)
        for r in REGISTRY["q157_cumulative_distinct"].builder(spark, SF_SMOKE).collect()
    )
    wau = {r.day: r.wau7
           for r in REGISTRY["q158_rolling_distinct"].builder(spark, SF_SMOKE).collect()}
    total_users = ev.select("user_id").distinct().count()
    assert cum[-1][2] == total_users
    prev = 0
    for d, new, c in cum:
        assert c == prev + new and new >= 0
        prev = c
        assert wau[d] >= dau[d], "7-day uniques must dominate 1-day uniques"
        assert wau[d] <= total_users


def test_gram_matrix_shape_and_diagonal(spark):
    """q151: exactly d(d+1)/2 upper-triangle cells, every diagonal
    Σx² non-negative and equal to its own Σxy, and n constant."""
    from football_lakehouse_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q151_gram_matrix"].builder(spark, SF_SMOKE).collect()
    d = 16
    assert len(rows) == d * (d + 1) // 2
    ns = {r.n for r in rows}
    assert len(ns) == 1
    for r in rows:
        if r.pos_i == r.pos_j:
            assert int(r.sum_xy) >= 0
            assert r.sum_x == r.sum_y


def test_distribution_drift_conserves_totals(spark):
    """q154: category counts add to the half totals and every drift
    contribution is non-negative."""
    from football_lakehouse_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q154_distribution_drift"].builder(spark, SF_SMOKE).collect()
    assert sum(r.n1 for r in rows) > 0 and sum(r.n2 for r in rows) > 0
    for r in rows:
        assert r.drift_contrib >= 0
    assert abs(sum(r.share_delta * 1 for r in rows)) < 1e-9, (
        "share deltas over all categories must cancel"
    )


def test_mode_per_group_is_true_argmax(spark):
    """q155: the reported modal count equals the true per-user maximum
    and the reported type actually attains it."""
    from football_lakehouse_spark.catalog import load_table
    from football_lakehouse_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    counts = {
        (r.user_id, r.event_type): r.n
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    best = {}
    for (u, _t), n in counts.items():
        best[u] = max(best.get(u, 0), n)
    for r in REGISTRY["q155_mode_per_group"].builder(spark, SF_SMOKE).collect():
        assert r.n == best[r.user_id]
        assert counts[(r.user_id, r.modal_type)] == r.n


def test_value_histogram_conserves_rows(spark):
    from football_lakehouse_spark.catalog import load_table
    from football_lakehouse_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    rows = REGISTRY["q156_value_histogram"].builder(spark, SF_SMOKE).collect()
    assert sum(r.n for r in rows) == ev.count()
    assert all(0 <= r.bin <= 13 for r in rows)


def test_asof_right_tiebreak_pins_tied_timestamps(spark):
    """Two right rows at the SAME (key, ts): without a tiebreak the
    winner is partition-order dependent; with right_tiebreak the
    largest tiebreak value wins deterministically."""
    from football_lakehouse_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [("k", 1.0, 100, 7.0), ("k", 1.0, 200, 9.0)],
        "k string, ts double, rid bigint, v double",
    )
    left = spark.createDataFrame([("k", 2.0)], "k string, ts double")
    for _ in range(3):  # stable across repeated runs
        [row] = asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            payload=["rid", "v"], right_tiebreak=["rid"],
        ).collect()
        assert (row.asof_rid, row.asof_v) == (200, 9.0)


def test_ppm_div_exactness_witnesses(spark):
    """Concrete divergence witnesses for the two division fixes of the
    r11 sweep: (a) q213's old floor(decimal * 1e6 / total) — Spark
    rounds decimal division HALF_UP at result scale BEFORE the floor,
    crossing the integer boundary when the true fraction is ≥
    .9999995; (b) q91's old floor(bigint / int) — `/` promotes to
    double and loses exactness past 2^53. Both now use integer `div`,
    which matches DuckDB's exact `//` on the same values."""
    import duckdb

    # (a) n*1e6/total with fractional part ≥ .9999995 (needs
    # total > 2e6 so the max remainder total-1 clears the threshold):
    # n*1000000 ≡ total-1 (mod total) → old floor rounds UP by one
    total = 2000003
    n = pow(1000000, -1, total) * (total - 1) % total
    frac = (n * 1000000) % total / total
    assert frac >= 0.9999995  # witness really sits in the rounding window
    df = spark.createDataFrame([(n, total)], "n long, total long")
    got = df.select(
        F.expr("cast(n as decimal(38,0)) * 1000000 div total").alias("exact"),
        F.floor(
            F.col("n").cast("decimal(38,0)") * 1000000 / F.col("total")
        ).alias("old"),
    ).collect()[0]
    want = duckdb.sql(
        f"select cast(({n}::HUGEINT * 1000000) // {total} as bigint)"
    ).fetchone()[0]
    assert int(got["exact"]) == want == (n * 1000000) // total
    assert int(got["old"]) == want + 1  # the bug the fix removes

    # (b) micros just past 2^53 where double division floors wrong
    micros = 2**53 + 1
    df2 = spark.createDataFrame([(micros,)], "total_micros long")
    got2 = df2.select(
        F.expr("cast(total_micros as decimal(38,0)) div 10000").alias("exact"),
        F.floor(F.col("total_micros") / 10000).alias("old"),
    ).collect()[0]
    want2 = micros // 10000
    assert int(got2["exact"]) == want2
    # the double path collapses 2^53+1 to 2^53 before dividing; at this
    # witness the floor happens to coincide — the class-level proof is
    # the representability loss itself
    assert float(micros) != micros


def test_asof_sql_null_semantics(spark):
    """r11 sweep #4: asof_join follows SQL equality/inequality — a NULL
    join key never matches (the window groups NULLs, so the fill is
    key-gated), and a NULL-ts right row can never be the 'latest prior'
    (r.ts < l.ts is NULL) — matching the q49/q133 DuckDB ASOF oracle
    and pandas merge_asof."""
    from football_lakehouse_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 100, 1), (7, 100, 2)], "k bigint, ts bigint, lid int"
    )
    right = spark.createDataFrame(
        [(None, 50, "null-key"), (7, None, "null-ts"), (7, 40, "real")],
        "k bigint, ts bigint, p string",
    )
    out = {r.lid: r.asof_p for r in asof_join(
        left, right, "k", "ts", "ts", ["p"]
    ).collect()}
    assert out[1] is None      # NULL key: no match, not 'null-key'
    assert out[2] == "real"    # NULL-ts right row skipped, not matched


def test_asof_tolerance_exact_boundary_micros(spark):
    """r11 sweep #4: the tolerance gate compares integer micros, so a
    lag of EXACTLY the tolerance with non-zero microseconds stays
    in-tolerance (per-side double division could round it out)."""
    from football_lakehouse_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1,)], "k bigint").select(
        "k", F.lit("2026-01-01 02:00:00.123456").cast("timestamp").alias("ts"),
        F.lit(1).alias("lid"),
    )
    right = spark.createDataFrame([(1,)], "k bigint").select(
        "k", F.lit("2026-01-01 01:00:00.123456").cast("timestamp").alias("ts"),
        F.lit("v").alias("p"),
    )
    out = asof_join(left, right, "k", "ts", "ts", ["p"], tolerance=3600.0).collect()
    assert out[0]["asof_p"] == "v"  # lag == tolerance exactly: kept
    out2 = asof_join(left, right, "k", "ts", "ts", ["p"], tolerance=3599.999999).collect()
    assert out2[0]["asof_p"] is None


def test_banded_range_join_exact_past_2pow53(spark):
    """r11 sweep #4: bucket assignment uses exact integer floor
    division — floor(bigint / w) promoted to double and mis-bucketed
    ts values past 2^53 (the q91 class), silently dropping in-window
    matches. Witness values found computationally."""
    import math

    from football_lakehouse_spark.operators.range_join import (
        banded_prior_window_join,
    )

    w = 10
    base = 2**53 + 1
    # values where double floor-division disagrees with exact //
    bad = [x for x in range(base, base + 2000)
           if math.floor(float(x) / w) != x // w][:3]
    assert bad, "no witness in range — widen the scan"
    rows_l = [(1, x, i) for i, x in enumerate(bad)]
    rows_r = [(1, x - 1, f"p{i}") for i, x in enumerate(bad)]
    left = spark.createDataFrame(rows_l, "k bigint, ts bigint, lid bigint")
    right = spark.createDataFrame(rows_r, "k bigint, ts bigint, p string")
    got = banded_prior_window_join(left, right, "k", "ts", "ts", w, ["p"])
    # every pair is 1 apart — all must match (naive range predicate)
    naive = left.join(
        right.select(F.col("k").alias("rk"), F.col("ts").alias("rts"), "p"),
        (F.col("k") == F.col("rk"))
        & (F.col("rts") >= F.col("ts") - w) & (F.col("rts") < F.col("ts")),
    )
    assert got.count() == naive.count() == len(bad)
