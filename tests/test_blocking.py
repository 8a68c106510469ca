"""Candidate-volume preflight (operators/blocking.py): exact pricing of
a blocking self-join, and the refusal path for degenerate regimes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from football_lakehouse_spark.operators.blocking import (
    CandidateVolumeError,
    assert_candidate_volume,
    candidate_volume,
)


def _postings(spark, sizes: dict[str, int]):
    rows = [
        Row(key=k, member=f"{k}_{i}")
        for k, n in sizes.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_candidate_volume_exact(spark):
    """est_pairs is the exact self-join output: sum C(n_k, 2)."""
    df = _postings(spark, {"a": 4, "b": 2, "c": 1})
    row = candidate_volume(df, ["key"]).collect()[0]
    assert row["n_keys"] == 3
    assert row["n_postings"] == 7
    assert row["max_posting"] == 4
    assert row["est_pairs"] == 6 + 1 + 0
    # cross-check against the join it prices
    a = df.selectExpr("key", "member as m_a")
    b = df.selectExpr("key", "member as m_b")
    joined = a.join(b, "key").where("m_a < m_b").count()
    assert joined == row["est_pairs"]


def test_sparse_passes_dense_refused(spark):
    sparse = _postings(spark, {f"k{i}": 2 for i in range(10)})
    stats = assert_candidate_volume(sparse, ["key"], max_pairs=100)
    assert stats["est_pairs"] == 10

    dense = _postings(spark, {"hot": 200})
    with pytest.raises(CandidateVolumeError) as ei:
        assert_candidate_volume(dense, ["key"], max_pairs=100, context="test")
    msg = str(ei.value)
    assert "test" in msg and "19,900" in msg and "SPARK_GRAFT_MAX" in msg


def test_volume_arithmetic_survives_bigint_overflow(spark):
    """The overflow regime the preflight exists to refuse cannot be
    materialised as test rows (it needs ≥3e9 postings on one key), so
    pin the AGGREGATE EXPRESSION itself on a fabricated per-key table:
    one 5e9-row posting makes n*(n-1) ≈ 2.5e19 > 2^63 — the decimal
    path must price it exactly where BIGINT would crash (ANSI) or wrap
    negative (non-ANSI, silently bypassing the guard)."""
    from pyspark.sql import functions as F

    from football_lakehouse_spark.operators.blocking import _EST_PAIRS_SQL, _N

    n = 5_000_000_000
    per_key = spark.createDataFrame([(str(n),)], "s string").select(
        F.col("s").cast("decimal(38,0)").alias(_N)
    )
    # THE expression candidate_volume uses (shared constant, no copy)
    row = per_key.agg(F.expr(_EST_PAIRS_SQL).alias("est_pairs")).collect()[0]
    assert int(row["est_pairs"]) == n * (n - 1) // 2  # > 2^63


def test_key_column_named_n(spark):
    """The helper is public: a caller whose key column is literally
    named 'n' must not collide with the internal count alias."""
    from pyspark.sql import functions as F

    df = _postings(spark, {"a": 3, "b": 2}).select(
        F.col("key").alias("n"), "member"
    )
    row = candidate_volume(df, ["n"]).collect()[0]
    assert row["n_keys"] == 2
    assert row["est_pairs"] == 3 + 1
    stats = assert_candidate_volume(df, ["n"], max_pairs=100)
    assert stats["est_pairs"] == 4


def test_cap_env_var_read_at_call_time(spark, monkeypatch):
    """Exporting the knob after import must take effect, and a
    malformed value must fail at the call with the knob named."""
    df = _postings(spark, {"hot": 10})  # 45 pairs
    monkeypatch.setenv("SPARK_GRAFT_MAX_CANDIDATE_PAIRS", "10")
    with pytest.raises(CandidateVolumeError):
        assert_candidate_volume(df, ["key"])
    monkeypatch.setenv("SPARK_GRAFT_MAX_CANDIDATE_PAIRS", "100")
    assert assert_candidate_volume(df, ["key"])["est_pairs"] == 45
    monkeypatch.setenv("SPARK_GRAFT_MAX_CANDIDATE_PAIRS", "lots")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MAX_CANDIDATE_PAIRS"):
        assert_candidate_volume(df, ["key"])


def test_empty_postings(spark):
    df = _postings(spark, {"a": 1}).where("key = 'absent'")
    stats = assert_candidate_volume(df, ["key"], max_pairs=0)
    assert stats == {
        "n_keys": 0, "n_postings": 0, "max_posting": 0, "est_pairs": 0
    }


def test_guarded_queries_still_pass_at_smoke(spark):
    """q168/q176 keep their guard silent on the smoke fixture (their
    oracle parity is covered by test_oracle; this pins that the guard
    does not fire below the cap)."""
    from football_lakehouse_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    for name in ("q168_setsim_prefix_join", "q176_symspell_fuzzy_join"):
        assert REGISTRY[name].builder(spark, SF_SMOKE).count() >= 0
