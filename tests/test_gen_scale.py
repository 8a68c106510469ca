"""scripts/gen_scale.py replica rules: per-token suffixes must keep the
base corpus's adversarial shapes (empty docs, whitespace-only docs,
whitespace-edged docs) intact in replicas — no phantom tokens."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

from football_lakehouse_spark.functions.text import ws_tokens

_spec = importlib.util.spec_from_file_location(
    "gen_scale",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "gen_scale.py"),
)
gen_scale = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gen_scale)


def test_replica_text_suffixes_every_token(spark):
    df = spark.createDataFrame([("a b  c",)], "text string")
    got = df.select(gen_scale.replica_text_expr(3).alias("text")).collect()[0][0]
    assert got == "ar3 br3 cr3"


def test_replica_text_keeps_empty_and_whitespace_docs(spark):
    """An empty or whitespace-only doc must NOT gain phantom 'r{i}'
    tokens in replicas, and whitespace-edged docs must not grow edge
    tokens — token streams stay factor-replicated, never invented."""
    rows = [("",), (" \t ",), ("  lead",), ("trail\n",), ("\tboth \f",)]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        F.col("text").alias("orig"),
        gen_scale.replica_text_expr(1).alias("text"),
    )
    got = {r["orig"]: r["text"] for r in out.collect()}
    # empty stays empty; whitespace-only stays whitespace-only
    assert got[""] == ""
    assert got[" \t "].strip() == ""
    # token COUNT per doc is preserved exactly (the shared tokenizer
    # class is what every dedup/text operator consumes)
    cnt = df.select(
        F.size(ws_tokens(F.col("text"))).alias("base"),
        F.size(ws_tokens(gen_scale.replica_text_expr(2))).alias("rep"),
    )
    for r in cnt.collect():
        assert r["base"] == r["rep"]
    # every non-empty token carries the replica suffix → replicas are
    # shingle-disjoint from the base corpus
    toks = df.select(
        F.explode(ws_tokens(gen_scale.replica_text_expr(1))).alias("t")
    ).collect()
    assert toks and all(r["t"].endswith("r1") for r in toks)


def test_replica_text_expr_column_form(spark):
    """The column form (used by the cold-pipeline generator's one-pass
    crossJoin) must produce byte-identical text to the int form for
    the same replica id."""
    df = spark.createDataFrame([("a b  c", 3), ("  lead x", 3)], "text string, rep int")
    out = df.select(
        gen_scale.replica_text_expr(3).alias("by_int"),
        gen_scale.replica_text_expr(F.col("rep")).alias("by_col"),
    )
    for r in out.collect():
        assert r["by_int"] == r["by_col"]
