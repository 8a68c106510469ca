"""Streaming state & windows — the idiomatic-Spark bonus surface the
reference deliberately avoids (SURVEY.md §2.9: "no watermarks, no
tumbling/sliding/session windows are referenced anywhere"), plus the
watermark+dropDuplicates alternative to MERGE-based dedup (ST4 note).

Everything here runs as finite ``availableNow`` jobs so tests are
deterministic and replayable over a fixed file set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.streaming.ingest import read_landing_stream


def windowed_event_counts(stream: DataFrame, window: str = "6 hours",
                          watermark: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window aggregate: counts + value sums per
    (window, event_type). Late rows beyond the watermark are dropped;
    state is bounded — the 100 TB-stream-safe aggregation shape."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermark + dropDuplicates on the deterministic event key — the
    Spark-native late/duplicate handling (engine offers both this and
    the MERGE pattern, per SURVEY.md §2 ST4)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_windowed_counts_available_now(
    spark: SparkSession, landing_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Finite windowed-aggregation job: landing files → watermarked
    tumbling windows → parquet.

    Append mode emits only windows the watermark has CLOSED: windows
    within ``watermark`` of the max event time stay in state at
    end-of-input and appear on the next run once later data lands.
    That is the correct bounded-state contract; callers needing
    everything flushed land a watermark-advancing sentinel first
    (see tests/test_streaming.py)."""
    stream = read_landing_stream(spark, landing_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
