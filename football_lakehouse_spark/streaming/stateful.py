"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star briefing: the escape hatch for operators Structured
Streaming's built-ins can't express; SURVEY.md §2 ST5's streaming
variant).

Keeps a running per-user accumulator (event count + value sum) across
micro-batches and emits the updated state per batch — the streaming
form of the batch ``live_state`` derivation (plans/windows.q27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from football_lakehouse_spark.functions.scalars import py_money_from_micros

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("micros", LongType())]
)


def _update_user_state(key, pdfs, state: GroupState):
    # runs on Python workers — stdlib/pandas plus the shared
    # py_money_from_micros twin (pickled by module reference; the
    # package ships to workers with the job).
    # State carries EXACT integer micros (the q91 discipline): storing a
    # round()ed double made the running total depend on micro-batch
    # boundaries (two 0.004 events in one batch → 0.01, split across
    # batches → 0.0) — rounding belongs only at emission.
    import numpy as np

    n, micros = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # NULL values (rescued/absent fields) are NaN here; they
        # contribute 0, matching money_sum/q91 (SUM skips NULL). An
        # unmasked floor(NaN).astype(int64) poisons the accumulator
        # with INT64_MIN forever.
        vals = pdf["value"].to_numpy(dtype="float64")
        vals = np.where(np.isnan(vals), 0.0, vals)
        micros += int(
            np.floor(vals * 1000000.0 + 0.5).astype("int64").sum()
        )
    state.update((n, micros))
    import pandas as pd

    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            # TRUNCATE at cents, not round(): the money_sum discipline
            # the batch twin (q27/q91) emits — round() disagreed by
            # 0.01 whenever the micro remainder crossed 5000, and bare
            # // floors (not truncs) negative totals one cent low
            "total_value": [py_money_from_micros(micros)],
        }
    )


def running_user_state(stream: DataFrame) -> DataFrame:
    """Per-user running totals, maintained in state across micro-batches
    and emitted on every update."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_available_now(
    spark: SparkSession, landing_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    from football_lakehouse_spark.streaming.ingest import read_landing_stream

    stream = read_landing_stream(spark, landing_dir)

    # parquet sinks reject update mode → append each update batch via
    # foreachBatch (the standard pattern for update-mode file output)
    def _append(batch: DataFrame, _epoch: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    q = (
        running_user_state(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
