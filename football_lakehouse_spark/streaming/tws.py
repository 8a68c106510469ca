"""Arbitrary stateful streaming via Spark 4's ``transformWithStateInPandas``
(the StatefulProcessor successor to ``applyInPandasWithState`` — typed
state handles, multiple state variables per key, optional TTL/timers).

Mirrors :mod:`.stateful`'s running per-user accumulator so the two
stateful APIs are PARITY-TESTED against each other (same landing input
→ same final state): the engine keeps the old operator as the
broad-compat path and this one as the forward path — Spark's docs mark
applyInPandasWithState for eventual deprecation in favour of
transformWithState.

What the new API buys at 100 TB: state variables are individually
addressable (ValueState/ListState/MapState) and lazily materialized,
so a processor touching one small counter does not deserialize a
session's whole blob; TTL-bearing state (``getValueState(ttl=...)``)
lets idle keys expire without a timer round-trip. Neither is
expressible in the old single-tuple-state API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from football_lakehouse_spark.functions.scalars import py_money_from_micros


def tws_available() -> bool:
    """transformWithState's state-server protocol needs google.protobuf
    (not shipped in every image — absent here, like the delta jar; see
    RUNBOOK §8's gating policy). The operator and its parity test
    activate the moment protobuf is installed."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

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


class RunningUserTotals(StatefulProcessor):
    """ValueState-backed running (count, sum) per user — the
    transformWithState twin of stateful._update_user_state. State is
    EXACT integer micros (see the stateful.py note: a round()ed double
    in state makes totals depend on micro-batch boundaries)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np
        import pandas as pd

        prev = self._agg.get()
        n, micros = (prev[0], prev[1]) if prev is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            # NaN (NULL value) contributes 0 — matches money_sum/q91;
            # unmasked it poisons the accumulator with INT64_MIN
            vals = pdf["value"].to_numpy(dtype="float64")
            vals = np.where(np.isnan(vals), 0.0, vals)
            micros += int(
                np.floor(vals * 1000000.0 + 0.5).astype("int64").sum()
            )
        self._agg.update((n, micros))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                # truncate at cents (money_sum discipline) — never
                # round(), and never bare // (floors negatives low)
                "total_value": [py_money_from_micros(micros)],
            }
        )

    def close(self) -> None:
        pass


def running_user_state_tws(stream: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas, emitted
    on every update — drop-in equivalent of stateful.running_user_state."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
