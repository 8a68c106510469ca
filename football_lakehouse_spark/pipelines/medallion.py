"""Medallion pipeline — the reference's Bronze→Silver→Gold contract
(SURVEY.md §1.1, §3 EP1-EP3) re-expressed over the fixture ``events``
stream on versioned lakehouse tables.

Mapping to the reference:
- Bronze  = raw, append-only, replayable: one row per event with the
  payload kept as a permissive JSON string + ingest metadata + sha256
  (reference bronze.fpl_bootstrap_raw, resources/uc/objects.sql:16-28),
  partitioned by snapshot_date — fixing the reference's
  declared-but-missing ``PARTITIONED BY`` (SURVEY.md §1.4).
- Silver  = typed, conformed, deduplicated entities with deterministic
  PKs + fail-fast DQ gates (31_build_silver_dims.py).
- Gold    = pre-joined business facts: per-user live state, rolling
  form, value deltas (41/42 + declared 43/44).

Differences from the reference, by design (SURVEY.md §4 'driver-side
bottlenecks'): payload parsing happens IN-PLAN via from_json — there is
no collect()-and-reparse of the latest snapshot; the latest-good-
snapshot selection is a window argmax, fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.functions.scalars import money_sum
from football_lakehouse_spark.lakehouse.tables import LakehouseTable
from football_lakehouse_spark.operators.merge import dedupe_updates
from football_lakehouse_spark.operators.quality import assert_not_empty, assert_pk
from football_lakehouse_spark.operators.rolling import rolling_form_features

BRONZE_EVENTS = ("bronze", "events_raw")
SILVER_EVENTS = ("silver", "event")
GOLD_LIVE_STATE = ("gold", "fact_live_state")
GOLD_FORM = ("gold", "fact_live_form")


def _payload(df: DataFrame) -> F.Column:
    """Canonical JSON payload (reference canonicalises with sorted keys;
    to_json emits struct fields in a fixed declared order, which is the
    distributed equivalent)."""
    return F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    )


def ingest_bronze(spark: SparkSession, events: DataFrame, table: LakehouseTable) -> int | None:
    """EP1: append-only Bronze ingest with content-hash idempotence.
    Re-running on the same input commits nothing (reference D2)."""
    payload = _payload(events)
    bronze = events.select(
        F.col("event_id").alias("source_event_id"),
        F.to_date("ts").alias("snapshot_date"),
        F.col("ts").alias("snapshot_ts"),
        payload.alias("payload_json"),
        F.sha2(payload, 256).alias("payload_sha256"),
        F.length(payload).cast("bigint").alias("payload_size_bytes"),
        F.lit(200).alias("http_status"),
        F.current_timestamp().alias("ingest_ts"),
    )
    return table.append_if_new(bronze, "payload_sha256")


def build_silver(spark: SparkSession, bronze: LakehouseTable, silver: LakehouseTable) -> int:
    """EP2: parse Bronze payloads in-plan, conform types, dedupe on the
    deterministic key, run DQ gates, then publish (overwrite)."""
    raw = bronze.read().where(F.col("http_status") == 200)
    assert_not_empty(raw, "bronze.events_raw (http_status=200)")

    # the corrupt-record column is the ONLY reliable parse-failure
    # signal: PERMISSIVE from_json returns a struct of NULL fields for
    # malformed input (never a NULL struct — verified on this PySpark),
    # and worse, a record whose PK parses but whose other fields are
    # garbled (`"value": "oops"`) yields a silently half-nulled row.
    # With columnNameOfCorruptRecord, every corruption shape — garbage,
    # truncation, per-field type mismatch — lands the raw line in
    # j._corrupt and the J2 gate actually fires.
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING, _corrupt STRING"
    )
    # persist the parsed batch: the parse-failure probe, the PK gate,
    # and the publish are three separate actions — unpersisted, each
    # re-parses every bronze payload (r12 review: 3-4× the dominant
    # cost at scale)
    parsed = raw.withColumn(
        "j",
        F.from_json(
            "payload_json", schema, {"columnNameOfCorruptRecord": "_corrupt"}
        ),
    ).persist()
    try:
        bad = parsed.where(F.col("j").isNull() | F.col("j._corrupt").isNotNull())
        if not bad.limit(1).isEmpty():  # J2 parse-failure guard
            raise ValueError("silver.event: unparseable bronze payloads")

        typed = parsed.select(
            F.col("j.event_id").alias("event_id"),
            F.col("j.ts").alias("event_ts"),
            F.col("j.user_id").alias("user_id"),
            F.col("j.event_type").alias("event_type"),
            F.col("j.value").alias("value"),
            F.get_json_object("j.props", "$.k").cast("bigint").alias("prop_k"),
            F.col("snapshot_date"),
        )
        deduped = dedupe_updates(typed, ["event_id"], ["event_ts", "event_id"])
        assert_pk(deduped, "event_id", name="silver.event")
        return silver.overwrite(deduped)
    finally:
        parsed.unpersist()


def build_gold(spark: SparkSession, silver: LakehouseTable,
               live_state: LakehouseTable, form: LakehouseTable) -> tuple[int, int]:
    """EP3: publish Gold facts — per-user live state (ST5 end-state) and
    rolling form features (A7) — with PK gates before every write."""
    ev = silver.read()

    # persist each gold plan: the PK gate and the publish are separate
    # actions — unpersisted, every aggregate/window recomputes per
    # action (r12 review)
    state = ev.groupBy("user_id").agg(
        F.max_by("event_type", F.struct(F.col("event_ts"), F.col("event_id"))).alias(
            "last_event_type"
        ),
        # exact micros, not round(sum(double)): a float sum is partition-
        # order dependent, so the "rerun-safe" pipeline could publish a
        # different gold value per run near a .005 boundary
        money_sum(F.col("value")).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("event_ts").alias("last_seen_ts"),
    ).persist()
    try:
        assert_pk(state, "user_id", name="gold.fact_live_state")
        v1 = live_state.overwrite(state)
    finally:
        state.unpersist()

    # the SHARED A7 form pair (operators/rolling) — same definition the
    # q25 registry query publishes, so pipeline and query cannot drift
    form_df = ev.select(
        "event_id",
        "user_id",
        "event_ts",
        *rolling_form_features(ev, "user_id", ["event_ts", "event_id"], "value"),
    ).persist()
    try:
        assert_pk(form_df, "event_id", name="gold.fact_live_form")
        v2 = form.overwrite(form_df)
    finally:
        form_df.unpersist()
    return v1, v2


def publish_gold_dim(
    source: DataFrame,
    dim_table: LakehouseTable,
    projection: list[F.Column],
    pk: str,
    name: str,
) -> int:
    """EP3 step 1 (reference ``41_publish_gold_dims.py``): per-dim
    projection/cast/rename plan → PK gate → overwrite-publish. The
    written schema is authoritative (SURVEY.md §1.3 overwrite-defined)."""
    dim = source.select(*projection)
    assert_pk(dim, pk, name=name)
    return dim_table.overwrite(dim)


def run_pipeline(spark: SparkSession, events: DataFrame, root: str) -> dict[str, int | None]:
    """Full slice: bronze → silver → gold (reference workflow
    slice_v1_fpl_bootstrap.yml DAG). Rerun-safe end to end."""
    bronze = LakehouseTable(spark, root, *BRONZE_EVENTS, partition_by=["snapshot_date"])
    silver = LakehouseTable(spark, root, *SILVER_EVENTS, partition_by=["snapshot_date"])
    live_state = LakehouseTable(spark, root, *GOLD_LIVE_STATE)
    form = LakehouseTable(spark, root, *GOLD_FORM)

    b = ingest_bronze(spark, events, bronze)
    s = build_silver(spark, bronze, silver)
    g1, g2 = build_gold(spark, silver, live_state, form)
    return {"bronze": b, "silver": s, "gold_live_state": g1, "gold_form": g2}
