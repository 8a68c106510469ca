"""Table-format connectors (SURVEY.md §7 Phase 2 risk note;
pyspark_guide 'Sources & sinks': Delta/Iceberg/Hudi jars are not in
this image — gate behind import/classpath checks with the versioned
parquet layer as the functional fallback).

The engine's lakehouse semantics (append/overwrite/MERGE/time travel/
vacuum/compact) are format-agnostic: `LakehouseTable` implements them
on plain parquet + a manifest log; when a delta-spark runtime IS on the
classpath `open_table(prefer='delta')` returns `DeltaBackedTable`, a
thin adapter with the same call surface over the public
`delta.tables.DeltaTable` API (reference declares every table
`USING DELTA` — /root/reference/resources/uc/objects.sql).

The binding below is written ahead of the jar (RUNBOOK.md §8 records
the blocked install attempts): it uses only documented delta-spark
APIs, so the day a jar lands, `scripts/run_delta_branch.sh` runs the
contract suite against it with zero code edits here. Until then every
delta-branch contract param skips cleanly via `delta_available()`,
and a fake-module dry-run test (tests/test_delta_contract.py) asserts
this branch is actually exercised when `import delta` resolves.
"""

from __future__ import annotations

import os
import warnings
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from football_lakehouse_spark.lakehouse.tables import (
    LakehouseTable,
    require_unique_merge_keys,
)


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


class DeltaBackedTable:
    """`LakehouseTable`-shaped adapter over a native Delta table.

    Maps the engine's table surface 1:1 onto the public delta-spark
    API (`delta.tables.DeltaTable` + the `format("delta")` reader/
    writer options documented at delta.io):

      append/overwrite      -> df.write.format("delta").mode(...)
      merge                 -> DeltaTable.merge().whenMatchedUpdateAll()
                                 .whenNotMatchedInsertAll()
      delete/update         -> DeltaTable.delete/update
      read(version=v)       -> reader option("versionAsOf", v)
      describe_history      -> DeltaTable.history()
      compact               -> DeltaTable.optimize().executeCompaction()
                                 / .executeZOrderBy(sort_by)
      vacuum                -> DeltaTable.vacuum(0h) with the documented
                                 retentionDurationCheck override
      restore               -> DeltaTable.restoreToVersion
      constraints           -> ALTER TABLE ... ADD/DROP CONSTRAINT
                                 (delta.constraints.* table properties)
      change feed           -> delta.enableChangeDataFeed property +
                                 reader option("readChangeFeed", true)

    Instantiating this class requires delta-spark on the classpath
    (`delta_available()`); `open_table` enforces that. Never validated
    against a real jar in this image (RUNBOOK §8: installs are
    DNS-blocked) — the contract suite in tests/test_delta_contract.py
    is the validation procedure, runnable unchanged the day a jar
    drops in via scripts/run_delta_branch.sh.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema: str,
        name: str,
        partition_by: Sequence[str] = (),
    ) -> None:
        from delta.tables import DeltaTable  # hard requirement, by design

        self._DeltaTable = DeltaTable
        self.spark = spark
        self.base = os.path.join(root, schema, name)
        self.partition_by = tuple(partition_by)

    # -- plumbing ---------------------------------------------------------

    def exists(self) -> bool:
        return bool(self._DeltaTable.isDeltaTable(self.spark, self.base))

    def _dt(self):
        return self._DeltaTable.forPath(self.spark, self.base)

    def _sql_ref(self) -> str:
        # Path-addressed table for ALTER/SET TBLPROPERTIES statements.
        return f"delta.`{self.base}`"

    def _writer(self, df: DataFrame, mode: str):
        w = df.write.format("delta").mode(mode)
        # ALWAYS declare partitioning when configured: overwrite sets
        # overwriteSchema=true, which REPLACES the table's partitioning
        # with the writer's — the old exists() guard silently
        # unpartitioned the table on the first overwrite (append to an
        # existing table ignores a matching partitionBy, so declaring
        # it is safe there and required here)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    # -- reads ------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        r = self.spark.read.format("delta")
        if version is not None:
            r = r.option("versionAsOf", int(version))
        return r.load(self.base)

    def current_version(self) -> int:
        row = self._dt().history(1).select("version").head()
        return int(row["version"])

    def current_files(self) -> list[str]:
        # Relative data-file paths of the live snapshot (parity with
        # LakehouseTable.current_files). inputFiles() is the documented
        # public surface for the snapshot's file set.
        prefix = self.base.rstrip("/") + "/"
        out = []
        for f in self.read().inputFiles():
            f = f.removeprefix("file:")
            out.append(f.removeprefix(prefix))
        return sorted(out)

    def describe_history(self) -> list[dict]:
        """LakehouseTable-shaped history: oldest first, operations
        normalised to the engine's lowercase vocabulary."""
        op_map = {
            "WRITE": "append",  # refined below from operationParameters.mode
            "MERGE": "merge",
            "DELETE": "delete",
            "UPDATE": "update",
            "OPTIMIZE": "optimize",
            "RESTORE": "restore",
            "VACUUM END": "vacuum",
            "SET TBLPROPERTIES": "set_properties",
            "ADD CONSTRAINT": "set_properties",
            "DROP CONSTRAINT": "set_properties",
            "CREATE TABLE AS SELECT": "overwrite",
            "CREATE OR REPLACE TABLE AS SELECT": "overwrite",
        }
        rows = (
            self._dt()
            .history()
            .select("version", "operation", "operationParameters", "timestamp")
            .collect()
        )
        hist = []
        for r in sorted(rows, key=lambda r: r["version"]):
            op = op_map.get(r["operation"], r["operation"].lower())
            params = r["operationParameters"] or {}
            if r["operation"] == "WRITE" and str(params.get("mode", "")).lower() in (
                "overwrite",
                "errorifexists-overwrite",
            ):
                op = "overwrite"
            hist.append(
                {
                    "version": int(r["version"]),
                    "operation": op,
                    "ts": r["timestamp"].timestamp(),
                }
            )
        return hist

    # -- writes -----------------------------------------------------------

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        w = self._writer(df, "append")
        if merge_schema:
            w = w.option("mergeSchema", "true")
        w.save(self.base)
        return self.current_version()

    def overwrite(self, df: DataFrame) -> int:
        w = self._writer(df, "overwrite").option("overwriteSchema", "true")
        w.save(self.base)
        return self.current_version()

    def merge(self, updates: DataFrame, keys: Sequence[str]) -> int:
        """Upsert by key — Delta MERGE with null-safe key equality
        (parity with LakehouseTable.merge, which matches NULL keys).
        Duplicate source keys are REJECTED before the MERGE with the
        shared :class:`MergeSourceDuplicateError` (ADVICE r9, sharpened
        r10: the first fix dropDuplicates'd them, but that keeps a
        nondeterministic arbitrary row — silently unstable upserts are
        worse than Delta's loud multiple-source-rows-matched error, so
        both bindings now validate identically and fail findably)."""
        require_unique_merge_keys(updates, keys, f"delta merge into {self.base}")
        if not self.exists():
            # first batch bootstraps the table, as the parquet branch does
            return self.append(updates)
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        (
            self._dt()
            .alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.current_version()

    def delete(self, predicate: Column, deletion_vectors: bool = False) -> int:
        """Returns the new version, or -1 when no row matched (parity
        with LakehouseTable.delete's no-op contract). NOTE eager action:
        prices the predicate with a count() before mutating."""
        if self.read().where(predicate).limit(1).count() == 0:
            return -1
        if deletion_vectors:
            self.spark.sql(
                f"ALTER TABLE {self._sql_ref()} SET TBLPROPERTIES "
                "('delta.enableDeletionVectors' = 'true')"
            )
        self._dt().delete(predicate)
        return self.current_version()

    def update(self, predicate: Column, assignments: dict[str, Column]) -> int:
        self._dt().update(predicate, assignments)
        return self.current_version()

    # -- maintenance ------------------------------------------------------

    def compact(self, target_partitions: int = 1, sort_by: Sequence[str] | None = None) -> int:
        """Delta OPTIMIZE bin-packs to a target FILE SIZE, not a file
        count, so ``target_partitions`` is advisory here (ADVICE r9:
        never silently ignore it — compaction is non-destructive, so a
        layout hint that cannot be honoured warns instead of raising;
        contrast vacuum(), where the divergence would destroy data)."""
        if target_partitions != 1:
            warnings.warn(
                "DeltaBackedTable.compact: Delta OPTIMIZE bin-packs by file "
                f"size; target_partitions={target_partitions} is ignored "
                "(tune spark.databricks.delta.optimize.maxFileSize instead)",
                stacklevel=2,
            )
        opt = self._dt().optimize()
        if sort_by:
            opt.executeZOrderBy(*sort_by)
        else:
            opt.executeCompaction()
        return self.current_version()

    def vacuum(self, retain_last: int = 1) -> int:
        """Delta retention is time-based, not version-count-based; the
        engine's retain_last maps to an aggressive 0-hour vacuum (the
        documented retentionDurationCheck override), which keeps exactly
        the live snapshot — the retain_last=1 case every internal caller
        uses. Any OTHER retain_last is refused loudly (ADVICE r9):
        silently running vacuum(0h) for retain_last=5 would delete every
        non-live data file and destroy time travel the caller asked to
        keep — a destructive divergence from LakehouseTable.vacuum,
        which retains the last N versions' files. Returns the number of
        files reclaimed, counted by an on-disk listing diff (vacuum does
        not change the live snapshot, so inputFiles() cannot observe the
        reclaim)."""
        if retain_last != 1:
            raise ValueError(
                "DeltaBackedTable.vacuum: Delta retention is time-based; only "
                f"retain_last=1 maps faithfully (got {retain_last}). Running "
                "vacuum(0h) here would delete all non-live files and break "
                "time travel to every prior version — use "
                "deltaTable.vacuum(hours) with a retention horizon instead."
            )

        def _disk_files() -> set[str]:
            found = set()
            for dirpath, dirnames, filenames in os.walk(self.base):
                dirnames[:] = [d for d in dirnames if d != "_delta_log"]
                for fn in filenames:
                    found.add(os.path.join(dirpath, fn))
            return found

        before = _disk_files()
        conf = "spark.databricks.delta.retentionDurationCheck.enabled"
        prev = self.spark.conf.get(conf, "true")
        self.spark.conf.set(conf, "false")
        try:
            self._dt().vacuum(0)
        finally:
            self.spark.conf.set(conf, prev)
        return len(before - _disk_files())

    def restore(self, version: int) -> int:
        self._dt().restoreToVersion(int(version))
        return self.current_version()

    # -- constraints ------------------------------------------------------

    def add_constraint(self, name: str, predicate_sql: str) -> None:
        self.spark.sql(
            f"ALTER TABLE {self._sql_ref()} ADD CONSTRAINT {name} CHECK ({predicate_sql})"
        )

    def drop_constraint(self, name: str) -> None:
        self.spark.sql(f"ALTER TABLE {self._sql_ref()} DROP CONSTRAINT {name}")

    def constraints(self, version: int | None = None) -> dict[str, str]:
        """CHECK constraints from delta.constraints.* table properties.
        Version-addressed property history is not exposed through the
        public DeltaTable API, so ``version`` is FAIL-CLOSED rather
        than silently answered with current-version properties (a
        time-travel parity check would otherwise read wrong data and
        pass)."""
        if version is not None:
            raise NotImplementedError(
                "DeltaBackedTable.constraints(version=...) — the public "
                "Delta API does not expose versioned table properties; "
                "read current constraints (version=None) or use "
                "LakehouseTable for versioned constraint history"
            )
        props = self._dt().detail().select("properties").head()["properties"] or {}
        pre = "delta.constraints."
        return {k[len(pre):]: v for k, v in props.items() if k.startswith(pre)}

    # -- change feed ------------------------------------------------------

    def enable_change_feed(self) -> None:
        self.spark.sql(
            f"ALTER TABLE {self._sql_ref()} SET TBLPROPERTIES "
            "('delta.enableChangeDataFeed' = 'true')"
        )

    def change_feed_enabled(self) -> bool:
        props = self._dt().detail().select("properties").head()["properties"] or {}
        return str(props.get("delta.enableChangeDataFeed", "")).lower() == "true"

    def table_changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """CDF read; column shape matched to LakehouseTable.table_changes
        (leading `version`, `change_type`, then data columns). Delta's
        startingVersion is inclusive-of-changes-AT-that-version while the
        engine's v_from means 'changes from v_from to v_to', so shift."""
        r = (
            self.spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", int(v_from) + 1)
        )
        if v_to is not None:
            r = r.option("endingVersion", int(v_to))
        df = r.load(self.base)
        data_cols = [
            c for c in df.columns
            if c not in ("_change_type", "_commit_version", "_commit_timestamp")
        ]
        return df.select(
            F.col("_commit_version").alias("version"),
            F.col("_change_type").alias("change_type"),
            *data_cols,
        )


def open_table(
    spark: SparkSession, root: str, schema: str, name: str, partition_by=(),
    prefer: str = "auto",
):
    """Open (or create-on-first-write) a lakehouse table with the best
    available format. ``prefer`` ∈ {auto, parquet, delta}.

    - ``prefer='delta'`` + delta-spark on classpath → `DeltaBackedTable`
      (native binding over the public DeltaTable API). Without the jar
      it raises ModuleNotFoundError with the supported alternative.
    - ``prefer='auto'`` and ``'parquet'`` → manifest-log versioned
      parquet (`lakehouse.tables.LakehouseTable`) with the same
      semantics. `auto` stays on the parquet branch even when delta is
      importable, deliberately: the native binding graduates to the
      auto path only after the contract suite has passed against a
      real jar (scripts/run_delta_branch.sh is that validation run).
    """
    if prefer == "delta":
        if not delta_available():
            raise ModuleNotFoundError(
                "delta-spark is not installed in this environment; use "
                "prefer='parquet' (LakehouseTable provides append/overwrite/"
                "MERGE/time-travel/vacuum on parquet + manifest log)"
            )
        return DeltaBackedTable(spark, root, schema, name, partition_by=partition_by)
    if prefer not in ("auto", "parquet"):
        raise ValueError(f"unknown table format preference: {prefer!r}")
    return LakehouseTable(spark, root, schema, name, partition_by=partition_by)
