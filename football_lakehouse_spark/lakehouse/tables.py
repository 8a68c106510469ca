"""Versioned lakehouse tables on plain parquet.

The reference stores everything in Delta tables and leans on Delta for
append/overwrite sinks, MERGE, time travel, OPTIMIZE/VACUUM and
small-file controls (SURVEY.md §2.1 S4-S6, §2.13). delta-spark is not
in this image, so this module provides the same contract on parquet +
a JSON manifest — a deliberately small, single-writer transaction log:

    <root>/<schema>/<table>/
        _manifest.json          # versions: [{version, operation, files, ts}]
        data/<partition dirs>/<version>-<n>.parquet

Every commit is copy-on-write at file granularity: a version lists the
exact data files that make it up; readers resolve a version to its file
list and read with ``option("basePath", data_root)`` so Spark still
infers partition columns and PRUNES partitions from the file list.

Semantics matched to the reference:
- ``append``      → S4 Delta append sink (with optional content-hash
                    idempotence — D2's (snapshot_date, sha256) skip)
- ``overwrite``   → S5 overwrite-publish (overwriteSchema semantics:
                    the written schema wins)
- ``merge``       → JN4 Delta MERGE (upsert by key, rerun-safe);
                    partition-scoped rewrite when the table is
                    partitioned (only partitions present in the update
                    batch are rewritten)
- ``time_travel`` → VERSION AS OF / DESCRIBE HISTORY (§2.13)
- ``vacuum``      → VACUUM (delete files unreachable from retained versions)
- ``compact``     → OPTIMIZE / autoCompact (rewrite current version into
                    right-sized files)

Single-writer by design — the reference runs every pipeline with
``max_concurrent_runs: 1`` (slice_v1_fpl_bootstrap.yml:5), so a
compare-and-swap manifest write is sufficient.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.operators.merge import merge_upsert

MANIFEST = "_manifest.json"


@dataclass
class Version:
    version: int
    operation: str
    files: list[str]  # relative to data/
    ts: float
    rows: int | None = None


class LakehouseTable:
    def __init__(self, spark: SparkSession, root: str, schema: str, name: str,
                 partition_by: Sequence[str] = ()):
        self.spark = spark
        self.base = os.path.join(root, schema, name)
        self.data_root = os.path.join(self.base, "data")
        self.partition_by = list(partition_by)
        os.makedirs(self.data_root, exist_ok=True)

    # ---------------------------------------------------------------- manifest
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base, MANIFEST)

    def _load_manifest(self) -> list[Version]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            raw = json.load(f)
        return [Version(**v) for v in raw["versions"]]

    def _commit(self, operation: str, files: list[str], rows: int | None) -> int:
        versions = self._load_manifest()
        v = Version(
            version=len(versions), operation=operation, files=files,
            ts=time.time(), rows=rows,
        )
        versions.append(v)
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"versions": [vars(x) for x in versions]}, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic CAS (single-writer)
        return v.version

    # ------------------------------------------------------------------ write
    def _stage(self, df: DataFrame) -> list[str]:
        """Write df to a staging dir, move files under data/ with
        version-unique names, return relative paths."""
        txid = uuid.uuid4().hex[:12]
        staging = os.path.join(self.base, f"_staging-{txid}")
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(staging)

        moved: list[str] = []
        for dirpath, _dirs, files in os.walk(staging):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, staging)
                rel_dir = "" if rel_dir == "." else rel_dir
                target_dir = os.path.join(self.data_root, rel_dir)
                os.makedirs(target_dir, exist_ok=True)
                new_name = f"{txid}-{fn}"
                shutil.move(os.path.join(dirpath, fn), os.path.join(target_dir, new_name))
                moved.append(os.path.join(rel_dir, new_name) if rel_dir else new_name)
        shutil.rmtree(staging, ignore_errors=True)
        return sorted(moved)

    def append(self, df: DataFrame) -> int:
        new_files = self._stage(df)
        live = self.current_files()
        return self._commit("append", live + new_files, rows=None)

    def append_if_new(self, df: DataFrame, hash_col: str) -> int | None:
        """Content-hash idempotent append (reference D2: skip the write
        when the payload hash already exists). Existence is a limit-1
        probe against only the hash column — column-pruned scan."""
        if self.exists():
            existing = self.read().select(hash_col)
            incoming = df.select(hash_col).distinct()
            novel = incoming.join(existing, hash_col, "left_anti")
            if novel.limit(1).isEmpty():
                return None
            df = df.join(F.broadcast(novel), hash_col, "left_semi")
        return self.append(df)

    def overwrite(self, df: DataFrame) -> int:
        new_files = self._stage(df)
        return self._commit("overwrite", new_files, rows=None)

    def merge(self, updates: DataFrame, keys: Sequence[str]) -> int:
        """Delta-style MERGE: upsert by key, copy-on-write.

        When the table is partitioned, only the partitions that the
        merge can change are rewritten — untouched partitions keep
        their existing files (the at-scale behaviour; a full rewrite of
        100 TB per merge would be unusable). "Can change" means the
        union of (a) partitions named by the update rows and (b)
        partitions where a matched key CURRENTLY lives — (b) covers the
        Delta-semantics case where an update moves a key to a different
        partition value (e.g. a corrected snapshot_date): the old copy
        must be deleted from the partition it lives in, not retained.

        A partitioned table requires the update batch to carry every
        partition column (the merged rows are rewritten partition-wise
        and Spark needs the values to route them); a batch missing them
        raises a clear error instead of an opaque AnalysisException.
        """
        if not self.exists():
            return self.append(updates)
        base = self.read()
        if self.partition_by:
            missing = set(self.partition_by) - set(updates.columns)
            if missing:
                raise ValueError(
                    f"merge into partitioned table {self.base} requires partition "
                    f"column(s) {sorted(missing)} in the update batch (got "
                    f"{updates.columns}); merged rows cannot be routed to "
                    f"partitions without them"
                )
            # (a) partitions the update rows land in
            parts_new = updates.select(*self.partition_by).distinct()
            # (b) partitions where a matched key currently lives — a key
            # whose partition value changed must be rewritten out of its
            # old partition, or the stale copy survives as a duplicate.
            upd_keys = updates.select(*keys).distinct()
            parts_old = (
                base.join(F.broadcast(upd_keys), list(keys), "left_semi")
                .select(*self.partition_by).distinct()
            )
            parts = parts_new.unionByName(parts_old).distinct()
            touched_base = base.join(F.broadcast(parts), self.partition_by, "left_semi")
            merged = merge_upsert(touched_base, updates, keys)
            new_files = self._stage(merged)
            # partition dir names assume plain scalar values (the engine
            # partitions by dates/ints); Spark's URL-escaping of exotic
            # values is out of scope for the single-writer log
            touched_dirs = [
                "/".join(f"{c}={r[c]}" for c in self.partition_by)
                for r in parts.collect()
            ]
            kept = [
                f for f in self.current_files()
                if not any(f.startswith(d + "/") for d in touched_dirs)
            ]
            return self._commit("merge", kept + new_files, rows=None)
        merged = merge_upsert(base, updates, keys)
        new_files = self._stage(merged)
        return self._commit("merge", new_files, rows=None)

    # ------------------------------------------------------------------- read
    def exists(self) -> bool:
        return bool(self._load_manifest())

    def current_version(self) -> int:
        return self._load_manifest()[-1].version

    def current_files(self) -> list[str]:
        versions = self._load_manifest()
        return list(versions[-1].files) if versions else []

    def read(self, version: int | None = None) -> DataFrame:
        """Read the table at the current (or a time-travelled) version.
        basePath keeps partition-column inference + pruning alive even
        though we hand Spark an explicit file list."""
        versions = self._load_manifest()
        if not versions:
            raise FileNotFoundError(f"table {self.base} has no committed version")
        v = versions[-1] if version is None else versions[version]
        paths = [os.path.join(self.data_root, f) for f in v.files]
        if not paths:
            raise FileNotFoundError(f"version {v.version} of {self.base} is empty")
        return self.spark.read.option("basePath", self.data_root).parquet(*paths)

    def describe_history(self) -> list[dict]:
        """DESCRIBE HISTORY equivalent."""
        return [vars(v) for v in self._load_manifest()]

    # ------------------------------------------------------------ maintenance
    def vacuum(self, retain_last: int = 1) -> int:
        """Delete data files unreachable from the last ``retain_last``
        versions (VACUUM with retention awareness, docs/backlog.md:106).
        Returns number of files deleted. Time travel older than the
        retention horizon stops working — same trade-off as Delta."""
        versions = self._load_manifest()
        keep: set[str] = set()
        for v in versions[-retain_last:]:
            keep.update(v.files)
        deleted = 0
        for dirpath, _dirs, files in os.walk(self.data_root):
            for fn in files:
                rel = os.path.relpath(os.path.join(dirpath, fn), self.data_root)
                if rel not in keep:
                    os.remove(os.path.join(dirpath, fn))
                    deleted += 1
        return deleted

    def compact(self, target_partitions: int = 1) -> int:
        """OPTIMIZE-style small-file compaction: rewrite the current
        version's contents into ``target_partitions`` files (per
        partition dir when partitioned)."""
        df = self.read().coalesce(target_partitions)
        new_files = self._stage(df)
        return self._commit("optimize", new_files, rows=None)
