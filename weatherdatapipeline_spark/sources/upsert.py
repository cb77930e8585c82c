"""Delta-style upsert table: MERGE semantics on plain Parquet.

The reference replaces whole MongoDB collections to get upsert semantics
(load.py:46-62 delete_many + insert_many). On a data lake that pattern is a
full-table rewrite per merge — unusable at 100 TB. This module implements
the standard lakehouse answer (Delta/Iceberg copy-on-write) with nothing
but Parquet + an atomically-swapped JSON pointer:

- Data lives in immutable version directories ``data/v=N/[pcol=V/]``.
- A manifest maps each partition value -> the version directory holding its
  CURRENT data. A merge rewrites ONLY the partitions the update batch
  touches; every other partition keeps its old file — at 100 TB with daily
  partitions, merging one day rewrites one day.
- The manifest history is kept per version: old versions stay readable
  (time travel) until ``vacuum`` drops them.
- Metadata commits via write-temp + ``os.replace`` (atomic on POSIX), so a
  reader sees either the old or the new manifest, never a torn one.
  Single-writer, like Delta without a commit coordinator.

Merge semantics (Delta ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT``): within each touched partition, existing rows whose ``key``
matches an update row are replaced; unmatched existing rows are kept; new
keys are inserted. Keys are unique per partition (the Delta convention —
the same key in two partitions is two rows).

Constraints (v1): single writer; schema of updates must equal the table
schema unless ``merge(..., schema_evolution=True)`` (adds columns, Delta
``mergeSchema`` style); partition values must be path-safe scalars (ints,
dates, simple strings).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Raised by ``UpsertTable.merge(expected_version=...)`` when another
    writer committed between the caller's snapshot read and this commit —
    the optimistic-concurrency conflict every lakehouse commit protocol
    surfaces. Recovery is the standard CAS loop: re-read, re-derive the
    updates against the new snapshot, retry."""


class UpsertTable:
    """A MERGE-able Parquet table rooted at ``root/name``."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        key: str,
        partition_col: str | None = None,
    ):
        self.spark = spark
        self.key = key
        self.partition_col = partition_col
        self.table_root = os.path.join(root, name)
        self.data_root = os.path.join(self.table_root, "data")
        self.meta_path = os.path.join(self.table_root, "_meta.json")

    # --- metadata ------------------------------------------------------

    def _load_meta(self) -> dict | None:
        if not os.path.exists(self.meta_path):
            return None
        with open(self.meta_path) as f:
            return json.load(f)

    def _commit_meta(self, meta: dict) -> None:
        os.makedirs(self.table_root, exist_ok=True)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)  # atomic pointer swap

    @property
    def current_version(self) -> int | None:
        meta = self._load_meta()
        return None if meta is None else meta["version"]

    def _manifest(self, version: int | None = None) -> dict[str, int]:
        """partition value (as string) -> version dir holding its data."""
        meta = self._load_meta()
        if meta is None:
            return {}
        v = meta["version"] if version is None else version
        hist = {int(k): m for k, m in meta["history"].items()}
        if v not in hist:
            raise ValueError(f"version {v} not in history {sorted(hist)}")
        return hist[v]

    # --- read ----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: current). Partition
        pruning still works: the manifest enumerates directories, and a
        filter on the partition column prunes within them. ``mergeSchema``
        is on so partitions written before a schema evolution read as the
        union schema (old rows NULL in new columns)."""
        manifest = self._manifest(version)
        if not manifest:
            raise FileNotFoundError(f"empty upsert table at {self.table_root}")
        if self.partition_col is None:
            v = manifest["__ALL__"]
            return self.spark.read.option("mergeSchema", "true").parquet(
                os.path.join(self.data_root, f"v={v}")
            )
        paths = [
            os.path.join(self.data_root, f"v={v}", f"{self.partition_col}={p}")
            for p, v in manifest.items()
        ]
        # basePath recovers v + partition col from dir names; v is internal
        return (
            self.spark.read.option("basePath", self.data_root)
            .option("mergeSchema", "true")
            .parquet(*paths)
            .drop("v")
        )

    def _read_partitions(self, manifest: dict[str, int], parts: list[str]) -> DataFrame | None:
        live = {p: manifest[p] for p in parts if p in manifest}
        if not live:
            return None
        paths = [
            os.path.join(self.data_root, f"v={v}", f"{self.partition_col}={p}")
            for p, v in live.items()
        ]
        return (
            self.spark.read.option("basePath", self.data_root)
            .option("mergeSchema", "true")
            .parquet(*paths)
            .drop("v")
        )

    # --- write ---------------------------------------------------------

    def _write_version(self, df: DataFrame, version: int) -> None:
        path = os.path.join(self.data_root, f"v={version}")
        w = df.write.mode("errorifexists")
        if self.partition_col is not None:
            w = w.partitionBy(self.partition_col)
        w.parquet(path)

    def _touched(self, updates: DataFrame) -> list[str]:
        # one tiny distinct over the update batch; bounded by the number of
        # partitions a batch touches (days, not rows)
        rows = updates.select(self.partition_col).distinct().collect()
        return [str(r[0]) for r in rows]

    def merge(
        self,
        updates: DataFrame,
        schema_evolution: bool = False,
        expected_version: int | None = None,
    ) -> int:
        """Upsert ``updates``; returns the new version number.

        Only the partitions present in ``updates`` are re-written; all
        others are carried forward by manifest reference (zero I/O).

        With ``schema_evolution`` (Delta ``mergeSchema``), updates may add
        columns: kept rows in rewritten partitions get NULLs, and
        partitions carried forward read as NULL via mergeSchema. Without
        it, a schema mismatch raises (unionByName strictness).

        ``expected_version`` enables OPTIMISTIC CONCURRENCY (the Delta/
        Iceberg commit protocol): pass the version your read snapshot was
        taken at, and the merge raises ``ConcurrentWriteError`` if
        another writer committed since — re-read and retry, like any CAS
        loop. The check runs twice: before planning and again right
        before the metadata commit, closing (best-effort, single
        metastore) the window where a slow merge overlaps a fast one.
        Without it, last-commit-wins (the old behavior).
        """
        meta = self._load_meta()
        if expected_version is not None:
            cur = None if meta is None else meta["version"]
            if cur != expected_version:
                raise ConcurrentWriteError(
                    f"expected table version {expected_version}, found {cur}: "
                    "another writer committed; re-read and retry"
                )
        if meta is None:
            self._write_version(updates, 0)
            manifest = (
                {"__ALL__": 0}
                if self.partition_col is None
                else {p: 0 for p in self._touched(updates)}
            )
            self._commit_meta({"version": 0, "history": {"0": manifest}})
            return 0

        version = meta["version"] + 1
        manifest = dict(self._manifest())
        if self.partition_col is None:
            current = self.read()
            merged = current.join(updates, self.key, "left_anti").unionByName(
                updates, allowMissingColumns=schema_evolution
            )
            self._write_version(merged, version)
            new_manifest = {"__ALL__": version}
        else:
            touched = self._touched(updates)
            current = self._read_partitions(manifest, touched)
            if current is None:
                merged = updates
            else:
                # dir-name partition values re-infer their type on read
                # (pcol="1" comes back int); align to the update schema
                current = current.withColumn(
                    self.partition_col,
                    F.col(self.partition_col).cast(
                        updates.schema[self.partition_col].dataType
                    ),
                )
                keep = current.join(
                    updates.select(self.key, self.partition_col),
                    [self.key, self.partition_col],
                    "left_anti",
                )
                merged = keep.unionByName(
                    updates, allowMissingColumns=schema_evolution
                )
            self._write_version(merged, version)
            new_manifest = {**manifest, **{p: version for p in touched}}
        if expected_version is not None:
            latest = self._load_meta()
            cur = None if latest is None else latest["version"]
            if cur != expected_version:
                raise ConcurrentWriteError(
                    f"table advanced to version {cur} during merge "
                    f"(expected {expected_version}): aborting commit"
                )
        meta["version"] = version
        meta["history"][str(version)] = new_manifest
        self._commit_meta(meta)
        return version

    def delete_where(self, predicate: str, partitions: list[str] | None = None) -> int:
        """Delta ``DELETE WHERE``: rewrite the affected partitions without
        the matching rows. ``partitions`` scopes the rewrite (recommended —
        an unscoped delete on a partitioned table rewrites every
        partition)."""
        meta = self._load_meta()
        if meta is None:
            raise FileNotFoundError(f"empty upsert table at {self.table_root}")
        version = meta["version"] + 1
        manifest = dict(self._manifest())
        # SQL DELETE removes only predicate-TRUE rows; a NULL predicate must
        # KEEP the row. Bare NOT(NULL)=NULL would silently drop it.
        keep = f"NOT coalesce(({predicate}), false)"
        if self.partition_col is None:
            merged = self.read().filter(keep)
            self._write_version(merged, version)
            new_manifest = {"__ALL__": version}
        else:
            parts = list(manifest) if partitions is None else [str(p) for p in partitions]
            current = self._read_partitions(manifest, parts)
            if current is None:
                return meta["version"]
            merged = current.filter(keep)
            self._write_version(merged, version)
            new_manifest = {**manifest, **{p: version for p in parts if p in manifest}}
        meta["version"] = version
        meta["history"][str(version)] = new_manifest
        self._commit_meta(meta)
        return version

    def read_changes(self, since_version: int, to_version: int | None = None) -> DataFrame:
        """Change-data-feed read: rows inserted or updated after
        ``since_version`` up to ``to_version`` (default current), tagged
        with a ``_change_type`` column ('insert' | 'update_postimage' —
        the Delta CDF vocabulary; deletes surface only as absence).

        Cost is proportional to the CHANGED partitions only: the manifest
        diff names the partitions whose version moved, and the key-level
        diff reads just those partitions at the two snapshots — a 100 TB
        table with one merged day reads two copies of one day.
        """
        old = self._manifest(since_version)
        new = self._manifest(to_version)
        moved = [p for p, v in new.items() if old.get(p) != v]
        if not moved:
            return self.read().limit(0).withColumn("_change_type", F.lit(""))
        if self.partition_col is None:
            after = self.read(to_version)
            before = self.read(since_version)
        else:
            after = self._read_partitions(new, moved)
            before = self._read_partitions(old, moved)
        join_keys = [self.key] + (
            [self.partition_col] if self.partition_col else []
        )
        if before is None:
            return after.withColumn("_change_type", F.lit("insert"))
        keyed_before = before.select(
            *[F.col(k).alias(f"_b_{k}") for k in join_keys]
        )
        cond = [F.col(k) == F.col(f"_b_{k}") for k in join_keys]
        tagged = (
            after.join(F.broadcast(keyed_before.distinct()), cond, "left")
            .withColumn(
                "_change_type",
                F.when(F.col(f"_b_{self.key}").isNull(), "insert").otherwise(
                    "update_postimage"
                ),
            )
            .drop(*[f"_b_{k}" for k in join_keys])
        )
        # an "update" whose row is byte-identical to the pre-image is not a
        # change; subtract unchanged rows so re-merging the same data CDFs
        # to empty. Compare on the columns both snapshots share — after a
        # schema evolution an update that only populates a NEW column on an
        # otherwise-identical row is therefore not surfaced (caveat shared
        # with common-column CDC diffs). NULL-safe equality: a carried-
        # forward row with a NULL in any common column must still match its
        # identical pre-image (plain `=` would yield NULL and report the
        # row as a phantom update_postimage forever).
        common = [c for c in after.columns if c in before.columns]
        before_aliased = before.select(
            *[F.col(c).alias(f"_b2_{c}") for c in common]
        )
        unchanged = [F.col(c).eqNullSafe(F.col(f"_b2_{c}")) for c in common]
        return tagged.join(before_aliased, unchanged, "left_anti")

    # --- maintenance ---------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop version directories referenced only by manifests older than
        the last ``keep_last`` versions. Returns removed version numbers."""
        meta = self._load_meta()
        if meta is None:
            return []
        versions = sorted(int(k) for k in meta["history"])
        kept = versions[-keep_last:]
        referenced = {v for k in kept for v in meta["history"][str(k)].values()}
        removed = []
        for v in versions:
            dir_ = os.path.join(self.data_root, f"v={v}")
            if v not in referenced and os.path.isdir(dir_):
                shutil.rmtree(dir_)
                removed.append(v)
        meta["history"] = {str(k): meta["history"][str(k)] for k in kept}
        self._commit_meta(meta)
        return removed


def merge_sink(table: UpsertTable):
    """foreachBatch adapter: stream micro-batches MERGE into the table —
    the Delta-style streaming upsert sink. Dedup the batch on (key[,
    partition]) first if the source can repeat keys within one batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = [table.key] + (
            [table.partition_col] if table.partition_col else []
        )
        table.merge(batch_df.dropDuplicates(cols))

    return sink


def maintain_daily_rollup(
    table: UpsertTable,
    batch: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    batch_id: int | None = None,
) -> int:
    """Incremental materialized-rollup maintenance: fold one batch of
    raw events into a persistent per-(key, day) aggregate table without
    recomputing history — the materialized-view pattern that turns a
    100 TB scan-per-dashboard-query into a rollup-sized read.

    Only DECOMPOSABLE aggregates are maintained (count, sum, min, max —
    mean derives as sum/n): each batch contributes a partial, and
    partial ⊕ stored combines cell-wise, exactly the map-side-combine
    algebra Spark itself uses inside a shuffle. Non-decomposable stats
    (exact distinct, exact percentiles) need the raw data or a
    mergeable sketch (see count_min_sketch / hll_distinct_estimate for
    the sketch route).

    Correctness hardening:
    - emptiness is probed via ``table.current_version`` — a blanket
      except around read() would turn any transient storage error into
      "first batch" and silently replace accumulated history with
      batch-only partials (the same pitfall streaming_cms_sketch
      documents); real read errors now raise and fail the batch.
    - rows with a NULL ``key_col`` are EXCLUDED (a NULL partition value
      round-trips as __HIVE_DEFAULT_PARTITION__ on disk but 'None' in
      the manifest — a corrupting mismatch; route NULLs explicitly
      upstream, as the streaming quality gate does).
    - pass ``batch_id`` for at-least-once sources: a replayed batch
      (stored _last_batch_id >= batch_id) is skipped instead of
      double-counted.

    The merge touches only the (key, day) rows present in THE BATCH;
    when the table is partitioned on the key, the stored side is
    filtered to the batch's keys FIRST so the read prunes partitions.
    The bounded partial is persisted across its several consumers
    (existence checks, the combine, merge's internal actions).
    Returns the new table version (or the current one for a skipped
    replay)."""
    partial = (
        batch.filter(F.col(key_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("k"),
            F.date_format(F.date_trunc("DAY", F.col(ts_col)), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .withColumn("rollup_key", F.concat_ws("|", F.col("k"), F.col("day")))
        .withColumn("_last_batch_id", F.lit(-1 if batch_id is None else batch_id).cast("long"))
    ).persist()
    try:
        cols = ["rollup_key", "k", "day", "n", "sum_value", "min_value",
                "max_value", "_last_batch_id"]
        if table.current_version is None:
            return table.merge(partial.select(*cols))
        stored = table.read()
        if batch_id is not None:
            last = stored.agg(F.max("_last_batch_id")).collect()[0][0]
            if last is not None and last >= batch_id:
                return table.current_version  # replayed batch: already folded
        if table.partition_col:
            ks = [r["k"] for r in partial.select("k").distinct().collect()]
            stored = stored.filter(F.col("k").isin(ks))
        else:
            stored = stored.join(partial.select("rollup_key"), "rollup_key", "left_semi")
        combined = (
            partial.unionByName(stored.select(*cols))
            .groupBy("rollup_key", "k", "day")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
                F.max("_last_batch_id").alias("_last_batch_id"),
            )
        )
        return table.merge(combined.select(*cols))
    finally:
        partial.unpersist(blocking=False)


def maintain_join_view(
    table: UpsertTable,
    fact_batch: DataFrame,
    dim: DataFrame,
    join_key: str,
    batch_id: int | None = None,
) -> int:
    """Incremental materialized JOIN-view maintenance for fact inserts:
    the delta rule for a view V = F |><| D under an insert batch dF is
    dV = dF |><| D — only the BATCH joins the dimension; stored view rows
    are never rescanned or recomputed. The merge upserts by the fact
    primary key, so an at-least-once source replaying a batch lands on
    the same rows instead of duplicating them (pass ``batch_id`` for the
    cheap skip, same contract as maintain_daily_rollup).

    Scope: fact-side inserts/updates only. A DIMENSION update dD touches
    every stored view row joined to the changed dim keys — the delta is
    (F |><| dD) over the AFFECTED keys, which needs either a fact re-read
    pruned to those keys or a dim-key-partitioned view; that rule is
    documented here and intentionally not folded into this helper.

    At scale the dim side is the broadcast side (AQE chooses; dimensions
    are small by definition) and the merge touches only the partitions
    the batch lands in — the same partition-scoped copy-on-write as every
    other UpsertTable writer.
    """
    meta = table._load_meta() or {}
    if batch_id is not None and meta.get("last_join_batch", -1) >= batch_id:
        return table.current_version
    delta = fact_batch.join(dim, join_key)
    version = table.merge(delta)
    if batch_id is not None:
        meta = table._load_meta() or {}
        meta["last_join_batch"] = batch_id
        table._commit_meta(meta)
    return version
