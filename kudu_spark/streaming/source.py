"""Change-feed Structured Streaming source over engine tables.

Kudu feeds continuous consumers through repeated diff scans — the
backup job's incremental mode (java/kudu-backup/KuduBackupRDD.scala:74-78)
and the Flink replication source (java/kudu-replication/ReplicationJob.java)
both poll ``diffScan(fromTs, toTs)`` and emit rows tagged with
IS_DELETED (common.proto:60). This module is the Spark-native
equivalent: a **Python Data Source** (PySpark 4 `pyspark.sql.datasource`)
whose offsets are commit-log versions, registered as
``spark.readStream.format("kudu_cdc")``.

Design (scale notes):
  - Every mutation commit's data files already carry the row-level
    change (post-image + ``__deleted`` tombstone flag), so the source
    never recomputes a diff: a micro-batch over versions (v1, v2] is
    just "read the parquet files added by mutation commits in that
    window". One InputPartition per file → executor-parallel, no
    driver bottleneck, no shuffle.
  - read() yields **Arrow RecordBatches** (zero row-at-a-time Python),
    conformed to the table schema at HEAD so schema evolution across
    the window is handled (missing columns → nulls/defaults).
  - Offsets are monotone integers; checkpoint/restart and
    Trigger.AvailableNow work out of the box.
  - Compaction/vacuum/alter commits are invisible (no logical change),
    matching diff-scan semantics. Unlike a state diff, the feed is a
    full changelog: a row upserted 3 times appears 3 times, each
    tagged with its ``_change_version`` — the replication consumer
    applies them in version order (apply_changes).

Batch mode works too: ``spark.read.format("kudu_cdc")`` with
``startingVersion``/``endingVersion`` options reads one window —
the DataFrame analogue of KuduBackupRDD's incremental scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

MUTATION_OPS = {"insert", "upsert", "update", "delete", "txn"}
VERSION_COL = "_change_version"
DELETED_COL = "_is_deleted"


class ChangeFile(InputPartition):
    """One parquet delta/base file added by a mutation commit."""

    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


def _table_state(root: str):
    from kudu_spark.meta import replay

    st = replay(os.path.basename(root.rstrip("/")), root, None)
    if st is None:
        raise ValueError(f"no kudu_spark table at {root}")
    return st


def _change_files(root: str, start_v: int, end_v: int) -> list[ChangeFile]:
    """Files added by mutation commits in (start_v, end_v] — plus the
    repair files of txn_abort commits: when a cross-table transaction
    is compensated after a participant conflict, consumers who already
    received its rows get retraction events (restored pre-txn images or
    tombstones, written by writer._write_cdc_repair) instead of keeping
    phantom inserts forever."""
    from kudu_spark.meta import read_log

    out: list[ChangeFile] = []
    # min_version: each micro-batch reads O(window) commit files, not
    # O(history) — a long-lived stream over a high-commit table stays flat
    for c in read_log(root, end_v, min_version=start_v):
        if c.get("op") == "txn_abort":
            for rel in c.get("cdc_repair", []):
                out.append(ChangeFile(os.path.join(root, rel), c["version"]))
            continue
        if c.get("op") not in MUTATION_OPS:
            continue
        for a in c.get("actions", []):
            if a["type"] == "add":
                out.append(ChangeFile(os.path.join(root, a["file"]["path"]), c["version"]))
    return out


def _read_change_file(part: ChangeFile, arrow_schema):
    """Executor-side: parquet file → conformed Arrow batches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kudu_spark.fs import env_for_root

    # the Env resolves executor-side from the path alone (fs.py):
    # plain open locally, the object store's reader elsewhere
    tbl = pq.read_table(env_for_root(part.path).open_read(part.path))
    n = tbl.num_rows
    cols = []
    for field in arrow_schema:
        if field.name == VERSION_COL:
            arr = pa.array(np.full(n, part.version, dtype=np.int64)).cast(field.type)
        elif field.name == DELETED_COL:
            if "__deleted" in tbl.column_names:
                arr = tbl.column("__deleted").cast(field.type)
            else:
                arr = pa.array(np.zeros(n, dtype=bool)).cast(field.type)
        elif field.name in tbl.column_names:
            arr = tbl.column(field.name).cast(field.type)
        else:  # column added after this file was written (schema evolution)
            arr = pa.nulls(n, type=field.type)
        cols.append(arr)
    yield from pa.table(cols, schema=arrow_schema).to_batches()


def _arrow_schema_for(spark_schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


class ChangeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, spark_schema, options: dict):
        self.root = options["path"]
        self.start_version = int(options.get("startingversion", 0))
        # rate limiting (≈ scanner batch sizing / maxFilesPerTrigger):
        # each micro-batch advances at most this many commit versions,
        # so a backlog drains in bounded batches instead of one giant one
        self.max_versions = int(options.get("maxversionsperbatch", 0)) or None
        # bytes-based sizing (Kudu scanner batch_size_bytes; KuduRDD's
        # batchSize): a batch stops growing once the mutation files it
        # would read exceed this many bytes — but always advances at
        # least one mutation commit so a single oversized commit still
        # drains. Composes with max_versions (tighter cap wins).
        self.max_bytes = int(options.get("maxbytesperbatch", 0)) or None
        # Floor = highest offset this reader knows was planned; the cap
        # is floor + max_versions. Probed lifecycle (one long-lived
        # runner instance per query, pyspark 4.1):
        #   fresh start:  latestOffset -> initialOffset -> partitions
        #   restart:      partitions(last WAL batch) -> latestOffset
        # So when latestOffset() finds the floor unseeded (None), the
        # query is on a FRESH start (a restart would have seeded it via
        # the preceding partitions() replay) and seeding from
        # startingVersion is correct — same self-seeding pattern as
        # pyspark's _SimpleStreamReaderWrapper.latestOffset. This keeps
        # the cap on cold starts AND restarts with no replay: after the
        # WAL replay seeds floor = checkpoint, latestOffset is always
        # >= checkpoint and monotone.
        self._floor: int | None = None
        # driver-side: needs the JVM; executors get the pickled result
        self.arrow_schema = _arrow_schema_for(spark_schema)

    def initialOffset(self) -> dict:
        # never regress a floor already advanced by latestOffset/partitions
        if self._floor is None or self._floor < self.start_version:
            self._floor = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        head = _table_state(self.root).version
        if self.max_versions or self.max_bytes:
            if self._floor is None:
                # fresh start: Spark calls latestOffset() before
                # initialOffset() (see __init__) — seed the floor now
                self.initialOffset()
            cap = head
            if self.max_versions:
                cap = min(cap, self._floor + self.max_versions)
            if self.max_bytes and cap > self._floor:
                from kudu_spark.meta import read_log

                spent, v = 0, self._floor
                for c in read_log(self.root, cap, min_version=self._floor):
                    vbytes = (
                        sum(a["file"].get("bytes", 0)
                            for a in c.get("actions", []) if a["type"] == "add")
                        if c.get("op") in MUTATION_OPS else 0
                    )
                    if spent and spent + vbytes > self.max_bytes:
                        break
                    spent += vbytes
                    v = c["version"]
                cap = v
            # cap the batch; never move backward past what was planned
            head = max(min(head, cap), self._floor)
        return {"version": head}

    def partitions(self, start: dict, end: dict):
        # seed/advance the floor from the planned range (on restart the
        # first batch was uncapped — see __init__; capping resumes here)
        self._floor = max(self._floor or 0, start["version"], end["version"])
        parts = _change_files(self.root, start["version"], end["version"])
        # Spark requires a non-empty partition list per planned batch
        return parts or [ChangeFile("", end["version"])]

    def read(self, partition: ChangeFile):
        if not partition.path:
            return iter(())
        return _read_change_file(partition, self.arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # the commit log is the source of truth; nothing to ack

    def stop(self) -> None:
        pass


class ChangeFeedBatchReader(DataSourceReader):
    def __init__(self, spark_schema, options: dict):
        self.root = options["path"]
        self.start_version = int(options.get("startingversion", 0))
        end = options.get("endingversion")
        self.end_version = int(end) if end is not None else _table_state(self.root).version
        self.arrow_schema = _arrow_schema_for(spark_schema)

    def partitions(self):
        return _change_files(self.root, self.start_version, self.end_version) or [
            ChangeFile("", self.end_version)
        ]

    def read(self, partition: ChangeFile):
        if not partition.path:
            return iter(())
        return _read_change_file(partition, self.arrow_schema)


class ChangeFeedDataSource(DataSource):
    """``format("kudu_cdc")``: change feed over an engine table.

    Options: ``path`` (table root, required), ``startingVersion``
    (exclusive lower bound, default 0 = since creation),
    ``endingVersion`` (batch mode only, default HEAD),
    ``maxVersionsPerBatch`` (streaming rate limit: commits per
    micro-batch, default unlimited), ``maxBytesPerBatch`` (streaming
    rate limit by mutation-file bytes — Kudu scanner batch_size_bytes;
    always advances at least one commit). Both caps hold on fresh
    starts AND across checkpointed restarts with no replay.
    """

    @classmethod
    def name(cls) -> str:
        return "kudu_cdc"

    def schema(self) -> str:
        # non-PK columns are nullable in the FEED even when NOT NULL in
        # the table: delete/retraction events carry null post-images
        # (IS_DELETED rows project only key columns, common.proto:60)
        st = _table_state(self.options["path"])
        pk = set(st.schema.pk)
        cols = ", ".join(
            f"`{c.name}` {c.type}" + (" NOT NULL" if c.name in pk else "")
            for c in st.schema.columns
        )
        return cols + f", {VERSION_COL} bigint, {DELETED_COL} boolean"

    def reader(self, schema) -> DataSourceReader:
        return ChangeFeedBatchReader(schema, self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ChangeFeedStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the kudu_cdc format on a session."""
    spark.dataSource.register(ChangeFeedDataSource)


def read_changes(spark, table_root: str, from_version: int = 0,
                 to_version: int | None = None):
    """Batch changelog between two versions as a DataFrame."""
    register(spark)
    r = (
        spark.read.format("kudu_cdc")
        .option("path", table_root)
        .option("startingVersion", from_version)
    )
    if to_version is not None:
        r = r.option("endingVersion", to_version)
    return r.load()


def stream_changes(spark, table_root: str, from_version: int = 0,
                   max_versions_per_batch: int | None = None,
                   max_bytes_per_batch: int | None = None):
    """Streaming changelog (readStream) from a version onward.
    ``max_versions_per_batch`` bounds each micro-batch's commit window;
    ``max_bytes_per_batch`` bounds it by mutation-file bytes (at least
    one commit per batch) — so a backlog drains in bounded steps
    whichever way it is lumpy. Caps hold across restarts."""
    register(spark)
    r = (
        spark.readStream.format("kudu_cdc")
        .option("path", table_root)
        .option("startingVersion", from_version)
    )
    if max_versions_per_batch:
        r = r.option("maxVersionsPerBatch", max_versions_per_batch)
    if max_bytes_per_batch:
        r = r.option("maxBytesPerBatch", max_bytes_per_batch)
    return r.load()
