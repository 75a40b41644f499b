"""Writer sessions and transactions.

≈ KuduSession flush modes (client.h:2316-2321, python mirror
python/kudu/client.pyx:1658-1810) and KuduTransaction
(client.h:445-545). A session buffers row ops driver-side and flushes
them as one commit per batch; a transaction accumulates ops across
flushes and publishes ONE atomic commit at commit() time — Kudu's
distributed-txn machinery collapses into all-or-nothing file publish.

Rows applied through a session carry an apply-order index so that
last-write-wins within a batch matches Kudu's apply order exactly
(fuzz-itest.cc:122-141 relies on this).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import functions as F

from kudu_spark.errors import KuduSparkError
from kudu_spark.table import Table


class FlushMode(Enum):
    AUTO_FLUSH_SYNC = "sync"  # every apply() flushes immediately
    AUTO_FLUSH_BACKGROUND = "background"  # flush when buffer reaches limit
    MANUAL_FLUSH = "manual"  # only on flush()


_OPS = ("insert", "insert_ignore", "upsert", "upsert_ignore",
        "update", "update_ignore", "delete", "delete_ignore")


class Session:
    """Buffered row-op session on one table.

    apply(op, row_dict) buffers; flush() groups consecutive ops of the
    same kind into batches and executes them in order. Each flush is
    one or more commits (one per op-kind run), preserving apply order.
    """

    def __init__(self, table: Table, flush_mode: FlushMode = FlushMode.MANUAL_FLUSH,
                 buffer_rows: int = 10000):
        self.table = table
        self.flush_mode = flush_mode
        self.buffer_rows = buffer_rows
        self._buf: list[tuple[str, dict]] = []

    def apply(self, op: str, row: dict) -> None:
        if op not in _OPS:
            raise KuduSparkError(f"unknown op {op}")
        self._buf.append((op, dict(row)))
        if self.flush_mode == FlushMode.AUTO_FLUSH_SYNC:
            self.flush()
        elif (
            self.flush_mode == FlushMode.AUTO_FLUSH_BACKGROUND
            and len(self._buf) >= self.buffer_rows
        ):
            self.flush()

    def insert(self, row: dict) -> None:
        self.apply("insert", row)

    def upsert(self, row: dict) -> None:
        self.apply("upsert", row)

    def update(self, row: dict) -> None:
        self.apply("update", row)

    def delete(self, row: dict) -> None:
        self.apply("delete", row)

    def flush(self) -> list[int]:
        """Execute buffered ops in apply order; returns commit versions."""
        if not self._buf:
            return []
        buf, self._buf = self._buf, []
        spark = self.table.spark
        st = self.table.state()
        versions = []
        # group consecutive same-op runs to preserve inter-op ordering
        runs: list[tuple[str, list[dict]]] = []
        for op, row in buf:
            if runs and runs[-1][0] == op:
                runs[-1][1].append(row)
            else:
                runs.append((op, [row]))
        for op, rows in runs:
            method = getattr(self.table, op)
            cols = self._cols_for(st, op, rows)
            data = [tuple(r.get(c) for c in cols) + (i,) for i, r in enumerate(rows)]
            ddl = ", ".join(f"`{c}` {st.schema.col(c).type}" for c in cols)
            df = spark.createDataFrame(data, ddl + ", __row_idx bigint")
            if op not in ("upsert", "upsert_ignore"):
                df = df.drop("__row_idx")
                if op.startswith("insert"):
                    df = df.dropDuplicates(st.schema.pk) if op == "insert_ignore" else df
                if op.startswith(("update", "delete")):
                    # last mention wins inside one run
                    df = df.dropDuplicates(
                        [c for c in cols if c in st.schema.pk]
                    )
            versions.append(method(df))
        return versions

    def _cols_for(self, st, op: str, rows: list[dict]) -> list[str]:
        present = set()
        for r in rows:
            present.update(r.keys())
        unknown = present - set(st.schema.names)
        if unknown:
            raise KuduSparkError(f"unknown columns {sorted(unknown)}")
        if op.startswith("delete"):
            return [c for c in st.schema.names if c in present and c in st.schema.pk] or st.schema.pk
        return [c for c in st.schema.names if c in present]

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is None:
            self.flush()


class Transaction:
    """Accumulates DataFrame-level ops; commit() publishes them as ONE
    atomic log entry (all-or-nothing visibility). Rollback discards
    staged files. Mirrors KuduTransaction::Commit/Rollback."""

    def __init__(self, table: Table):
        self.table = table
        self._staged: list[tuple] = []  # (op, entries)
        self._insert_entries: list = []  # base files staged by insert()
        self._stage_version: int | None = None  # state version validations saw
        self._open = True

    def _stage(self, op: str, df, kind: str, prepare) -> None:
        if not self._open:
            raise KuduSparkError("transaction is closed")
        st = self.table.state()
        self._stage_version = st.version
        batch = prepare(st, df)
        from kudu_spark.table import seq_for

        entries = self.table._write_files(
            batch, st, seq_for(st.version + 1, sub=len(self._staged)), kind
        )
        self._staged.append((op, entries))

    def _staged_insert_keys(self, st):
        import os

        paths = [os.path.join(self.table.root, e.path) for e in self._insert_entries]
        return self.table.spark.read.parquet(*paths).select(*st.schema.pk)

    def insert(self, df) -> None:
        """Txn INSERT. Like Table.insert, errors on a PK that already
        exists — in the snapshot OR staged by an earlier insert in this
        transaction (row_operations.proto:36 semantics; Kudu txn writes
        revalidate per row at apply, tablet/tablet.cc:836). This is
        also the invariant the merge-on-read broadcast fast path relies
        on: keys untouched by deltas are unique across base files."""
        holder = {}

        def prep(st, d):
            from kudu_spark.errors import DuplicateKeyError, SchemaError

            b = holder["b"] = self.table._validate_batch(st, d).persist()
            pk = st.schema.pk
            null_pk = None
            for c in pk:
                cond = F.col(c).isNull()
                null_pk = cond if null_pk is None else (null_pk | cond)
            agg = b.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(*[F.col(c) for c in pk]).alias("nd"),
                F.sum(F.when(null_pk, 1).otherwise(0)).alias("nulls"),
            ).collect()[0]
            if agg.nulls:
                raise SchemaError(f"batch holds {agg.nulls} row(s) with NULL primary key")
            if agg.n != agg.nd:
                raise DuplicateKeyError(
                    f"batch contains {agg.n - agg.nd} duplicate primary key(s)"
                )
            if st.files:
                hit = (
                    b.join(self.table._existing_pks(st, b), on=pk, how="left_semi")
                    .limit(1).collect()
                )
                if hit:
                    raise DuplicateKeyError(f"key already present: {hit[0].asDict()}")
            if self._insert_entries:
                hit = (
                    b.join(self._staged_insert_keys(st), on=pk, how="left_semi")
                    .limit(1).collect()
                )
                if hit:
                    raise DuplicateKeyError(
                        f"key already inserted in this transaction: {hit[0].asDict()}"
                    )
            return b

        try:
            self._stage("insert", df, "base", prep)
        finally:
            if "b" in holder:
                try:
                    holder["b"].unpersist()
                except Exception:
                    pass
        self._insert_entries.extend(self._staged[-1][1])

    def upsert(self, df) -> None:
        def prep(st, d):
            b = self.table._validate_batch(st, d)
            return b.dropDuplicates(st.schema.pk)

        self._stage("upsert", df, "delta", prep)

    def delete(self, df) -> None:
        def prep(st, d):
            pk = st.schema.pk
            keys = d.select(
                *[F.col(c).cast(st.schema.col(c).type).alias(c) for c in pk]
            ).dropDuplicates(pk)
            return keys.select(
                *pk,
                *[
                    F.lit(None).cast(st.schema.col(c).type).alias(c)
                    for c in st.schema.non_pk_names
                ],
            ).withColumn("__deleted", F.lit(True))

        self._stage("delete", df, "delta", prep)

    def commit(self) -> int:
        if not self._open:
            raise KuduSparkError("transaction is closed")
        self._open = False
        entries = [e for _, es in self._staged for e in es]
        from kudu_spark.errors import ConcurrentCommitError, DuplicateKeyError

        attempts = 5
        while True:
            st = self.table.state()
            # inserts were probed against the snapshot at stage time; if
            # other writers committed since, re-probe before publishing
            # (Kudu txns likewise fail at commit on conflicting rows)
            if self._insert_entries and st.version != self._stage_version:
                pk = st.schema.pk
                keys = self._staged_insert_keys(st)
                hit = (
                    keys.join(self.table._existing_pks(st, keys), on=pk, how="left_semi")
                    .limit(1).collect()
                )
                if hit:
                    self.rollback()  # reclaim the staged files
                    raise DuplicateKeyError(
                        f"key inserted concurrently during transaction: {hit[0].asDict()}"
                    )
                self._stage_version = st.version
            try:
                return self.table._commit(st, "txn", entries, retries=1)
            except ConcurrentCommitError:
                attempts -= 1
                if attempts <= 0:
                    raise

    def rollback(self) -> None:
        import os

        self._open = False
        for _, entries in self._staged:
            for e in entries:
                try:
                    os.unlink(os.path.join(self.table.root, e.path))
                except FileNotFoundError:
                    pass
        self._staged = []
