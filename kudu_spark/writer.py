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
        self._open = True

    def _stage(self, op: str, df, kind: str, prepare) -> None:
        if not self._open:
            raise KuduSparkError("transaction is closed")
        st = self.table.state()
        batch = prepare(st, df)
        from kudu_spark.table import seq_for

        entries = self.table._write_files(
            batch, st, seq_for(st.version + 1, sub=len(self._staged)), kind
        )
        self._staged.append((op, entries))

    def insert(self, df) -> None:
        def prep(st, d):
            b = self.table._validate_batch(st, d)
            return b

        self._stage("insert", df, "base", prep)

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
        st = self.table.state()
        entries = [e for _, es in self._staged for e in es]
        return self.table._commit(st, "txn", entries)

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
