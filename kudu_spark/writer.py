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
        v = self._publish()
        # inline maintenance, like the direct mutation paths (not run
        # from EngineTransaction._publish calls: a coordinator must not
        # stretch the window between participant commits)
        self.table._maybe_auto_compact()
        return v

    def _publish(self, txn_id: str | None = None) -> int:
        """Revalidate and append this table's txn commit (the
        single-table commit body; EngineTransaction drives one call
        per participant, tagging each with the coordinator's id)."""
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
                return self.table._commit(
                    st, "txn", entries, retries=1,
                    extra={"txn_id": txn_id} if txn_id else None,
                )
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


class EngineTransaction:
    """Cross-table transaction over one Engine's warehouse
    (≈ KuduTransaction, client.h:445-545, which spans sessions and
    tablets; Kudu coordinates through the TxnStatusManager —
    transactions/txn_status_manager.h — and we coordinate through a
    durable marker file under ``{warehouse}/_txns/``).

    Usage::

        txn = EngineTransaction(engine)
        txn.insert("orders", df1)
        txn.delete("inventory", df2)
        txn.commit()

    Commit protocol (each step durable before the next):
      1. every participant table's files are fully staged (invisible);
      2. the marker is written with state="committing" and each
         participant's planned add-set;
      3. one 'txn' commit is appended per table, tagged with the
         marker id;
      4. the marker is removed.
    A crash between 3 and 4 leaves a "committing" marker:
    ``recover(engine)`` appends the missing table commits (the staged
    files are durable), making the transaction all-or-nothing at the
    durability level. If a table's commit is REJECTED at publish time
    (duplicate key raced in), already-published participants are
    compensated with a 'txn_abort' commit that removes their added
    files. Cross-table atomicity of VISIBILITY is per-table manifest
    order — a reader can observe table A's commit before table B's for
    a few milliseconds (Kudu's commit-timestamp MVCC has no file-native
    equivalent); durability, however, is all-or-nothing."""

    def __init__(self, engine):
        self.engine = engine
        self._parts: dict[str, Transaction] = {}
        self._open = True

    def _txn(self, table_name: str) -> Transaction:
        if not self._open:
            raise KuduSparkError("transaction is closed")
        if table_name not in self._parts:
            self._parts[table_name] = Transaction(self.engine.table(table_name))
        return self._parts[table_name]

    def insert(self, table_name: str, df) -> None:
        self._txn(table_name).insert(df)

    def upsert(self, table_name: str, df) -> None:
        self._txn(table_name).upsert(df)

    def delete(self, table_name: str, df) -> None:
        self._txn(table_name).delete(df)

    def _marker_dir(self) -> str:
        import os

        return os.path.join(self.engine.root, "_txns")

    def commit(self) -> dict[str, int]:
        """Publish every participant; returns {table: commit_version}."""
        import json
        import os
        import uuid

        if not self._open:
            raise KuduSparkError("transaction is closed")
        self._open = False
        parts = {n: t for n, t in self._parts.items() if t._staged}
        if not parts:
            return {}
        txn_id = uuid.uuid4().hex
        os.makedirs(self._marker_dir(), exist_ok=True)
        marker = os.path.join(self._marker_dir(), f"{txn_id}.json")
        payload = {
            "txn_id": txn_id,
            "state": "committing",
            "participants": {
                n: {
                    "root": t.table.root,
                    "entries": [e.to_json() for _, es in t._staged for e in es],
                }
                for n, t in parts.items()
            },
        }
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, marker)

        published: dict[str, int] = {}
        try:
            for name, t in parts.items():
                published[name] = t._publish(txn_id)
        except Exception:
            # compensate the already-published prefix, roll back the rest
            for name, v in published.items():
                t = parts[name]
                tbl = t.table
                paths = [e.path for _, es in t._staged for e in es]
                tbl._commit(tbl.state(), "txn_abort", [], removes=paths,
                            extra={"txn_id": txn_id})
            for name, t in parts.items():
                if name not in published and t._staged:
                    t.rollback()
            os.unlink(marker)
            raise
        os.unlink(marker)
        return published

    def rollback(self) -> None:
        self._open = False
        for t in self._parts.values():
            t.rollback()

    @staticmethod
    def recover(engine) -> list[str]:
        """Complete transactions a crash left in 'committing': append
        the missing per-table commits (their files are durable), or
        compensate if the staged files were lost. Returns recovered
        txn ids."""
        import json
        import os

        from kudu_spark.meta import FileEntry, read_log

        d = os.path.join(engine.root, "_txns")
        if not os.path.isdir(d):
            return []
        done = []
        for name in sorted(os.listdir(d)):
            if not name.endswith(".json") or name.endswith(".tmp"):
                continue
            path = os.path.join(d, name)
            with open(path) as f:
                m = json.load(f)
            complete = True
            for tname, part in m.get("participants", {}).items():
                root = part["root"]
                already = any(
                    c.get("txn_id") == m["txn_id"] for c in read_log(root)
                )
                if already:
                    continue
                entries = [FileEntry.from_json(e) for e in part["entries"]]
                if all(os.path.exists(os.path.join(root, e.path)) for e in entries):
                    t = engine.table(tname)
                    t._commit(t.state(), "txn", entries,
                              extra={"txn_id": m["txn_id"]})
                else:
                    complete = False  # files lost: leave marker for inspection
            if complete:
                os.unlink(path)
                done.append(m["txn_id"])
        return done
