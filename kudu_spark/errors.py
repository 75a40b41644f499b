"""Engine error types mirroring Kudu's client error surface.

Reference: src/kudu/common/row_operations.proto:34-63 (op outcome
matrix), docs/known_issues.adoc:39-62 (PK/type constraints).
"""


class KuduSparkError(Exception):
    """Base class for engine errors."""


class TableNotFoundError(KuduSparkError):
    pass


class TableExistsError(KuduSparkError):
    pass


class DuplicateKeyError(KuduSparkError):
    """INSERT of a primary key that already exists (Kudu: Status::AlreadyPresent)."""


class RowNotFoundError(KuduSparkError):
    """UPDATE/DELETE of a primary key that does not exist (Kudu: Status::NotFound)."""


class ImmutableColumnError(KuduSparkError):
    """UPDATE/UPSERT touching a column marked immutable (common.proto:170)."""


class SchemaError(KuduSparkError):
    """Invalid schema operation (PK not first / nullable PK / type change)."""


class ConcurrentCommitError(KuduSparkError):
    """Optimistic-concurrency conflict appending to the commit log."""


class FlushFailedError(KuduSparkError):
    """Session flush had per-row failures; the failed ops are in the
    session's error collector (Kudu: Status::IOError 'failed to flush
    data: error details are available via GetPendingErrors',
    client/session-internal.cc). Rows that did NOT fail were applied."""
