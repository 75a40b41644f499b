"""Engine-table queries: mutation semantics exercised through the
correctness gate (insert/upsert/update/delete + time travel + diff scan
round-trips on engine tables, with SQL-emulated oracles).

Filled in as the storage kernel lands; each registers into
kudu_spark.queries.REGISTRY.
"""

from __future__ import annotations
