"""Commit-time delta-key bloom sidecars (≈ Kudu bloomfiles,
cfile/bloomfile.cc + tablet/deltafile.cc).

Kudu builds per-rowset bloom state ONCE at delta flush; resident
tservers then answer "could this key be mutated?" per scan without
re-reading delta data. A stateless Spark library was instead paying a
per-query O(delta) cost: the merge-on-read plan rebuilt broadcast
hash relations over the full delta key set on EVERY scan, and key
sets past the broadcast budget fell back to shuffling the whole base
through a sort-merge anti join (6.5-9x parquet at 24M keys,
SCALE.md x400).

The sidecar moves that work to write time, the one place it
amortizes: after a delta commit's parquet files land, one distributed
aggregation builds a bloom filter over xxhash64(pk-tuple) of the
commit's FULL key set and persists it next to the data files. Scans
then split the base with a native, codegen'd membership probe:

    clean     = base WHERE NOT might_contain(xxhash64(pk))   -- no join
    contested = base WHERE might_contain(...) ANTI JOIN delta keys
    result    = clean UNION contested UNION dedup(deltas)

Rows failing the probe are PROVABLY untouched (blooms have no false
negatives); false positives (~1%) ride through the exact anti join,
whose both sides are now O(delta), never O(base). The base is never
shuffled and no driver-side state is rebuilt per query — the sidecar
loads as bytes (~1.2 MB per million keys) and is cached per process.

Spark-first mechanics: the filter is Spark's own internal
``BloomFilterMightContain`` expression over a binary literal — the
exact machinery of Catalyst's runtime bloom-filter join rewrite
(spark.sql.optimizer.runtime.bloomFilter.*), driven explicitly
because our "join" spans separately-planned queries. Construction
goes through the classic-mode Column<->Expression bridge; every entry
point degrades to None (callers fall back to broadcast/shuffle plans)
if the internals are unavailable in a future Spark.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# serialized-bloom bytes per sidecar path, shared across sessions (the
# bytes are immutable once written; entries are evicted by size)
_BYTES_CACHE: dict[str, bytes] = {}
_BYTES_CACHE_MAX_TOTAL = 512 << 20

# constructed probe Columns per (sidecar path, app id, key expr): the
# binary literal's py4j transfer is O(sidecar bytes) per construction
# (~0.4 s at 24M keys), so repeated scans reuse the immutable
# expression tree; keyed by applicationId so a restarted session never
# sees stale JVM references
_PROBE_CACHE: dict[tuple, "Column"] = {}
_PROBE_CACHE_MAX = 64

DEFAULT_FPP = 0.01


def _jvm_bits(spark):
    """(jvm, ExpressionUtils) or None when the classic bridge is
    missing (e.g. Spark Connect, or internals moved)."""
    try:
        jvm = spark._jvm
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        # touch a method so a missing class fails HERE, not mid-plan
        eu.expression(F.lit(1)._jc)
        return jvm, eu
    except Exception:
        return None


def build_bloom(df_keys: DataFrame, expected_items: int,
                fpp: float = DEFAULT_FPP) -> bytes | None:
    """Serialize a bloom over ``df_keys``'s single BIGINT column ``h``
    (callers hash the PK tuple with xxhash64 — type-stable, and a
    64-bit hash collision only costs a false positive, resolved by
    the exact anti join downstream). The aggregation is distributed
    (per-partition blooms OR-merged); only the finished bitset reaches
    the driver."""
    spark = df_keys.sparkSession
    bits = _jvm_bits(spark)
    if bits is None:
        return None
    jvm, _ = bits
    try:
        jbf = df_keys._jdf.stat().bloomFilter("h", max(int(expected_items), 64), fpp)
        bos = jvm.java.io.ByteArrayOutputStream()
        jbf.writeTo(bos)
        return bytes(bos.toByteArray())
    except Exception:
        return None


def write_sidecar(table_root: str, data_dir: str, seq: int, data: bytes) -> str:
    """Atomically persist sidecar bytes; returns the table-relative
    path. Never referenced until the commit that carries it publishes,
    so a lost commit race leaves only an unreferenced file for
    vacuum."""
    from kudu_spark.fs import env_for_root

    name = f"{seq:012d}-{uuid.uuid4().hex}.bloom"
    rel = os.path.join(data_dir, name)
    env_for_root(table_root).write_bytes(os.path.join(table_root, rel), data)
    return rel


def load_sidecar(table_root: str, rel_path: str) -> bytes | None:
    """Sidecar bytes, cached per process (immutable once written)."""
    from kudu_spark.fs import env_for_root

    path = os.path.join(table_root, rel_path)
    hit = _BYTES_CACHE.get(path)
    if hit is not None:
        return hit
    try:
        data = env_for_root(table_root).read_bytes(path)
    except OSError:
        return None  # e.g. a restore that didn't carry sidecars: caller falls back
    while (
        _BYTES_CACHE
        and sum(len(v) for v in _BYTES_CACHE.values()) + len(data)
        > _BYTES_CACHE_MAX_TOTAL
    ):
        _BYTES_CACHE.pop(next(iter(_BYTES_CACHE)))
    _BYTES_CACHE[path] = data
    return data


def might_contain_sidecar(spark, table_root: str, rel_path: str,
                          value: Column, value_key: tuple) -> Column | None:
    """Cached probe over a sidecar file: loads the bytes (byte-cached)
    and reuses the constructed expression across queries of this
    session. ``value_key`` identifies the value expression (e.g. the
    PK column tuple) since the Column tree binds it."""
    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = None
    key = (os.path.join(table_root, rel_path), app, value_key)
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    data = load_sidecar(table_root, rel_path)
    if data is None:
        return None
    col = might_contain(spark, data, value)
    if col is not None and app is not None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
        _PROBE_CACHE[key] = col
    return col


def might_contain(spark, data: bytes, value: Column) -> Column | None:
    """``BloomFilterMightContain(<binary literal>, value)`` as a
    Column — the native probe Catalyst's runtime-filter rewrite
    injects, here built explicitly. Evaluates in whole-stage codegen;
    the literal rides the (stage-broadcast) task binary, so executors
    deserialize the bloom once per task-set, not per row."""
    bits = _jvm_bits(spark)
    if bits is None:
        return None
    jvm, eu = bits
    try:
        blit = F.lit(bytearray(data))
        e = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            eu.expression(blit._jc), eu.expression(value._jc)
        )
        return Column(eu.column(e))
    except Exception:
        return None
