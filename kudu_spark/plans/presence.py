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

The sidecar is a directory (``<seq>-<uuid>.pidx/``) holding up to TWO
shard families — live keys and delete-tombstone keys:

  meta.json           {"cols": [...], "types": [...], "seq": Q,
                       "nshards": S, "rows": N, "bytes": B,
                       "del_nshards": S', "del_rows": N',
                       "mixed": bool, "del_unindexed": bool}
                      — written LAST; its presence marks the sidecar
                      complete. ``seq`` is the covered commit's
                      manifest seq: probe answers resolve per key by
                      the HIGHEST-seq hit (live hit → present, delete
                      hit → absent), which is how the reference keeps
                      presence exact through un-compacted deletes —
                      delete deltas are consulted with timestamps
                      (tablet/tablet.cc:116-124, tablet/delta_tracker.cc)
  shard-<s>.i64       sorted, deduped int64 hashes of LIVE keys
  del-<s>.i64         sorted, deduped int64 hashes of DELETEd keys
                      (shards with no keys have no file)

``mixed`` marks a commit that wrote live AND delete rows at one seq:
within-commit ordering is unknown, so probes answer live-wins —
superset semantics, never a false negative. ``del_unindexed`` marks a
commit whose delete keys could NOT be indexed — the hashed tuple is
not the FULL pk: outside it (delete tombstones only carry the PK) or
a strict prefix of it (sibling rows share a prefix tuple, so one
row's delete must not subtract it): probes degrade to superset, and
exactness is declined honestly.

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
_VERSION = 2  # v2: seq-stamped metas + delete shard family

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


def _shard_path(dir_abs: str, shard: int, prefix: str = "shard") -> str:
    return os.path.join(dir_abs, f"{prefix}-{shard:05d}.i64")


def _write_shard(dir_abs: str, shard: int, arr: np.ndarray,
                 prefix: str = "shard") -> int:
    """Atomically persist one sorted shard; returns bytes written.
    IO goes through the sidecar root's Env (fs.py) — tmp+rename
    locally, a direct object write elsewhere."""
    from kudu_spark.fs import env_for_root

    data = np.ascontiguousarray(arr, dtype="<i8").tobytes()
    env_for_root(dir_abs).write_bytes(_shard_path(dir_abs, shard, prefix), data)
    return len(data)


def _write_family_arrays(dir_abs: str, hv: np.ndarray, ns: int,
                         prefix: str) -> int:
    """Driver-side shard write of one family from an in-memory hash
    array; returns bytes written."""
    if not len(hv):
        return 0
    shard = hv % ns if ns > 1 else np.zeros(len(hv), dtype="int64")
    total = 0
    for s in np.unique(shard):
        total += _write_shard(dir_abs, int(s), np.unique(hv[shard == s]), prefix)
    return total


def _write_family_distributed(hashes_df, ns: int, dir_abs: str,
                              prefix: str) -> int:
    """Executor-side shard build of one family: shard-shuffle the
    hashes, each group task sorts + writes its own shard file to the
    table root (the same shared-storage write contract as the parquet
    data files); returns bytes written."""
    import pandas as pd
    from pyspark.sql import functions as F

    def write_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = int(pdf["s"].iloc[0])
        n = _write_shard(dir_abs, s, np.unique(pdf["h"].to_numpy("int64")),
                         prefix)
        return pd.DataFrame({"s": [s], "b": [n]})

    got = (
        hashes_df.select("h", F.pmod(F.col("h"), F.lit(ns)).alias("s"))
        .groupBy("s")
        .applyInPandas(write_group, schema="s int, b long")
        .collect()
    )
    return int(sum(r["b"] for r in got))


def build_index(hashes_df, rows: int, dir_abs: str,
                cols: list[str], types: list[str],
                seq: int = 0) -> dict | None:
    """Build a live-only sidecar directory from a single-column
    (``h`` BIGINT) DataFrame of key hashes. Returns the meta dict, or
    None on failure (callers log and fall back — a table without
    sidecars just loses the O(batch) probe, never correctness)."""
    from kudu_spark.fs import env_for_root

    env = env_for_root(dir_abs)
    ns = shards_for(rows)
    env.makedirs(dir_abs)
    meta = {"version": _VERSION, "cols": list(cols), "types": list(types),
            "seq": int(seq), "nshards": ns, "rows": int(rows), "bytes": 0}
    # executor-side builds need a filesystem every executor can write
    # (the shared-storage contract); driver-local envs (memory://)
    # build driver-side regardless of size
    if rows <= SMALL_BUILD_MAX or not env.distributed:
        hv = hashes_df.toPandas()["h"].to_numpy(dtype="int64")
        meta["bytes"] = _write_family_arrays(dir_abs, hv, ns, "shard")
    else:
        meta["bytes"] = _write_family_distributed(hashes_df, ns, dir_abs, "shard")
    # meta lands last: a crash mid-build leaves no meta.json and the
    # sidecar reads as absent (probe declines, vacuum collects it)
    env.write_bytes(os.path.join(dir_abs, META_NAME), json.dumps(meta).encode())
    return meta


def build_commit_index(hd_df, total_rows: int, dir_abs: str,
                       cols: list[str], types: list[str], seq: int,
                       del_indexed: bool = True) -> dict | None:
    """Build one commit's sidecar from a two-column DataFrame
    (``h`` BIGINT key hash, ``d`` BOOLEAN is-delete-tombstone): live
    keys land in the ``shard-*`` family, delete keys in ``del-*``.
    A probe hitting the delete family at this commit's ``seq`` answers
    ABSENT unless a higher-seq live hit exists — the subtraction that
    keeps presence exact through un-compacted DELETEs (reference:
    delete deltas consulted with timestamps, tablet/tablet.cc:116-124).

    ``del_indexed=False`` (the hashed tuple reaches outside the PK, so
    delete tombstones can't be hashed): delete keys are NOT indexed;
    the meta records ``del_unindexed`` and probes degrade honestly to
    superset. A commit with both live and delete rows is marked
    ``mixed`` (within-commit ordering unknown → live-wins superset)."""
    from pyspark.sql import functions as F

    from kudu_spark.fs import env_for_root

    env = env_for_root(dir_abs)
    env.makedirs(dir_abs)
    meta = {"version": _VERSION, "cols": list(cols), "types": list(types),
            "seq": int(seq), "nshards": 1, "rows": 0, "bytes": 0}
    if total_rows <= SMALL_BUILD_MAX or not env.distributed:
        pdf = hd_df.toPandas()
        d = pdf["d"].to_numpy(dtype=bool)
        live = pdf["h"].to_numpy(dtype="int64")[~d]
        dele = pdf["h"].to_numpy(dtype="int64")[d]
        ns = shards_for(len(live))
        meta.update(nshards=ns, rows=int(len(live)))
        total = _write_family_arrays(dir_abs, live, ns, "shard")
        if len(dele):
            if del_indexed:
                ns_d = shards_for(len(dele))
                total += _write_family_arrays(dir_abs, dele, ns_d, "del")
                meta.update(del_nshards=ns_d, del_rows=int(len(dele)))
            else:
                meta.update(del_unindexed=True, del_rows=int(len(dele)))
            if len(live):
                meta["mixed"] = True
        meta["bytes"] = total
    else:
        counts = {bool(r["d"]): int(r["cnt"]) for r in
                  hd_df.groupBy("d").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        n_live, n_del = counts.get(False, 0), counts.get(True, 0)
        ns = shards_for(n_live)
        meta.update(nshards=ns, rows=n_live)
        total = _write_family_distributed(
            hd_df.where(~F.col("d")), ns, dir_abs, "shard")
        if n_del:
            if del_indexed:
                ns_d = shards_for(n_del)
                total += _write_family_distributed(
                    hd_df.where(F.col("d")), ns_d, dir_abs, "del")
                meta.update(del_nshards=ns_d, del_rows=n_del)
            else:
                meta.update(del_unindexed=True, del_rows=n_del)
            if n_live:
                meta["mixed"] = True
        meta["bytes"] = total
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


def _load_shard(dir_abs: str, shard: int, prefix: str = "shard") -> np.ndarray:
    """Memory-map the shard read-only: every worker process on a host
    shares ONE page-cache copy of the index (np.fromfile would copy
    each shard into each of the ~cores python workers — O(cores x
    index) RSS), loads are lazy (a binary search touches O(log) pages,
    so a post-merge cold probe does not re-read the whole index), and
    sidecar files are immutable-once-published, so a mapping can never
    observe a torn write. The cache bounds VIRTUAL bytes — i.e. open
    fds — not RSS; the kernel evicts pages under pressure."""
    key = (dir_abs, shard, prefix)
    hit = _SHARD_CACHE.pop(key, None)
    if hit is not None:
        _SHARD_CACHE[key] = hit  # reinsert at tail: LRU recency on hit
        return hit
    from kudu_spark.fs import env_for_root

    try:
        # LocalEnv memory-maps (the fast path described above);
        # remote envs read the shard into memory instead
        arr = env_for_root(dir_abs).read_array(
            _shard_path(dir_abs, shard, prefix))
    except FileNotFoundError:
        arr = np.empty(0, dtype="<i8")  # shard had no keys (never written)
    except (OSError, ValueError) as e:
        # any OTHER IO error (a transient object-store failure, a
        # truncated/odd-length file) must NOT read as "absent": a
        # swallowed flake here becomes a false negative feeding the
        # insert duplicate check (ADVICE r9). Fail the probe task
        # loudly instead — wrong answers are worse than no answer.
        raise OSError(
            f"presence shard {_shard_path(dir_abs, shard, prefix)} unreadable "
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


def _norm_specs(specs):
    """Normalize + order probe specs. Accepts legacy 2-tuples
    (dir, nshards) = a live family at seq 0, or full 4-tuples
    (dir, nshards, seq, live: bool). Returns the resolution order:
    seq DESCENDING (newest commit answers first), live-before-delete
    on seq ties (a key both live and deleted at one seq — a mixed
    commit — reads live: superset-safe, never a false negative)."""
    full = []
    for t in specs:
        if len(t) == 2:
            full.append((t[0], int(t[1]), 0, True))
        else:
            full.append((t[0], int(t[1]), int(t[2]), bool(t[3])))
    full.sort(key=lambda t: (-t[2], not t[3]))
    return full


def probe_hashes(specs, hv: np.ndarray) -> np.ndarray:
    """Membership of each int64 hash in ``hv`` against the sidecar
    families in ``specs`` (see _norm_specs): walking families newest-
    first, each key resolves at its FIRST hit — a live hit answers
    present, a delete hit answers absent (the seq subtraction that
    keeps probes exact through un-compacted DELETEs). One binary
    search per (family, key) not yet resolved. Pure numpy — this is
    the body of the Arrow-batched UDF, factored out so it is testable
    without a SparkSession."""
    hv = np.asarray(hv, dtype="int64")
    out = np.zeros(len(hv), dtype=bool)
    resolved = np.zeros(len(hv), dtype=bool)
    for dir_abs, ns, _seq, live in _norm_specs(specs):
        todo = ~resolved
        if not todo.any():
            break
        prefix = "shard" if live else "del"
        shard = hv % ns if ns > 1 else np.zeros(len(hv), dtype="int64")
        for s in np.unique(shard[todo]):
            arr = _load_shard(dir_abs, int(s), prefix)
            if not len(arr):
                continue
            mask = todo & (shard == s)
            vals = hv[mask]
            idx = np.searchsorted(arr, vals)
            idx[idx >= len(arr)] = len(arr) - 1
            hit = np.zeros(len(hv), dtype=bool)
            hit[mask] = arr[idx] == vals
            out[hit] = live
            resolved |= hit
    return out


def load_all_shards(specs) -> dict:
    """Every shard of every sidecar family in ``specs``, loaded
    eagerly into {(dir, shard, prefix): array} — ONLY for driver-local
    Envs (memory://), whose bytes executor worker processes cannot
    see. The arrays then ride the UDF closure; acceptable for dev/test
    roots, never the 100 TB path (distributed Envs load executor-side,
    nothing in the task binary)."""
    from kudu_spark.fs import env_for_root

    out = {}
    for dir_abs, ns, _seq, live in _norm_specs(specs):
        env = env_for_root(dir_abs)
        prefix = "shard" if live else "del"
        for s in range(ns):
            try:
                out[(dir_abs, s, prefix)] = np.asarray(
                    env.read_array(_shard_path(dir_abs, s, prefix)))
            except FileNotFoundError:
                out[(dir_abs, s, prefix)] = np.empty(0, dtype="<i8")
    return out


def present_udf(specs: tuple, preload: dict | None = None):
    """Arrow-batched membership test against the sidecar families in
    ``specs`` (legacy (dir, nshards) live pairs or full
    (dir, nshards, seq, live) tuples — see _norm_specs). The closure
    carries only paths and ints — the index bytes load executor-side —
    except for driver-local Envs, whose shards ship via ``preload``
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


def _gather_family(d: str, ns_i: int, prefix: str, s: int,
                   ns_m: int) -> np.ndarray:
    """The keys of one source family congruent to ``s`` mod ``ns_m``.
    Shard counts are powers of two, so from a coarser source
    (ns_i <= ns_m) it is the single shard ``s % ns_i`` filtered to
    ``h % ns_m == s``; from a finer source every shard
    ``t ≡ s (mod ns_m)`` whole. Missing shard files = no keys; any
    OTHER IO error propagates — silently dropping keys from a MERGED
    sidecar would be a permanent false negative."""
    from kudu_spark.fs import env_for_root

    env = env_for_root(d)
    if ns_i <= 0:
        return np.empty(0, dtype="<i8")
    if ns_i <= ns_m:
        try:
            arr = np.asarray(env.read_array(_shard_path(d, s % ns_i, prefix)))
        except FileNotFoundError:
            return np.empty(0, dtype="<i8")
        return arr[arr % ns_m == s] if ns_m > 1 else arr
    chunks = []
    for t in range(s, ns_i, ns_m):
        try:
            chunks.append(np.asarray(env.read_array(_shard_path(d, t, prefix))))
        except FileNotFoundError:
            pass
    if not chunks:
        return np.empty(0, dtype="<i8")
    return np.concatenate(chunks)


def _replay_shard(s: int, srcs: list, ns_m: int):
    """Merged shard ``s``: REPLAY the source commits in ascending seq
    — per commit, first subtract its delete keys from the accumulated
    live set (and remember them), then union its live keys — exactly
    merge-on-read's last-write-wins applied to key presence. Returns
    (live, deletes): ``live`` is the keys present as of the window's
    max seq; ``deletes`` is the union of delete keys, retained so the
    merged sidecar keeps subtracting keys from sidecars OLDER than the
    window (a delete key re-added within the window sits in both —
    the probe's live-first tie rule reads it present, correctly).
    ``srcs`` is [(dir, live_ns, del_ns)] ASCENDING seq. Pure numpy —
    runs on driver or executor."""
    live = np.empty(0, dtype="<i8")
    dels = np.empty(0, dtype="<i8")
    for d, ns_i, ns_d in srcs:
        dl = _gather_family(d, ns_d, "del", s, ns_m)
        if len(dl):
            if len(live):
                live = live[~np.isin(live, dl, assume_unique=False)]
            dels = np.union1d(dels, dl)
        lv = _gather_family(d, ns_i, "shard", s, ns_m)
        if len(lv):
            live = np.union1d(live, lv)
    return live, dels


def absorb_delete_families(dir_abs: str, src_dirs: list,
                           unindexed_rows: int = 0) -> dict | None:
    """Fold the delete families of DYING sidecars into ``dir_abs``'s
    own delete family — the compaction hand-off that keeps probes
    exact through PARTIAL compactions: when a compaction folds delete
    deltas and removes every file referencing their sidecar, the
    subtraction those delete keys provided would vanish while OLDER
    commit-wide live sidecars (with files in untouched partitions)
    still list the deleted keys — a false "present" claimed exact. The
    new compacted sidecar inherits the delete keys instead (its seq is
    the newest, so the subtraction keeps applying to every older
    sidecar; keys re-inserted before the compaction sit in its live
    family and win the live-first tie).

    ``unindexed_rows`` > 0 marks the output ``del_unindexed`` (a dying
    sidecar carried deletes that were never indexed — prefix-tuple
    tables): the overcount can't be subtracted, so probes degrade
    honestly to superset instead. Runs driver-side pre-publish (delete
    families are delta-sized); rewrites the del family and meta in
    place — the sidecar is unreferenced until its commit lands."""
    from kudu_spark.fs import env_for_root

    meta = read_meta(dir_abs)
    if meta is None:
        return None
    env = env_for_root(dir_abs)
    parts = []
    own_ns = int(meta.get("del_nshards", 0))
    for s in range(own_ns):
        try:
            parts.append(np.asarray(env.read_array(
                _shard_path(dir_abs, s, "del"))))
        except FileNotFoundError:
            pass
    for d in src_dirs:
        m = read_meta(d)
        if m is None:
            continue
        for s in range(int(m.get("del_nshards", 0))):
            try:
                parts.append(np.asarray(env_for_root(d).read_array(
                    _shard_path(d, s, "del"))))
            except FileNotFoundError:
                pass
    dels = np.unique(np.concatenate(parts)) if parts else np.empty(0, "<i8")
    # drop the old del family (stale shard files would double-count in
    # fsck's byte audit), rewrite under the new modulus
    old_bytes = 0
    for n in env.listdir(dir_abs):
        if n.startswith("del-") and n.endswith(".i64"):
            old_bytes += env.size(os.path.join(dir_abs, n))
            env.unlink(os.path.join(dir_abs, n))
    meta = dict(meta)
    meta["bytes"] = int(meta.get("bytes", 0)) - old_bytes
    if len(dels):
        ns_d = shards_for(len(dels))
        written = _write_family_arrays(dir_abs, dels, ns_d, "del")
        meta["del_nshards"] = ns_d
        meta["del_rows"] = int(len(dels))
        meta["bytes"] += written
    else:
        meta.pop("del_nshards", None)
        meta.pop("del_rows", None)
    if unindexed_rows:
        meta["del_unindexed"] = True
        meta["del_rows"] = int(meta.get("del_rows", 0)) + int(unindexed_rows)
    env.write_bytes(os.path.join(dir_abs, META_NAME),
                    json.dumps(meta).encode())
    _META_CACHE[dir_abs] = meta
    return meta


def merge_indexes(src_dirs: list, out_dir: str, spark=None,
                  drop_deletes: bool = False) -> dict | None:
    """Merge a SEQ-CONTIGUOUS run of sidecars into one (the size-tiered
    consolidation step — Kudu's rowset-merge compaction applied to the
    key index only, tablet/compaction_policy.h, WITHOUT rewriting data
    files: probe cost is per-sidecar, so bounding live sidecars bounds
    probe work while the parquet files stay put). ``src_dirs`` must be
    ordered ascending by commit seq and contiguous — no other live
    sidecar's seq may fall inside the window — or the replayed
    subtraction would misorder deletes (the caller,
    Table.merge_presence_sidecars, enforces both). All sources must
    hash the same (cols, types) tuple and carry seqs; returns the new
    meta or None. ``drop_deletes=True`` (the window includes the
    oldest live sidecar, so nothing older remains to subtract from)
    omits the delete family from the output.

    Small merges (≤ DRIVER_MERGE_MAX_BYTES of sources) run driver-side
    one merged shard at a time — peak memory is one shard's sources,
    not the index. Larger merges with a SparkSession fan the per-shard
    replays out to executors (same shared-storage write contract as
    the data files and the executor-side build): the driver handles
    metadata only, so merge IO scales with the cluster, not the
    driver — at 1e9 keys a merge moves ~8 GB through executors in
    shard-parallel tasks instead of serially through one process."""
    metas = [read_meta(d) for d in src_dirs]
    if any(m is None or m.get("tombstones") or m.get("del_unindexed")
           or m.get("seq") is None for m in metas):
        return None  # unmergeable: unknown delete keys / unordered
    key = (tuple(metas[0]["cols"]), tuple(metas[0]["types"]))
    if any((tuple(m["cols"]), tuple(m["types"])) != key for m in metas):
        return None
    seqs = [int(m["seq"]) for m in metas]
    if seqs != sorted(seqs):
        return None
    from kudu_spark.fs import env_for_root

    env = env_for_root(out_dir)
    total_rows = sum(int(m["rows"]) for m in metas)
    src_bytes = sum(int(m.get("bytes", 0)) for m in metas)
    ns_m = shards_for(total_rows)
    srcs = [(d, int(m["nshards"]), int(m.get("del_nshards", 0)))
            for d, m in zip(src_dirs, metas)]
    env.makedirs(out_dir)
    n_live = n_del = total = 0
    if (spark is not None and src_bytes > DRIVER_MERGE_MAX_BYTES and ns_m > 1
            and env.distributed):
        import pandas as pd

        def merge_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            out = []
            for s in pdf["s"].tolist():
                live, dels = _replay_shard(int(s), srcs, ns_m)
                b = _write_shard(out_dir, int(s), live) if len(live) else 0
                if not drop_deletes and len(dels):
                    b += _write_shard(out_dir, int(s), dels, "del")
                out.append((int(s), b, len(live),
                            0 if drop_deletes else len(dels)))
            return pd.DataFrame(out, columns=["s", "b", "nl", "nd"])

        got = (
            spark.range(ns_m).selectExpr("cast(id as int) as s")
            .groupBy("s")
            .applyInPandas(merge_group, schema="s int, b long, nl long, nd long")
            .collect()
        )
        total = int(sum(r["b"] for r in got))
        n_live = int(sum(r["nl"] for r in got))
        n_del = int(sum(r["nd"] for r in got))
    else:
        for s in range(ns_m):
            live, dels = _replay_shard(s, srcs, ns_m)
            if len(live):
                total += _write_shard(out_dir, s, live)
                n_live += len(live)
            if not drop_deletes and len(dels):
                total += _write_shard(out_dir, s, dels, "del")
                n_del += len(dels)
    meta = {"version": _VERSION, "cols": list(key[0]), "types": list(key[1]),
            "seq": max(seqs), "nshards": ns_m, "rows": n_live, "bytes": total}
    if n_del:
        # the merged delete family routes by the SAME modulus as live
        meta.update(del_nshards=ns_m, del_rows=n_del)
    if any(m.get("mixed") for m in metas):
        # a mixed source's within-commit ambiguity survives the merge
        meta["mixed"] = True
    env.write_bytes(os.path.join(out_dir, META_NAME), json.dumps(meta).encode())
    return meta


def total_bytes(specs) -> int:
    out = 0
    for dir_abs in {t[0] for t in specs}:
        meta = read_meta(dir_abs)
        out += int(meta.get("bytes", 0)) if meta else 0
    return out
