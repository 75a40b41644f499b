"""Commit-log checkpointing + state cache: replay must read
O(CHECKPOINT_EVERY) log files regardless of table history (Kudu keeps
tablet metadata resident — master/catalog_manager.cc,
tablet/tablet_metadata.h superblocks; our file-native equivalent is a
TableState snapshot under _log/checkpoints/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

import kudu_spark.meta as M
from kudu_spark.engine import Engine
from kudu_spark.meta import append_commit, checkpoint_versions, replay

SCHEMA = [("k", "bigint", False), ("v", "int", True)]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def test_checkpointed_replay_reads_bounded_log(engine, spark, monkeypatch):
    t = engine.create_table("ck", SCHEMA, pk=["k"])
    t.insert(spark.createDataFrame([(k, k) for k in range(10)], "k bigint, v int"))
    # schema evolution BEFORE the checkpoint: column-ID projection must
    # survive serialization (old files read the default via schema v1)
    engine.alter_table("ck").add_column("w", "int", default=7).apply()
    base_version = t.version
    # 80 cheap metadata commits (no Spark jobs); state() after each is
    # the access pattern that lets whoever replays far enough write the
    # next checkpoint
    for i in range(80):
        append_commit(t.root, t.state().version + 1,
                      {"op": "set_props", "props": {f"p{i}": i}})
        t.state()
    assert checkpoint_versions(t.root), "no checkpoint written after 80 commits"

    # a cold replay (fresh cache) must read commits since the last
    # checkpoint only, not the whole history
    M._STATE_CACHE.clear()
    seen = {}
    real = M.read_log

    def counting(root, max_version=None, min_version=None):
        out = real(root, max_version, min_version)
        seen["n"] = len(out)
        return out

    monkeypatch.setattr(M, "read_log", counting)
    st = replay(t.name, t.root, None)
    assert seen["n"] <= M.CHECKPOINT_EVERY
    assert st.version == base_version + 80
    assert st.props["p79"] == 79 and st.props["p0"] == 0
    monkeypatch.undo()

    # cached HEAD replay does zero log-file reads (one listdir)
    seen.clear()
    monkeypatch.setattr(M, "read_log", counting)
    assert replay(t.name, t.root, None) is st
    assert "n" not in seen
    monkeypatch.undo()

    # scans and time travel still correct across the checkpoint — old
    # files project through the checkpointed per-version schemas
    rows_ = t.scan().collect()
    assert len(rows_) == 10 and all(r.w == 7 for r in rows_)
    old = replay(t.name, t.root, base_version)
    assert old.version == base_version and "p0" not in old.props
    # GC keeps a bounded number of checkpoints
    assert len(checkpoint_versions(t.root)) <= M.CHECKPOINTS_KEPT


def test_state_listing_bounded(engine, spark, monkeypatch):
    """Steady-state state() never LISTs _log/: HEAD is found by probing
    forward from the cached head (versions are dense) and replay
    windows read commits by constructed path — O(new commits) stats per
    call, no O(history) directory listing (the object-store LIST cost a
    100k-commit table would otherwise pay on every planner call)."""
    import os as _os

    t = engine.create_table("ls", SCHEMA, pk=["k"])
    t.insert(spark.createDataFrame([(1, 1)], "k bigint, v int"))
    for i in range(5):
        append_commit(t.root, t.state().version + 1,
                      {"op": "set_props", "props": {f"q{i}": i}})
    t.state()  # warm the head + state caches

    calls = {"n": 0}
    real = _os.listdir

    def counting(path):
        if str(path).endswith(M.LOG_DIR):
            calls["n"] += 1
        return real(path)

    monkeypatch.setattr(M.os, "listdir", counting)
    for i in range(20):
        append_commit(t.root, t.state().version + 1,
                      {"op": "set_props", "props": {f"r{i}": i}})
        st = t.state()
    assert st.props["r19"] == 19 and st.props["q0"] == 0
    assert calls["n"] == 0, f"{calls['n']} _log listings in the steady state"


def test_state_cache_lru_refresh_on_hit(engine, monkeypatch):
    """A cache hit refreshes recency (true LRU, not FIFO): a hot
    table's state must survive eviction pressure from cold tables."""
    import os as _os

    monkeypatch.setattr(M, "_STATE_CACHE_MAX", 4)
    M._STATE_CACHE.clear()
    tables = [engine.create_table(f"lru{i}", SCHEMA, pk=["k"]) for i in range(5)]
    for t in tables[:4]:
        replay(t.name, t.root, None)
    replay(tables[0].name, tables[0].root, None)  # hit: lru0 becomes hottest
    replay(tables[4].name, tables[4].root, None)  # evicts lru1, NOT lru0
    roots = {k[0] for k in M._STATE_CACHE}
    assert _os.path.abspath(tables[0].root) in roots
    assert _os.path.abspath(tables[1].root) not in roots


def test_state_cache_survives_drop_and_recreate(engine, spark):
    """A table dropped and recreated at the same path restarts version
    numbering — the cache must not serve the dead table's state."""
    t = engine.create_table("dr", SCHEMA, pk=["k"])
    t.insert(spark.createDataFrame([(1, 1)], "k bigint, v int"))
    t.state()  # cached
    engine.drop_table("dr")
    t2 = engine.create_table("dr", SCHEMA, pk=["k"])
    t2.insert(spark.createDataFrame([(2, 2)], "k bigint, v int"))
    got = [r.k for r in t2.scan().collect()]
    assert got == [2]
