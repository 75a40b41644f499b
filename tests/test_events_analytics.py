"""Semantic tests for operators/events.py (funnel + retention) and
the r11 corpus diagnostics — hand-built fixtures where the expected
answer is derivable on paper (the oracle comparison in
test_queries_oracle covers engine parity; these pin the SEMANTICS)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kudu_spark.operators import corpus as CP
from kudu_spark.operators import dedup as DD
from kudu_spark.operators import events as EV

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, T0 + dt.timedelta(minutes=m)) for u, t, m in rows],
        "user_id bigint, event_type string, ts timestamp",
    )


def test_funnel_strict_order(spark):
    # u1 completes all 4 steps in order; u2 clicks BEFORE viewing
    # (click must not count); u3 signup only; u4 never signs up.
    rows = [
        (1, "signup", 0), (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        (2, "signup", 0), (2, "click", 1), (2, "view", 2), (2, "purchase", 3),
        (3, "signup", 5),
        (4, "view", 0), (4, "click", 1), (4, "purchase", 2),
    ]
    out = {r["step"]: r["users"] for r in EV.window_funnel(_ev(spark, rows)).collect()}
    # u2's click at minute 1 precedes their view at minute 2, so their
    # funnel stalls at view; the purchase at minute 3 needs a click
    # AFTER the view and there is none.
    assert out == {"signup": 3, "view": 2, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_not_ordered(spark):
    # strict ordering: a view at the same instant as the signup does
    # not advance the funnel.
    rows = [(1, "signup", 0), (1, "view", 0), (1, "view", 7)]
    out = {r["step"]: r["users"] for r in EV.window_funnel(_ev(spark, rows)).collect()}
    assert out["signup"] == 1 and out["view"] == 1  # the minute-7 view counts
    rows2 = [(1, "signup", 0), (1, "view", 0)]
    out2 = {r["step"]: r["users"] for r in EV.window_funnel(_ev(spark, rows2)).collect()}
    assert out2["signup"] == 1 and out2["view"] == 0


def test_funnel_greedy_earliest_is_optimal(spark):
    # two signups: the walk anchors on the EARLIEST (minute 0), so the
    # view at minute 5 counts even though a later signup (minute 10)
    # would miss it.
    rows = [(1, "signup", 0), (1, "signup", 10), (1, "view", 5)]
    out = {r["step"]: r["users"] for r in EV.window_funnel(_ev(spark, rows)).collect()}
    assert out["view"] == 1


def test_retention_cohorts_weeks(spark):
    # u1 first active week 0, returns week 1 and week 3 (two events in
    # week 1 count once); u2 first active week 1 only.
    rows = [
        (1, "view", 0),
        (1, "view", 60 * 24 * 7 + 5),      # week 1
        (1, "click", 60 * 24 * 7 + 300),   # week 1 again (dedup)
        (1, "view", 60 * 24 * 21 + 1),     # week 3
        (2, "view", 60 * 24 * 8),          # first event in week 1
    ]
    out = EV.retention_cohorts(_ev(spark, rows)).collect()
    tri = {(r["cohort_week"], r["week_no"]): r["active_users"] for r in out}
    w0 = dt.datetime(2024, 1, 1)   # 2024-01-01 is a Monday
    w1 = w0 + dt.timedelta(weeks=1)
    assert tri == {(w0, 0): 1, (w0, 1): 1, (w0, 3): 1, (w1, 0): 1}


def test_normalized_dedup_groups(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["n_copies"] for r in DD.normalized_dedup(docs).collect()}
    assert out == {1: 3, 4: 1}


def test_zipf_fit_slope_sign_and_terms(spark):
    # A synthetic Zipf corpus: token k appears ~N/k times -> slope
    # should be strongly negative and n_terms == vocabulary size.
    words = []
    for k in range(1, 21):
        words += [f"w{k:02d}"] * (200 // k)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en")], "doc_id bigint, text string, lang string"
    )
    row = CP.zipf_fit(docs, top_n=20).collect()[0]
    assert row["lang"] == "en" and row["n_terms"] == 20
    assert -1.3 < row["zipf_slope"] < -0.7  # ~ -1 by construction


def test_source_overlap_containment(spark):
    # source A: one doc of 6 tokens -> 4 trigram shingles; source B
    # shares exactly the first 3 tokens of A (1 shingle) plus noise.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "A"),
            (2, "a b c x y z", "B"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {(r["source_a"], r["source_b"]): (r["n_common"], r["containment"])
           for r in CP.source_ngram_overlap(docs).collect()}
    assert out[("A", "B")] == (1, 0.25)   # 1 of A's 4 shingles
    assert out[("B", "A")] == (1, 0.25)


def test_funnel_conversion_window(spark):
    # u1 converts inside the window; u2's click lands past it (the
    # chain is anchored at the FIRST signup)
    rows = [
        (1, "signup", 0), (1, "view", 10), (1, "click", 20),
        (2, "signup", 0), (2, "view", 10), (2, "click", 120),
    ]
    out = {r["step"]: r["users"]
           for r in EV.window_funnel(_ev(spark, rows), within="1 HOUR").collect()}
    assert out == {"signup": 2, "view": 2, "click": 1, "purchase": 0}
    # without the window both clicks count
    out2 = {r["step"]: r["users"]
            for r in EV.window_funnel(_ev(spark, rows)).collect()}
    assert out2["click"] == 2


def test_funnel_any_anchor_beats_first_touch(spark):
    """Full windowFunnel semantics (anchor='any'): a chain that only a
    LATER signup anchor satisfies must count — exactly the case
    first-touch attribution misses (VERDICT r11 next #3)."""
    rows = [
        # u1: early signup whose 1-hour window expires, then a second
        # signup whose window contains a full chain
        (1, "signup", 0),
        (1, "signup", 200), (1, "view", 210), (1, "click", 220),
        (1, "purchase", 230),
        # u2: single signup, chain past the window — must NOT count
        (2, "signup", 0), (2, "view", 120), (2, "click", 130),
        # u3: the early anchor is the only converting one (later
        # signup has nothing after it) — still counts under any-anchor
        (3, "signup", 0), (3, "view", 10), (3, "signup", 500),
    ]
    ev = _ev(spark, rows)
    first = {r["step"]: r["users"]
             for r in EV.window_funnel(ev, within="1 HOUR").collect()}
    any_ = {r["step"]: r["users"]
            for r in EV.window_funnel(ev, within="1 HOUR",
                                      anchor="any").collect()}
    # first-touch: u1 stalls at their minute-0 anchor (window over by
    # minute 200), u3's early chain works
    assert first == {"signup": 3, "view": 1, "click": 0, "purchase": 0}
    # any-anchor: u1's second signup carries the full chain
    assert any_ == {"signup": 3, "view": 2, "click": 1, "purchase": 1}


def test_funnel_any_anchor_strict_ties(spark):
    """Strict ordering holds per anchor: a view at the same instant as
    its anchor never advances, even when an earlier anchor exists whose
    window has expired."""
    rows = [
        (1, "signup", 0), (1, "signup", 100), (1, "view", 100),
    ]
    out = {r["step"]: r["users"]
           for r in EV.window_funnel(_ev(spark, rows), within="1 HOUR",
                                     anchor="any").collect()}
    # anchor@0: view@100 outside the window; anchor@100: same-instant
    # view fails strict ordering
    assert out == {"signup": 1, "view": 0, "click": 0, "purchase": 0}
    # one minute later and the second anchor's chain counts
    rows2 = [(1, "signup", 0), (1, "signup", 100), (1, "view", 101)]
    out2 = {r["step"]: r["users"]
            for r in EV.window_funnel(_ev(spark, rows2), within="1 HOUR",
                                      anchor="any").collect()}
    assert out2["view"] == 1


def test_sequence_match_dp_beats_greedy_and_edges(spark):
    """sequence_match's latest-completion fold must catch a chain only
    a LATER anchor satisfies (where greedy-earliest matching fails),
    never chain equal timestamps (strict order, like the funnel
    family), and report depth = longest satisfiable prefix."""
    from datetime import datetime

    from kudu_spark.operators.events import sequence_match

    def t(s):
        return datetime(2024, 1, 1, 0, s // 60, s % 60)

    rows = [
        # user 1: early A->B dies (no C within gap of B@5); the
        # A@100 -> B@103 -> C@106 placement matches — greedy matching
        # anchored at A@0's B@5 would report depth 2
        (1, t(0), "A"), (1, t(5), "B"),
        (1, t(100), "A"), (1, t(103), "B"), (1, t(106), "C"),
        # user 2: equal-ts pair can never chain
        (2, t(10), "A"), (2, t(10), "B"),
        # user 3: only later-step events -> depth 0
        (3, t(1), "B"), (3, t(2), "C"),
        # user 4: full chain at the gap boundary (<= is inclusive)
        (4, t(0), "A"), (4, t(10), "B"), (4, t(20), "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    pat = ["A", ("B", "10 SECOND"), ("C", "10 SECOND")]
    got = {r.user_id: (r.depth, r.matched)
           for r in sequence_match(df, pat).collect()}
    assert got[1] == (3, True)
    assert got[2] == (1, False)
    assert got[3] == (0, False)
    assert got[4] == (3, True)


def test_sequence_match_randomized_vs_exhaustive(spark):
    """The latest-completion fold must equal an EXHAUSTIVE placement
    search (all increasing event subsequences, gaps checked pairwise)
    on randomized per-user event sets — the dominance argument, pinned
    empirically across 200 seeded-random users in one Spark pass."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import sequence_match

    rng = random.Random(1307)
    types = ["A", "B", "C", "X"]
    pat = ["A", ("B", "7 SECOND"), ("C", "9 SECOND")]
    gaps = [None, 7, 9]
    base = datetime(2024, 1, 1)
    rows = []
    byuser = {}
    for u in range(200):
        evs = [(rng.randint(0, 30), rng.choice(types))
               for _ in range(rng.randint(1, 10))]
        byuser[u] = evs
        rows += [(u, base + timedelta(seconds=s), t) for s, t in evs]

    def exhaustive_depth(evs):
        steps = ["A", "B", "C"]

        def best(i, k, prev_s):
            # deepest prefix reachable from event index i onward,
            # having matched k steps, last matched at second prev_s
            if k == len(steps):
                return k
            d = k
            for j in range(i, len(evs)):
                s, t = evs[j]
                if t != steps[k]:
                    continue
                if k > 0 and (s <= prev_s or s - prev_s > gaps[k]):
                    continue
                d = max(d, best(j + 1, k + 1, s))
            return d

        evs = sorted(evs)
        return best(0, 0, None)

    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {r.user_id: (r.depth, r.matched)
           for r in sequence_match(df, pat).collect()}
    for u, evs in byuser.items():
        want = exhaustive_depth(evs)
        if not any(t in ("A", "B", "C") for _s, t in evs):
            assert u not in got  # no pattern events -> no row
            continue
        assert got[u] == (want, want == 3), (u, sorted(evs), got[u])


def test_funnel_any_anchor_randomized_vs_exhaustive(spark):
    """window_funnel(anchor='any') claims greedy-per-anchor is optimal
    (exchange argument). Pin it empirically: 200 seeded-random users
    compared against an exhaustive search over all increasing
    placements within [anchor, anchor + window], in one Spark pass —
    the same harness that caught sequence_match's equal-ts bug."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import window_funnel

    rng = random.Random(2719)
    steps = ("signup", "view", "click")
    types = list(steps) + ["noise"]
    base = datetime(2024, 1, 1)
    win_s = 8
    rows, byuser = [], {}
    for u in range(200):
        evs = [(rng.randint(0, 25), rng.choice(types))
               for _ in range(rng.randint(1, 10))]
        byuser[u] = evs
        rows += [(u, base + timedelta(seconds=s), t) for s, t in evs]

    def exhaustive_depth(evs):
        evs = sorted(e for e in evs if e[1] in steps)

        def best(i, k, prev_s, anchor_s):
            if k == len(steps):
                return k
            d = k
            for j in range(i, len(evs)):
                s, t = evs[j]
                if t != steps[k]:
                    continue
                if k == 0:
                    d = max(d, best(j + 1, 1, s, s))
                elif s > prev_s and s <= anchor_s + win_s:
                    d = max(d, best(j + 1, k + 1, s, anchor_s))
            return d

        return best(0, 0, None, None)

    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {r.step_no: r.users
           for r in window_funnel(df, steps=steps, within=f"{win_s} SECOND",
                                  anchor="any").collect()}
    want = {k: 0 for k in (1, 2, 3)}
    for evs in byuser.values():
        d = exhaustive_depth(evs)
        for k in range(1, d + 1):
            want[k] += 1
    assert got == want


def test_sequence_count_semantics_and_randomized(spark):
    """sequence_count = leftmost-completion + restart (non-overlapping
    chains, ClickHouse sequenceCount shape): pinned on hand cases and
    on 200 seeded-random users against an independent brute-force
    reference (recursive minimal-completion-index search + restart)."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import sequence_count

    base = datetime(2024, 1, 1)
    pat = ["A", ("B", "10 SECOND")]
    steps, gaps = ["A", "B"], [None, 10]

    def t(s):
        return base + timedelta(seconds=s)

    # hand cases: two disjoint A->B chains; an overlapping B reused by
    # nothing; a gap-expired pair counts zero
    rows = [
        (1, t(0), "A"), (1, t(5), "B"), (1, t(6), "A"), (1, t(9), "B"),
        (2, t(0), "A"), (2, t(5), "B"), (2, t(7), "B"),  # 2nd B unmatched
        (3, t(0), "A"), (3, t(20), "B"),                 # gap expired
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {r.user_id: r.n_matches for r in sequence_count(df, pat).collect()}
    assert got == {1: 2, 2: 1, 3: 0}

    # randomized vs brute force
    def min_completion_index(evs):
        best = [None]

        def dfs(i, k, prev_s):
            for j in range(i, len(evs)):
                if best[0] is not None and j >= best[0]:
                    return
                s, ty = evs[j]
                if ty != steps[k]:
                    continue
                if k > 0 and (s <= prev_s or s - prev_s > gaps[k]):
                    continue
                if k == len(steps) - 1:
                    best[0] = j
                    return  # j is minimal for this subtree prefix
                dfs(j + 1, k + 1, s)

        dfs(0, 0, None)
        return best[0]

    def ref_count(evs):
        evs = sorted(e for e in evs if e[1] in steps)
        n = 0
        while True:
            j = min_completion_index(evs)
            if j is None:
                return n
            n += 1
            evs = evs[j + 1:]

    rng = random.Random(4242)
    rows, byuser = [], {}
    for u in range(200):
        evs = [(rng.randint(0, 25), rng.choice(["A", "B", "X"]))
               for _ in range(rng.randint(1, 12))]
        byuser[u] = evs
        rows += [(u, t(s), ty) for s, ty in evs]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {r.user_id: r.n_matches for r in sequence_count(df, pat).collect()}
    for u, evs in byuser.items():
        if not any(ty in steps for _s, ty in evs):
            assert u not in got
            continue
        assert got[u] == ref_count(evs), (u, sorted(evs), got[u])
