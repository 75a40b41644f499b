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


# ---- r14: full ClickHouse gap-operator surface (min-gap, strict,
# equality, both-sided windows) ----

def _gap_bnds(pattern):
    """Per-step (min_s, min_strict, max_s, max_strict) in seconds for
    the brute-force references — parsed with the operator's own parser
    so a parser bug can't hide behind a hand-duplicated table."""
    from kudu_spark.operators.events import _interval_ns, _parse_pattern

    steps, bounds = _parse_pattern(pattern)
    out = []
    for b in bounds:
        mn = (_interval_ns(b["min"][0]) // 10**9, b["min"][1]) \
            if b["min"] else (None, False)
        mx = (_interval_ns(b["max"][0]) // 10**9, b["max"][1]) \
            if b["max"] else (None, False)
        out.append((mn[0], mn[1], mx[0], mx[1]))
    return steps, out


def _gap_ok(g, bnd):
    mn, mns, mx, mxs = bnd
    if mn is not None and (g < mn or (mns and g == mn)):
        return False
    if mx is not None and (g > mx or (mxs and g == mx)):
        return False
    return True


def _brute_depth(evs, steps, bnds):
    evs = sorted(evs)
    best = [0]

    def dfs(i, k, prev_s):
        best[0] = max(best[0], k)
        if k == len(steps):
            return
        for j in range(i, len(evs)):
            s, t = evs[j]
            if t != steps[k]:
                continue
            if k > 0 and (s <= prev_s or not _gap_ok(s - prev_s, bnds[k])):
                continue
            dfs(j + 1, k + 1, s)

    dfs(0, 0, None)
    return best[0]


def _brute_count(evs, steps, bnds):
    evs = sorted(e for e in evs if e[1] in steps)

    def min_completion(sub):
        best = [None]

        def dfs(i, k, prev_s):
            for j in range(i, len(sub)):
                if best[0] is not None and j >= best[0]:
                    return
                s, ty = sub[j]
                if ty != steps[k]:
                    continue
                if k > 0 and (s <= prev_s
                              or not _gap_ok(s - prev_s, bnds[k])):
                    continue
                if k == len(steps) - 1:
                    best[0] = j
                    return
                dfs(j + 1, k + 1, s)

        dfs(0, 0, None)
        return best[0]

    n = 0
    while True:
        j = min_completion(evs)
        if j is None:
            return n
        n += 1
        evs = evs[j + 1:]


_GAP_PATTERNS = [
    # min-only, strict and inclusive -> earliest-completion fold slots
    ["A", ("B", "> 5 SECOND"), ("C", ">= 4 SECOND")],
    # mixed sides across steps -> both slot families in one fold
    ["A", ("B", "7 SECOND"), ("C", "> 3 SECOND")],
    # both-sided windows -> the vectorized level DP
    ["A", ("B", ">= 3 SECOND", "<= 9 SECOND"),
     ("C", "> 2 SECOND", "< 8 SECOND")],
    # equality gap (min>= plus max<=) -> DP
    ["A", ("B", "== 5 SECOND")],
]


def test_sequence_match_gap_operators_randomized_vs_exhaustive(spark):
    """sequence_match over every gap-operator family — the dual
    (earliest+latest) dominance fold for one-sided chains and the
    searchsorted level DP for both-sided/equality chains — pinned
    against an exhaustive placement search on 150 seeded-random users
    per pattern (the harness family that caught the equal-ts bug)."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import sequence_match

    base = datetime(2024, 1, 1)
    for pi, pat in enumerate(_GAP_PATTERNS):
        steps, bnds = _gap_bnds(pat)
        rng = random.Random(1400 + pi)
        rows, byuser = [], {}
        for u in range(150):
            evs = [(rng.randint(0, 30), rng.choice(["A", "B", "C", "X"]))
                   for _ in range(rng.randint(1, 10))]
            byuser[u] = evs
            rows += [(u, base + timedelta(seconds=s), t) for s, t in evs]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string")
        got = {r.user_id: (r.depth, r.matched)
               for r in sequence_match(df, pat).collect()}
        m = len(steps)
        for u, evs in byuser.items():
            if not any(t in steps for _s, t in evs):
                assert u not in got, (pi, u)
                continue
            want = _brute_depth(evs, steps, bnds)
            assert got[u] == (want, want == m), (pi, u, sorted(evs), got[u])


def test_sequence_count_gap_operators_randomized(spark):
    """sequence_count over the same operator families vs the
    leftmost-completion + restart brute force — the count fold's reset
    interacts with the new earliest-completion slots, and the DP's
    iterated-suffix restart must agree with min(e_m.pos) exactly."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import sequence_count

    base = datetime(2024, 1, 1)
    for pi, pat in enumerate(_GAP_PATTERNS):
        steps, bnds = _gap_bnds(pat)
        rng = random.Random(2800 + pi)
        rows, byuser = [], {}
        for u in range(150):
            evs = [(rng.randint(0, 30), rng.choice(["A", "B", "C", "X"]))
                   for _ in range(rng.randint(1, 12))]
            byuser[u] = evs
            rows += [(u, base + timedelta(seconds=s), t) for s, t in evs]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string")
        got = {r.user_id: r.n_matches
               for r in sequence_count(df, pat).collect()}
        for u, evs in byuser.items():
            if not any(t in steps for _s, t in evs):
                assert u not in got, (pi, u)
                continue
            assert got[u] == _brute_count(evs, steps, bnds), \
                (pi, u, sorted(evs), got[u])


def test_sequence_dp_equals_fold_on_one_sided(spark):
    """The DP path must agree with the fold wherever both apply — run
    _sequence_dp directly on one-sided patterns (which dispatch to the
    fold publicly) and compare row sets."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import (
        _parse_pattern, _pattern_events, _sequence_dp, sequence_count,
        sequence_match)

    base = datetime(2024, 1, 1)
    rng = random.Random(777)
    rows = []
    for u in range(120):
        for _ in range(rng.randint(1, 10)):
            rows.append((u, base + timedelta(seconds=rng.randint(0, 30)),
                         rng.choice(["A", "B", "C", "X"])))
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    for pat in _GAP_PATTERNS[:2]:
        steps, bounds = _parse_pattern(pat)
        e = _pattern_events(df, steps, "user_id", "event_type", "ts")
        fold_m = {tuple(r) for r in sequence_match(df, pat).collect()}
        dp_m = {tuple(r) for r in
                _sequence_dp(e, steps, bounds, "match").collect()}
        assert fold_m == dp_m, pat
        fold_c = {tuple(r) for r in sequence_count(df, pat).collect()}
        dp_c = {tuple(r) for r in
                _sequence_dp(e, steps, bounds, "count").collect()}
        assert fold_c == dp_c, pat


def test_sequence_gap_operator_edges(spark):
    """Hand-picked gap-operator edges: boundary inclusivity for every
    operator, equal timestamps never chain even under min-gap 0, and
    the parser rejects malformed/conflicting specs."""
    from datetime import datetime, timedelta

    import pytest

    from kudu_spark.operators.events import (
        _interval_ns, _parse_pattern, sequence_match)

    base = datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [(u, base + timedelta(seconds=s), t) for u, s, t in rows],
            "user_id bigint, ts timestamp, event_type string")

    # A@0, B@5: the gap is exactly 5s — each operator's boundary
    df = mk([(1, 0, "A"), (1, 5, "B")])
    for spec, want in [("<= 5 SECOND", True), ("< 5 SECOND", False),
                       (">= 5 SECOND", True), ("> 5 SECOND", False),
                       ("== 5 SECOND", True), ("== 4 SECOND", False)]:
        r = sequence_match(df, ["A", ("B", spec)]).collect()[0]
        assert r.matched is want, spec

    # equal-ts pair never chains, even with min-gap >= 0 (strict ts
    # order is the family invariant); a later B beyond the min-gap does
    df2 = mk([(1, 10, "A"), (1, 10, "B"), (2, 10, "A"), (2, 10, "B"),
              (2, 13, "B")])
    got = {r.user_id: r.matched for r in
           sequence_match(df2, ["A", ("B", ">= 0 SECOND")]).collect()}
    assert got == {1: False, 2: True}

    # interval parser: units, plurals, compounds, rejects
    assert _interval_ns("90 MINUTE") == 90 * 60 * 10**9
    assert _interval_ns("1 DAY 12 HOURS") == 36 * 3600 * 10**9
    for bad in ["5 PARSEC", "HOUR 5", "5", "1.5 HOUR"]:
        with pytest.raises(ValueError):
            _interval_ns(bad)
    for bad_pat in [[("A", "< 1 HOUR", "<= 2 HOUR")],
                    [("A", "> 1 HOUR", ">= 2 HOUR")],
                    [("A", "== 1 HOUR", "< 2 HOUR")]]:
        with pytest.raises(ValueError):
            _parse_pattern(bad_pat)


def test_sessionize_semantics_and_randomized(spark):
    """sessionize: a pause strictly greater than the gap starts a new
    session, an exactly-gap pause does not (session_window's
    gapDuration contract); equal-ts events share a session; NULL ts
    drops. Pinned on hand cases + 200 seeded-random users against a
    one-line python reference."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import sessionize

    base = datetime(2024, 1, 1)

    def t(s):
        return base + timedelta(seconds=s)

    rows = [
        # user 1: 0,5 | 20 (gap 10s: 15 would stay, 20 splits), 25
        (1, t(0), "a"), (1, t(5), "b"), (1, t(20), "a"), (1, t(25), "b"),
        # user 2: exactly-gap pause stays one session
        (2, t(0), "a"), (2, t(10), "b"),
        # user 3: equal timestamps share a session
        (3, t(7), "a"), (3, t(7), "b"),
        (4, None, "a"), (4, t(1), "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {(r.user_id, r.ts, r.event_type): r.session_no
           for r in sessionize(df, gap="10 SECOND").collect()}
    assert got[(1, t(0), "a")] == 1 and got[(1, t(5), "b")] == 1
    assert got[(1, t(20), "a")] == 2 and got[(1, t(25), "b")] == 2
    assert got[(2, t(0), "a")] == 1 and got[(2, t(10), "b")] == 1
    assert got[(3, t(7), "a")] == 1 and got[(3, t(7), "b")] == 1
    assert (4, None, "a") not in got and got[(4, t(1), "b")] == 1

    def ref_sessions(secs, gap):
        secs = sorted(secs)
        out, cur = [], 0
        for i, s in enumerate(secs):
            if i == 0 or s - secs[i - 1] > gap:
                cur += 1
            out.append((s, cur))
        return out

    rng = random.Random(3141)
    rows, byuser = [], {}
    for u in range(200):
        secs = sorted(rng.sample(range(0, 200), rng.randint(1, 15)))
        byuser[u] = secs
        rows += [(u, t(s), "e") for s in secs]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {}
    for r in sessionize(df, gap="12 SECOND").collect():
        got[(r.user_id, r.ts)] = r.session_no
    for u, secs in byuser.items():
        for s, want in ref_sessions(secs, 12):
            assert got[(u, t(s))] == want, (u, secs)


def test_sessionize_plan_single_shuffle(spark):
    """Both window functions and the per-session aggregate must run
    off ONE user-keyed exchange — the scale claim in the docstring."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from kudu_spark.operators.events import sessionize

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "a")],
        "user_id bigint, ts timestamp, event_type string")
    agg = sessionize(df).groupBy("user_id", "session_no").agg(
        F.count("*").alias("n"))
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted")
    # count tree nodes, not the detail section's repeats
    assert plan.count("+- Exchange") == 1, plan


# ---- r14: windowFunnel strict_order / strict_dedup modes ----

def _walk_level(evs, steps, mode, within=None, anchor_ts=None):
    """Independent walk reference: greedy earliest-eligible advance
    with a sticky stop. evs = sorted [(sec, step_idx)] (step -1 =
    non-funnel); anchor_ts pins an any-anchor walk (starts at level 1
    at the anchor)."""
    if anchor_ts is None:
        level, lts, t0, stopped = 0, None, None, False
    else:
        level, lts, t0, stopped = 1, anchor_ts, anchor_ts, False
    for s, st in evs:
        adv = (not stopped and st == level
               and (level == 0 or s > lts)
               and (within is None or level == 0 or s <= t0 + within))
        if adv:
            if level == 0:
                t0 = s
            level, lts = level + 1, s
            continue
        if stopped:
            continue
        if mode == "strict_order":
            if (anchor_ts is None and level > 0) or \
                    (anchor_ts is not None and s > anchor_ts):
                stopped = True
        elif mode == "strict_dedup":
            if st >= 0 and st < level and \
                    (anchor_ts is None or s > anchor_ts):
                stopped = True
    return level


def _ref_funnel_users(byuser, steps, mode, within=None, anchor="first"):
    want = {k: 0 for k in range(1, len(steps) + 1)}
    for evs in byuser.values():
        evs = sorted(evs)
        if mode == "strict_order":
            walked = evs
        else:
            walked = [e for e in evs if e[1] >= 0]
        if anchor == "any":
            d = 0
            for s, st in walked:
                if st == 0:
                    d = max(d, _walk_level(walked, steps, mode,
                                           within, anchor_ts=s))
        else:
            d = _walk_level(walked, steps, mode, within)
        for k in range(1, d + 1):
            want[k] += 1
    return want


def test_window_funnel_strict_modes_hand_cases(spark):
    """The ClickHouse doc examples: strict_order stops A->B->C at the
    D in A->B->D->C; strict_dedup stops at a re-matched step
    (A->B->A->C freezes at 2 first-touch, but anchor='any' recovers
    depth 3 from the second A when the chain after it is clean)."""
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import window_funnel

    base = datetime(2024, 1, 1)

    def t(s):
        return base + timedelta(seconds=s)

    steps = ("A", "B", "C")
    rows = [
        # user 1: A B D C -> strict_order stops at D (level 2)
        (1, t(0), "A"), (1, t(1), "B"), (1, t(2), "D"), (1, t(3), "C"),
        # user 2: clean A B C
        (2, t(0), "A"), (2, t(1), "B"), (2, t(2), "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    got = {r.step_no: r.users
           for r in window_funnel(df, steps=steps,
                                  mode="strict_order").collect()}
    assert got == {1: 2, 2: 2, 3: 1}
    # without the mode, user 1 completes (D is not a funnel type)
    got = {r.step_no: r.users
           for r in window_funnel(df, steps=steps).collect()}
    assert got == {1: 2, 2: 2, 3: 2}

    rows2 = [
        # A B A C: dedup stops at the second A (first-touch level 2);
        # anchored at the second A the chain B?-C is missing B -> 1
        (1, t(0), "A"), (1, t(1), "B"), (1, t(2), "A"), (1, t(3), "C"),
        # A A B C: first-touch stops at second A (level 1); the second
        # anchor's walk B->C is clean -> any recovers 3
        (2, t(0), "A"), (2, t(1), "A"), (2, t(2), "B"), (2, t(3), "C"),
    ]
    df2 = spark.createDataFrame(
        rows2, "user_id bigint, ts timestamp, event_type string")
    got = {r.step_no: r.users
           for r in window_funnel(df2, steps=steps,
                                  mode="strict_dedup").collect()}
    assert got == {1: 2, 2: 1, 3: 0}
    got = {r.step_no: r.users
           for r in window_funnel(df2, steps=steps, mode="strict_dedup",
                                  anchor="any").collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_window_funnel_strict_modes_randomized(spark):
    """Strict modes x anchor x window pinned against an independent
    python walk on 150 seeded-random users per configuration
    (non-funnel 'N' events included — they interrupt strict_order
    only)."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import window_funnel

    base = datetime(2024, 1, 1)
    steps = ("A", "B", "C")
    smap = {"A": 0, "B": 1, "C": 2, "N": -1}
    cfgs = [("strict_order", None, "first"), ("strict_order", 9, "first"),
            ("strict_order", None, "any"), ("strict_order", 9, "any"),
            ("strict_dedup", None, "first"), ("strict_dedup", 9, "any")]
    for ci, (mode, win_s, anchor) in enumerate(cfgs):
        rng = random.Random(9100 + ci)
        rows, byuser = [], {}
        for u in range(150):
            evs = [(rng.randint(0, 25), rng.choice(["A", "B", "C", "N"]))
                   for _ in range(rng.randint(1, 10))]
            byuser[u] = [(s, smap[ty]) for s, ty in evs]
            rows += [(u, base + timedelta(seconds=s), ty) for s, ty in evs]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string")
        got = {r.step_no: r.users for r in window_funnel(
            df, steps=steps, mode=mode, anchor=anchor,
            within=None if win_s is None else f"{win_s} SECOND").collect()}
        want = _ref_funnel_users(byuser, steps, mode, win_s, anchor)
        assert got == want, (mode, win_s, anchor, got, want)


def test_sequence_dp_carry_across_arrow_batches(spark):
    """The DP's mapInPandas carry buffer must re-join users whose rows
    span Arrow batches: force 7-row batches over users with up to 30
    events and compare against the normal batch size (and the fold on
    a one-sided twin pattern)."""
    import random
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import sequence_count, sequence_match

    base = datetime(2024, 1, 1)
    rng = random.Random(4711)
    rows = []
    for u in range(60):
        for _ in range(rng.randint(1, 30)):
            rows.append((u, base + timedelta(seconds=rng.randint(0, 40)),
                         rng.choice(["A", "B", "C", "X"])))
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    pat = ["A", ("B", "> 2 SECOND", "<= 15 SECOND"), ("C", "<= 20 SECOND")]

    big_m = {tuple(r) for r in sequence_match(df, pat).collect()}
    big_c = {tuple(r) for r in sequence_count(df, pat).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small_m = {tuple(r) for r in sequence_match(df, pat).collect()}
        small_c = {tuple(r) for r in sequence_count(df, pat).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert small_m == big_m
    assert small_c == big_c
    assert len(big_m) == 60  # every user with pattern events has a row


def test_retention_conditions_semantics(spark):
    """retention(): cond 1 qualifies; later conditions count only
    qualified users; pct is relative to the qualified count and NULL
    (not a crash) when nobody qualifies."""
    from datetime import datetime, timedelta

    from kudu_spark.operators.events import retention_conditions

    base = datetime(2024, 1, 1)

    def t(d):
        return base + timedelta(days=d)

    rows = [
        # u1 qualifies and returns both weeks
        (1, t(0), "signup"), (1, t(8), "view"), (1, t(15), "view"),
        # u2 qualifies, returns week 2 only
        (2, t(1), "signup"), (2, t(9), "click"),
        # u3 does NOT qualify (no signup) but is active later — must
        # not count anywhere
        (3, t(8), "view"), (3, t(16), "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string")
    conds = [
        "event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00'",
        "ts >= TIMESTAMP '2024-01-08 00:00:00' AND "
        "ts < TIMESTAMP '2024-01-15 00:00:00'",
        "ts >= TIMESTAMP '2024-01-15 00:00:00'",
    ]
    got = {r.cond_no: (r.users, r.pct)
           for r in retention_conditions(df, conds).collect()}
    assert got == {1: (2, 1.0), 2: (2, 1.0), 3: (1, 0.5)}

    # nobody qualifies -> zero users, NULL pct, no ANSI divide error
    got0 = {r.cond_no: (r.users, r.pct) for r in retention_conditions(
        df, ["event_type = 'refund'", "event_type = 'view'"]).collect()}
    assert got0 == {1: (0, None), 2: (0, None)}


def test_retention_cohorts_null_ts_rows(spark):
    """r14 single-pass rewrite: a NULL-ts event must still contribute
    its (cohort_week, NULL week_no) row exactly like the old
    join-then-distinct formulation did (collect_set drops NULLs, so
    the operator re-appends one when observed)."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),                           # week 0
        (1, base + dt.timedelta(weeks=2)),   # week 2
        (1, None),                           # NULL ts -> NULL week row
        (2, None),                           # all-NULL user: one NULL/NULL row
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {(r["cohort_week"], r["week_no"]): r["active_users"]
           for r in __import__("kudu_spark.operators.events",
                               fromlist=["retention_cohorts"])
           .retention_cohorts(df).collect()}
    assert out == {
        (base, 0): 1,
        (base, 2): 1,
        (base, None): 1,   # u1's NULL-ts event
        (None, None): 1,   # u2: no non-NULL ts at all
    }
