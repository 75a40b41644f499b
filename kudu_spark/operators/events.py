"""Event-sequence analytics: ordered funnels and cohort retention.

Kudu's own tablet layer delegates these to the SQL engines above it
(Impala/Spark — SURVEY §2.3); they are first-class here because the
events table is the engine's time-series surface and both operators
are staples of the analytics workloads Kudu was built to serve
(kudu.tex's "time series" + "online reporting" design goals,
/root/reference/docs/kudu.tex).

Scale shapes (the 100 TB lens):

- window_funnel: ClickHouse's windowFunnel re-expressed as ONE
  shuffle keyed by user, then a codegen array-fold per user. The
  naive SQL formulation (k chained self-joins, one per funnel step)
  shuffles the events table k times; here events shuffle once into
  per-user sorted arrays and the k-step walk is an F.aggregate lambda
  — whole-stage codegen, no Python. Per-user event counts bound the
  array (product analytics: thousands, not billions, of events per
  user; the same bound ClickHouse assumes).
- retention_cohorts: two aggregations keyed by user_id, then a
  distinct + count on (cohort, week). The user-keyed join reuses the
  first groupBy's partitioning (no second full shuffle of events on a
  different key), and the cohort table is user-sized, not event-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_FUNNEL = ("signup", "view", "click", "purchase")


def _funnel_level(evs: Column, within: str | None = None) -> Column:
    """Fold a ts-sorted array of (ts, step) structs into the deepest
    funnel level reached: advance when the event IS the next step and
    happens strictly AFTER the level was reached (first step needs no
    predecessor). Ties in ts sort by step ascending, and the strict
    ``>`` means a same-timestamp pair can never count as ordered —
    matching the oracle's ``ts > prev`` CTE chain exactly
    (NULL-ts events are filtered before the fold — SQL aggregates and
    comparisons skip them, and an unfiltered NULL would otherwise
    stall the walk at its level forever).

    ``within`` (an INTERVAL literal, e.g. ``'7 days'``) bounds the
    whole chain to a conversion window anchored at the user's FIRST
    first-step event — first-touch attribution, the deterministic
    subset of ClickHouse windowFunnel(window) (a chain only a later
    anchor would catch does not count; document over cleverness)."""
    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("timestamp").alias("t0"),
    )

    def step(acc: Column, ev: Column) -> Column:
        adv = (ev["step"] == acc["level"]) & (
            (acc["level"] == 0) | (ev["ts"] > acc["ts"])
        )
        if within is not None:
            adv = adv & (
                (acc["level"] == 0)
                | (ev["ts"] <= acc["t0"] + F.expr(f"INTERVAL {within}"))
            )
        return F.when(
            adv,
            F.struct(
                (acc["level"] + 1).alias("level"),
                ev["ts"].alias("ts"),
                F.coalesce(acc["t0"], ev["ts"]).alias("t0"),
            ),
        ).otherwise(acc)

    return F.aggregate(evs, init, step)["level"]


def _funnel_level_any(evs: Column, within: str) -> Column:
    """Deepest funnel level over ANY anchor placement — full
    ClickHouse windowFunnel(window, strict_increase) semantics: every
    first-step event is a candidate chain anchor, the chain must land
    inside ``within`` of ITS anchor, and the user's level is the max
    depth over anchors (a chain only a LATER anchor satisfies now
    counts — the case first-touch attribution misses).

    Shape: a nested codegen fold — outer over the user's first-step
    events (anchors), inner the same greedy earliest-eligible walk as
    _funnel_level pinned to that anchor. Greedy-per-anchor is optimal
    by the standard exchange argument, so max-over-anchors is exact.
    O(anchors x events) per user, both bounded by the per-user event
    count the one-shuffle design already assumes."""
    w = F.expr(f"INTERVAL {within}")

    def depth_from(anchor: Column) -> Column:
        init = F.struct(
            F.lit(1).alias("level"), anchor["ts"].alias("ts")
        )
        # NOTE (measured at 20M rows): pre-filtering the array to the
        # anchor's window (F.filter) looks like it should cut the
        # inner work, but array_filter MATERIALIZES a fresh array per
        # anchor — the allocation churn measured ~2x SLOWER than
        # folding the shared array with cheap branch-misses. Keep the
        # plain fold.

        def step(acc: Column, ev: Column) -> Column:
            adv = (
                (ev["step"] == acc["level"])
                & (ev["ts"] > acc["ts"])
                & (ev["ts"] <= anchor["ts"] + w)
            )
            return F.when(
                adv,
                F.struct((acc["level"] + 1).alias("level"),
                         ev["ts"].alias("ts")),
            ).otherwise(acc)

        return F.aggregate(evs, init, step)["level"]

    anchors = F.filter(evs, lambda e: e["step"] == 0)
    return F.aggregate(
        anchors, F.lit(0), lambda acc, a: F.greatest(acc, depth_from(a))
    )


def window_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = DEFAULT_FUNNEL,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
    anchor: str = "first",
) -> DataFrame:
    """Strict-order funnel: for each user, walk their events in time
    order and count how deep into ``steps`` they got (each step must
    happen strictly after the previous step's first occurrence — the
    greedy earliest-match semantics of ClickHouse windowFunnel with
    strict_increase). Returns one row per step:
    (step_no, step, users) where users = #users reaching >= step_no.

    Equivalent to the chained min-ts CTE formulation (each step's
    reach time is the MIN eligible ts): the fold advances at the
    first eligible event in global ts order, which IS that minimum.

    With ``within``, ``anchor`` picks the attribution model:
    ``"first"`` bounds the chain to the window after the user's FIRST
    first-step event (first-touch — deterministic subset);
    ``"any"`` scores chains from EVERY first-step anchor and keeps
    the deepest — full ClickHouse windowFunnel(window) semantics
    (_funnel_level_any). ``anchor`` is ignored without ``within``
    (anchor choice cannot change an unbounded chain's greedy depth:
    any chain from a later anchor is a suffix-extension the
    first-anchor greedy walk also reaches).
    """
    if anchor not in ("first", "any"):
        raise ValueError(f"unknown funnel anchor mode {anchor!r}")
    step_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    e = events.where(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("ts"),
        step_map[F.col(type_col)].alias("step"),
    )
    per_user = e.groupBy("__u").agg(
        F.array_sort(F.collect_list(F.struct("ts", "step"))).alias("__evs")
    )
    lv = (_funnel_level_any(F.col("__evs"), within)
          if within is not None and anchor == "any"
          else _funnel_level(F.col("__evs"), within))
    levels = per_user.select(lv.alias("__lv"))
    counts = levels.agg(
        *[
            F.sum((F.col("__lv") >= k).cast("bigint")).alias(f"__s{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    names = F.array(*[F.lit(s) for s in steps])
    return (
        counts.select(
            F.posexplode(
                F.array(*[F.col(f"__s{k}") for k in range(1, len(steps) + 1)])
            ).alias("__pos", "users")
        )
        .select(
            (F.col("__pos") + 1).cast("int").alias("step_no"),
            F.element_at(names, F.col("__pos") + 1).alias("step"),
            F.coalesce(F.col("users"), F.lit(0)).alias("users"),
        )
    )


def window_funnel_sql(steps: tuple[str, ...] = DEFAULT_FUNNEL,
                      within: str | None = None) -> str:
    """DuckDB twin: the classic chained-CTE funnel (min eligible ts
    per step, strictly after the previous step's ts; with ``within``,
    every step also bounded to the window after the s1 anchor)."""
    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        wpred = (f" AND e.ts <= a.t + INTERVAL {within}" if within else "")
        wjoin = (f" JOIN s1 a ON e.user_id = a.user_id" if within else "")
        ctes.append(
            f"s{i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{i} p ON e.user_id = p.user_id{wjoin} "
            f"WHERE e.event_type = '{steps[i]}' AND e.ts > p.t{wpred} "
            f"GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT {i + 1} AS step_no, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i + 1}) AS users"
        for i, s in enumerate(steps)
    ]
    return (
        "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)
    )


def window_funnel_any_sql(steps: tuple[str, ...] = DEFAULT_FUNNEL,
                          within: str = "2 DAY") -> str:
    """DuckDB twin of window_funnel(anchor="any"): the chained min-ts
    CTEs carry the (user, anchor_ts) pair — one chain PER ANCHOR, each
    bounded to its own window — and a user counts at step k when ANY
    of their anchors' chains reaches it. Greedy-per-anchor is optimal
    (exchange argument), so this is exact, like the nested fold."""
    ctes = [
        f"s1 AS (SELECT user_id, ts AS a FROM events "
        f"WHERE event_type = '{steps[0]}' AND ts IS NOT NULL)"
    ]
    prev_t = "a"
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i + 1} AS (SELECT p.user_id, p.a, min(e.ts) AS t FROM events e "
            f"JOIN s{i} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{steps[i]}' AND e.ts > p.{prev_t} "
            f"AND e.ts <= p.a + INTERVAL {within} "
            f"GROUP BY p.user_id, p.a)"
        )
        prev_t = "t"
    selects = [
        f"SELECT {i + 1} AS step_no, '{s}' AS step, "
        f"(SELECT count(DISTINCT user_id) FROM s{i + 1}) AS users"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users cohorted by the week of their
    first event; for each (cohort_week, week_no) count distinct users
    active that many weeks later. The product-analytics retention
    triangle.

    Plan: groupBy(user) min(ts) -> join back on user (reuses the
    user-hash partitioning; AQE broadcasts the cohort side only while
    it fits) -> distinct (cohort, week_no, user) -> count. Weeks are
    date_trunc('week') deltas, exact integers in both engines."""
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(ts_col).alias("__first_ts")
    )
    cohorted = events.select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
    ).join(first, "__u")
    act = cohorted.select(
        F.date_trunc("week", F.col("__first_ts")).alias("cohort_week"),
        (
            F.datediff(
                F.to_date(F.date_trunc("week", F.col("__ts"))),
                F.to_date(F.date_trunc("week", F.col("__first_ts"))),
            )
            / 7
        )
        .cast("int")
        .alias("week_no"),
        F.col("__u"),
    ).distinct()
    return act.groupBy("cohort_week", "week_no").agg(
        F.count(F.lit(1)).alias("active_users")
    )


RETENTION_COHORTS_SQL = """
WITH first_ev AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT
         date_trunc('week', f.first_ts) AS cohort_week,
         CAST(date_diff('day', date_trunc('week', f.first_ts),
                        date_trunc('week', e.ts)) / 7 AS INT) AS week_no,
         e.user_id
  FROM events e JOIN first_ev f ON e.user_id = f.user_id
)
SELECT cohort_week, week_no, count(*) AS active_users
FROM act GROUP BY cohort_week, week_no
"""


def sequence_match(
    events: DataFrame,
    pattern: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse-style sequenceMatch over the max-gap pattern subset
    ``(?1)(?t<=g1)(?2)(?t<=g2)(?3)...``: per user, does SOME placement
    of events (strictly increasing ts, like the funnel family) match
    the whole chain, with each step at most ``gap`` after the
    previous matched step? ``pattern`` is a list of event types or
    (event_type, max_gap_interval) tuples, e.g.
    ``["signup", ("view", "1 HOUR"), ("purchase", "2 DAY")]``.
    Returns (user_id, depth, matched): depth = longest satisfiable
    pattern PREFIX, matched = the full chain exists.

    Shape: ONE user-keyed shuffle, then a single-pass codegen fold in
    ts order carrying, per pattern prefix k, the latest ts at which
    the prefix completes — split into t_k (all completions so far) and
    p_k (completions STRICTLY BEFORE the current timestamp; p shifts
    from t whenever the fold crosses to a new ts). Advances read p,
    not t: among completions x < y < e.ts, e.ts - y < e.ts - x, so the
    latest STRICTLY-EARLIER completion dominates under max-gap upper
    bounds — but a completion AT e.ts itself must not be read, or an
    equal-ts event would shadow an older, still-admissible one (the
    A@17, A@21, B@21 case: B must match A@17; caught by the randomized
    exhaustive-search test). This is why a backtracking matcher
    (ClickHouse's) is unnecessary for this subset, and why MIN-gap
    constraints (t>N, where the dominance flips) are deliberately NOT
    offered. An existential m-way self-join (the DuckDB oracle) is the
    ground truth it provably equals. O(events x m) per user."""
    steps = [p[0] if isinstance(p, (tuple, list)) else p for p in pattern]
    gaps = [None if not isinstance(p, (tuple, list)) or len(p) < 2 else p[1]
            for p in pattern]
    m = len(steps)
    if m == 0:
        raise ValueError("sequence_match needs a non-empty pattern")
    e = events.where(
        F.col(type_col).isin(list(set(steps))) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        # explicit cast: the fold state's timestamp slots must match
        # the event ts type exactly (a TIMESTAMP_NTZ source otherwise
        # fails struct reconstruction inside F.aggregate)
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(type_col).alias("typ"),
    )
    # ts-sorted array per user; typ breaks ts ties deterministically
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "typ"))).alias("__evs"))

    nul = F.lit(None).cast("timestamp")
    init = F.struct(
        nul.alias("last"),
        *[nul.alias(f"p{k}") for k in range(1, m + 1)],
        *[nul.alias(f"t{k}") for k in range(1, m + 1)],
    )

    def step(acc: Column, ev: Column) -> Column:
        # crossing to a new timestamp publishes t -> p: p_k is the
        # latest completion of prefix k at ts STRICTLY BELOW ev.ts
        shift = acc["last"].isNull() | (ev["ts"] > acc["last"])
        p = {k: F.when(shift, acc[f"t{k}"]).otherwise(acc[f"p{k}"])
             for k in range(1, m + 1)}
        fields = [ev["ts"].alias("last")]
        fields += [p[k].alias(f"p{k}") for k in range(1, m + 1)]
        for k in range(1, m + 1):
            cond = ev["typ"] == steps[k - 1]
            if k > 1:
                prev = p[k - 1]
                # prev < ev.ts by construction, so strict ordering is
                # implied; only the gap bound needs checking
                cond = cond & prev.isNotNull()
                if gaps[k - 1] is not None:
                    cond = cond & (
                        ev["ts"] <= prev + F.expr(f"INTERVAL {gaps[k - 1]}"))
            # ascending fold order => ev.ts >= any stored completion,
            # so "set to ev.ts" IS the latest-completion update
            fields.append(
                F.when(cond, ev["ts"]).otherwise(acc[f"t{k}"]).alias(f"t{k}"))
        return F.struct(*fields)

    state = F.aggregate(F.col("__evs"), init, step)
    depth = sum(
        (state[f"t{k}"].isNotNull().cast("int") for k in range(1, m + 1)),
        F.lit(0))
    return per_user.select(
        "user_id",
        depth.cast("int").alias("depth"),
        state[f"t{m}"].isNotNull().alias("matched"),
    )


def sequence_match_sql(pattern: list, min_depth: int = 0) -> str:
    """DuckDB twin of sequence_match: the existential ground truth —
    prefix k is satisfiable iff a k-way self-join placement exists
    with strictly increasing ts and each max-gap bound honored.
    Returns (user_id, depth, matched) for every user with any pattern
    event, like the fold."""
    steps = [p[0] if isinstance(p, (tuple, list)) else p for p in pattern]
    gaps = [None if not isinstance(p, (tuple, list)) or len(p) < 2 else p[1]
            for p in pattern]
    m = len(steps)

    def exists_k(k: int) -> str:
        froms = ", ".join(f"events e{i}" for i in range(1, k + 1))
        conds = [f"e1.user_id = u.user_id",
                 f"e1.event_type = '{steps[0]}'", "e1.ts IS NOT NULL"]
        for i in range(2, k + 1):
            conds += [
                f"e{i}.user_id = u.user_id",
                f"e{i}.event_type = '{steps[i - 1]}'",
                f"e{i}.ts > e{i - 1}.ts",
            ]
            if gaps[i - 1] is not None:
                conds.append(
                    f"e{i}.ts <= e{i - 1}.ts + INTERVAL {gaps[i - 1]}")
        return (f"EXISTS (SELECT 1 FROM {froms} WHERE "
                + " AND ".join(conds) + ")")

    depth_expr = "CASE " + " ".join(
        f"WHEN {exists_k(k)} THEN {k}" for k in range(m, 0, -1)
    ) + " ELSE 0 END"
    types = ", ".join(f"'{s}'" for s in set(steps))
    return f"""
    SELECT user_id, CAST(depth AS INT) AS depth, depth = {m} AS matched
    FROM (
      SELECT u.user_id, {depth_expr} AS depth
      FROM (SELECT DISTINCT user_id FROM events
            WHERE event_type IN ({types}) AND ts IS NOT NULL) u
    )
    WHERE depth >= {min_depth}
    """


def sequence_count_sql(pattern: list) -> str:
    """DuckDB twin of sequence_count: the leftmost-completion + restart
    recursion, literally. Events get the fold's exact order (pos =
    row_number over (ts, event_type) per user — array_sort's struct
    order); a recursive CTE repeatedly finds the MINIMAL completion
    position of the full chain among events strictly after the previous
    completion (ts strictly increases along a chain, so e1.pos > bpos
    bounds every step), counts it, and restarts there. max(n) per user
    is the non-overlapping match count — the reference the fold's
    count-at-first-completion + full-reset provably equals (pinned by
    the randomized exhaustive harness in tests)."""
    steps = [p[0] if isinstance(p, (tuple, list)) else p for p in pattern]
    gaps = [None if not isinstance(p, (tuple, list)) or len(p) < 2 else p[1]
            for p in pattern]
    m = len(steps)
    froms = ", ".join(f"evs e{i}" for i in range(1, m + 1))
    conds = ["e1.user_id = c.user_id", f"e1.event_type = '{steps[0]}'",
             "e1.pos > c.bpos"]
    for i in range(2, m + 1):
        conds += [
            f"e{i}.user_id = c.user_id",
            f"e{i}.event_type = '{steps[i - 1]}'",
            f"e{i}.ts > e{i - 1}.ts",
        ]
        if gaps[i - 1] is not None:
            conds.append(f"e{i}.ts <= e{i - 1}.ts + INTERVAL {gaps[i - 1]}")
    types = ", ".join(f"'{s}'" for s in set(steps))
    return f"""
    WITH RECURSIVE evs AS (
      SELECT user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_type) AS pos
      FROM events WHERE event_type IN ({types}) AND ts IS NOT NULL
    ),
    chain AS (
      SELECT user_id, CAST(0 AS BIGINT) AS bpos, 0 AS n
      FROM (SELECT DISTINCT user_id FROM evs)
      UNION ALL
      SELECT c.user_id, nxt.p, c.n + 1
      FROM chain c, LATERAL (
        SELECT min(e{m}.pos) AS p FROM {froms}
        WHERE {" AND ".join(conds)}
      ) nxt
      WHERE nxt.p IS NOT NULL
    )
    SELECT user_id, CAST(max(n) AS INT) AS n_matches
    FROM chain GROUP BY user_id
    """


def sequence_count(
    events: DataFrame,
    pattern: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse-style sequenceCount over the same max-gap pattern
    subset as ``sequence_match``: the number of NON-OVERLAPPING chain
    matches per user, counted left-to-right — each time the full chain
    first becomes satisfiable the counter increments and the search
    restarts strictly after that completion event (so matches never
    share events and never interleave). Returns (user_id, n_matches).

    The fold is sequence_match's p/t two-slot DP plus a reset: t_m
    first turning non-null IS the minimal completion ts (the DP tracks
    every feasible prefix), so count-at-first-completion + full state
    reset equals the leftmost-completion + restart reference the tests
    brute-force. Same single user-keyed shuffle, O(events x m)."""
    steps = [p[0] if isinstance(p, (tuple, list)) else p for p in pattern]
    gaps = [None if not isinstance(p, (tuple, list)) or len(p) < 2 else p[1]
            for p in pattern]
    m = len(steps)
    if m == 0:
        raise ValueError("sequence_count needs a non-empty pattern")
    e = events.where(
        F.col(type_col).isin(list(set(steps))) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(type_col).alias("typ"),
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "typ"))).alias("__evs"))

    nul = F.lit(None).cast("timestamp")
    init = F.struct(
        F.lit(0).alias("n"),
        nul.alias("last"),
        *[nul.alias(f"p{k}") for k in range(1, m + 1)],
        *[nul.alias(f"t{k}") for k in range(1, m + 1)],
    )

    def step(acc: Column, ev: Column) -> Column:
        shift = acc["last"].isNull() | (ev["ts"] > acc["last"])
        p = {k: F.when(shift, acc[f"t{k}"]).otherwise(acc[f"p{k}"])
             for k in range(1, m + 1)}
        t = {}
        for k in range(1, m + 1):
            cond = ev["typ"] == steps[k - 1]
            if k > 1:
                prev = p[k - 1]
                cond = cond & prev.isNotNull()
                if gaps[k - 1] is not None:
                    cond = cond & (
                        ev["ts"] <= prev + F.expr(f"INTERVAL {gaps[k - 1]}"))
            t[k] = F.when(cond, ev["ts"]).otherwise(acc[f"t{k}"])
        done = t[m].isNotNull()
        # completion: count it and restart strictly after this event —
        # last keeps ev.ts, so pre-reset completions can never leak
        # into the next chain via the p-shift
        fields = [
            F.when(done, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            ev["ts"].alias("last"),
        ]
        fields += [F.when(done, nul).otherwise(p[k]).alias(f"p{k}")
                   for k in range(1, m + 1)]
        fields += [F.when(done, nul).otherwise(t[k]).alias(f"t{k}")
                   for k in range(1, m + 1)]
        return F.struct(*fields)

    return per_user.select(
        "user_id",
        F.aggregate(F.col("__evs"), init, step)["n"]
        .cast("int").alias("n_matches"),
    )
