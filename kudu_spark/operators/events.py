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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_FUNNEL = ("signup", "view", "click", "purchase")


def _funnel_level(evs: Column, within: str | None = None,
                  mode: str | None = None) -> Column:
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
    anchor would catch does not count; document over cleverness).

    ``mode`` adds ClickHouse's interruption semantics via a sticky
    ``stopped`` flag (the walk is operational by definition, so the
    flag IS the semantics — no search argument needed):
    ``"strict_order"``: once the chain has started, ANY non-advancing
    event freezes the level (the A->B->D->C example stops at D; the
    caller feeds ALL event types, non-funnel ones as step -1);
    ``"strict_dedup"``: an event matching an ALREADY-matched step
    (step index < level) freezes it."""
    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("timestamp").alias("t0"),
        F.lit(False).alias("stopped"),
    )

    def step(acc: Column, ev: Column) -> Column:
        adv = (
            ~acc["stopped"]
            & (ev["step"] == acc["level"])
            & ((acc["level"] == 0) | (ev["ts"] > acc["ts"]))
        )
        if within is not None:
            adv = adv & (
                (acc["level"] == 0)
                | (ev["ts"] <= acc["t0"] + F.expr(f"INTERVAL {within}"))
            )
        if mode == "strict_order":
            viol = acc["level"] > 0
        elif mode == "strict_dedup":
            viol = (ev["step"] >= 0) & (ev["step"] < acc["level"])
        else:
            viol = F.lit(False)
        return F.when(
            adv,
            F.struct(
                (acc["level"] + 1).alias("level"),
                ev["ts"].alias("ts"),
                F.coalesce(acc["t0"], ev["ts"]).alias("t0"),
                F.lit(False).alias("stopped"),
            ),
        ).otherwise(
            F.struct(
                acc["level"].alias("level"),
                acc["ts"].alias("ts"),
                acc["t0"].alias("t0"),
                (acc["stopped"] | viol).alias("stopped"),
            )
        )

    return F.aggregate(evs, init, step)["level"]


def _funnel_level_any(evs: Column, within: str | None,
                      mode: str | None = None) -> Column:
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
    count the one-shuffle design already assumes.

    ``mode`` (strict_order / strict_dedup) freezes each anchor's walk
    at its first interruption — only events strictly AFTER the anchor
    can interrupt (earlier array entries belong to other anchors'
    timelines). With a mode, ``within`` may be None: per-anchor walks
    differ even unbounded (an interruption one anchor hits, a later
    anchor skips), unlike the plain greedy case."""
    w = F.expr(f"INTERVAL {within}") if within is not None else None

    def depth_from(anchor: Column) -> Column:
        init = F.struct(
            F.lit(1).alias("level"), anchor["ts"].alias("ts"),
            F.lit(False).alias("stopped"),
        )
        # NOTE (measured at 20M rows): pre-filtering the array to the
        # anchor's window (F.filter) looks like it should cut the
        # inner work, but array_filter MATERIALIZES a fresh array per
        # anchor — the allocation churn measured ~2x SLOWER than
        # folding the shared array with cheap branch-misses. Keep the
        # plain fold.

        def step(acc: Column, ev: Column) -> Column:
            adv = (
                ~acc["stopped"]
                & (ev["step"] == acc["level"])
                & (ev["ts"] > acc["ts"])
            )
            if w is not None:
                adv = adv & (ev["ts"] <= anchor["ts"] + w)
            after = ev["ts"] > anchor["ts"]
            if mode == "strict_order":
                viol = after
            elif mode == "strict_dedup":
                viol = after & (ev["step"] >= 0) & (ev["step"] < acc["level"])
            else:
                viol = F.lit(False)
            return F.when(
                adv,
                F.struct((acc["level"] + 1).alias("level"),
                         ev["ts"].alias("ts"),
                         F.lit(False).alias("stopped")),
            ).otherwise(
                F.struct(acc["level"].alias("level"),
                         acc["ts"].alias("ts"),
                         (acc["stopped"] | viol).alias("stopped"))
            )

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
    mode: str | None = None,
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
    (_funnel_level_any). Without ``within`` or ``mode``, ``anchor``
    is ignored (anchor choice cannot change an unbounded chain's
    greedy depth: any chain from a later anchor is a suffix-extension
    the first-anchor greedy walk also reaches).

    ``mode`` completes the ClickHouse mode surface:
    ``"strict_order"`` — once a chain starts, ANY non-advancing event
    interrupts it (including non-funnel types, which are folded in as
    step -1 for this mode only); ``"strict_dedup"`` — an event
    re-matching an already-matched step interrupts. Interruption
    freezes the walk, so a LATER anchor can now beat the first one
    even unbounded — with a mode, ``anchor="any"`` runs the
    per-anchor fold regardless of ``within``.
    """
    if anchor not in ("first", "any"):
        raise ValueError(f"unknown funnel anchor mode {anchor!r}")
    if mode not in (None, "strict_order", "strict_dedup"):
        raise ValueError(f"unknown funnel mode {mode!r}")
    step_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    if mode == "strict_order":
        # every event can interrupt, so none may be filtered out
        e = events.where(F.col(ts_col).isNotNull()).select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("ts"),
            F.coalesce(step_map[F.col(type_col)], F.lit(-1)).alias("step"),
        )
    else:
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
    lv = (_funnel_level_any(F.col("__evs"), within, mode)
          if anchor == "any" and (within is not None or mode is not None)
          else _funnel_level(F.col("__evs"), within, mode))
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


def window_funnel_strict_sql(steps: tuple[str, ...] = DEFAULT_FUNNEL,
                             mode: str = "strict_order",
                             within: str | None = None) -> str:
    """DuckDB twin of window_funnel(mode=..., anchor='first'): the
    strict modes are OPERATIONAL semantics (a walk with a sticky stop
    flag), so the oracle simulates that exact walk as a recursive CTE
    — one recursion step per event in (ts, step) position order, the
    same total order the fold's array_sort uses. A stopped row emits
    no successor, so each user's max-pos row carries the final level.
    Chained-min-ts CTEs can't express interruption; recursion can."""
    if mode not in ("strict_order", "strict_dedup"):
        raise ValueError(f"unknown funnel mode {mode!r}")
    step_case = ("CASE event_type " + " ".join(
        f"WHEN '{s}' THEN {i}" for i, s in enumerate(steps))
        + " ELSE -1 END")
    types = ", ".join(f"'{s}'" for s in steps)
    src_filter = ("ts IS NOT NULL" if mode == "strict_order"
                  else f"ts IS NOT NULL AND event_type IN ({types})")
    wpred = (f" AND (w.level = 0 OR e.ts <= w.t0 + INTERVAL {within})"
             if within else "")
    viol = ("w.level > 0" if mode == "strict_order"
            else "e.step >= 0 AND e.step < w.level")
    m = len(steps)
    selects = [
        f"SELECT {i + 1} AS step_no, '{s}' AS step, "
        f"(SELECT count(*) FROM final WHERE level >= {i + 1}) AS users"
        for i, s in enumerate(steps)
    ]
    return f"""
    WITH RECURSIVE evs AS (
      SELECT user_id, ts, {step_case} AS step,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, {step_case}) AS pos
      FROM events WHERE {src_filter}
    ),
    walk AS (
      SELECT user_id, CAST(0 AS BIGINT) AS pos, 0 AS level,
             CAST(NULL AS TIMESTAMP) AS lts,
             CAST(NULL AS TIMESTAMP) AS t0, FALSE AS stopped
      FROM (SELECT DISTINCT user_id FROM evs)
      UNION ALL
      SELECT w.user_id, e.pos,
             CASE WHEN x.adv THEN w.level + 1 ELSE w.level END,
             CASE WHEN x.adv THEN e.ts ELSE w.lts END,
             CASE WHEN x.adv AND w.level = 0 THEN e.ts ELSE w.t0 END,
             CASE WHEN x.adv THEN FALSE
                  ELSE w.stopped OR ({viol}) END
      FROM walk w
      JOIN evs e ON e.user_id = w.user_id AND e.pos = w.pos + 1,
      LATERAL (SELECT (NOT w.stopped AND e.step = w.level
                       AND (w.level = 0 OR e.ts > w.lts){wpred}) AS adv) x
      WHERE NOT w.stopped AND w.level < {m}
    ),
    final AS (
      SELECT user_id, level
      FROM walk QUALIFY row_number() OVER (PARTITION BY user_id
                                           ORDER BY pos DESC) = 1
    )
    {" UNION ALL ".join(selects)}
    """


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users cohorted by the week of their
    first event; for each (cohort_week, week_no) count distinct users
    active that many weeks later. The product-analytics retention
    triangle.

    Plan (r14, guide §2.3/§2.4): ONE pass — the former shape
    aggregated first-activity per user, joined it back to the full
    event stream, and paid a distinct over (cohort, week, user):
    two event scans, a join, and three data-sized shuffles. One
    user-keyed aggregation now collects each user's DISTINCT active
    weeks next to their min(ts) (collect_set dedups map-side, so the
    single shuffle carries per-user week sets — bounded by the
    calendar, not the event count), and the triangle explodes the
    user-sized sets. A NULL-ts event contributes a NULL week row in
    both engines (collect_set drops NULLs, so it is re-appended when
    observed), keeping the old join formulation's NULL algebra
    exactly. Weeks are date_trunc('week') deltas, exact integers in
    both engines."""
    wk = F.date_trunc("week", F.col("__ts"))
    per_user = (
        events.select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts"))
        .groupBy("__u")
        .agg(
            F.min("__ts").alias("__first_ts"),
            F.collect_set(wk).alias("__wks"),
            F.sum(F.col("__ts").isNull().cast("int")).alias("__nullts"),
        )
    )
    wks = F.when(
        F.col("__nullts") > 0,
        F.concat(F.col("__wks"),
                 F.array(F.lit(None).cast("timestamp"))),
    ).otherwise(F.col("__wks"))
    act = per_user.select(
        F.date_trunc("week", F.col("__first_ts")).alias("cohort_week"),
        F.col("__first_ts").alias("__f"),
        F.explode(wks).alias("__wk"),
    ).select(
        "cohort_week",
        (
            F.datediff(
                F.to_date(F.col("__wk")),
                F.to_date(F.date_trunc("week", F.col("__f"))),
            )
            / 7
        )
        .cast("int")
        .alias("week_no"),
    )
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


_GAP_NS = {
    "MICROSECOND": 1_000,
    "MILLISECOND": 1_000_000,
    "SECOND": 1_000_000_000,
    "MINUTE": 60 * 1_000_000_000,
    "HOUR": 3600 * 1_000_000_000,
    "DAY": 86400 * 1_000_000_000,
    "WEEK": 7 * 86400 * 1_000_000_000,
}


def _interval_ns(spec: str) -> int:
    """Parse the INTERVAL-literal subset the sequence operators accept
    ('12 HOUR', '1 DAY 12 HOUR', ...) into nanoseconds. The DP path
    compares int64-ns timestamps, so its bounds must be the exact same
    quantity Spark's INTERVAL arithmetic adds — integer unit multiples
    only, rejected loudly otherwise."""
    toks = spec.split()
    if not toks or len(toks) % 2:
        raise ValueError(f"unsupported interval literal {spec!r}")
    total = 0
    for num, unit in zip(toks[::2], toks[1::2]):
        u = unit.upper()
        if u.endswith("S") and u[:-1] in _GAP_NS:
            u = u[:-1]
        if u not in _GAP_NS or not num.isdigit():
            raise ValueError(f"unsupported interval literal {spec!r}")
        total += int(num) * _GAP_NS[u]
    return total


def _parse_pattern(pattern: list) -> tuple[list, list]:
    """Normalize a sequence pattern into (steps, bounds). Each element
    is an event type, or a (type, constraint...) tuple where every
    constraint is an interval string with an optional leading operator
    — the full ClickHouse ``(?t OP N)`` surface:

        ("view", "12 HOUR")               legacy shorthand for <=
        ("view", "<= 12 HOUR")            gap at most (inclusive)
        ("view", "< 12 HOUR")             gap strictly less
        ("view", "> 1 HOUR")              gap strictly more (min-gap)
        ("view", ">= 1 HOUR")             gap at least
        ("view", "== 1 HOUR")             gap exactly
        ("view", "> 1 HOUR", "<= 1 DAY")  both-sided window

    Returns per-step dicts {"min": (interval, strict)|None,
    "max": (interval, strict)|None}; ``==`` is min>= plus max<=."""
    steps, bounds = [], []
    for p in pattern:
        if isinstance(p, (tuple, list)):
            typ, specs = p[0], [s for s in p[1:] if s is not None]
        else:
            typ, specs = p, []
        mn = mx = None
        for s in specs:
            s = str(s).strip()
            m = re.match(r"^(<=|>=|==|<|>)\s*(.+)$", s)
            op, iv = (m.group(1), m.group(2).strip()) if m else ("<=", s)
            # an unparseable interval should fail at build time, not
            # deep inside a Spark job or the DP kernel
            _interval_ns(iv)
            if op == "==":
                if mn is not None or mx is not None:
                    raise ValueError(f"conflicting gap bounds in {p!r}")
                mn, mx = (iv, False), (iv, False)
            elif op in ("<", "<="):
                if mx is not None:
                    raise ValueError(f"duplicate max-gap bound in {p!r}")
                mx = (iv, op == "<")
            else:
                if mn is not None:
                    raise ValueError(f"duplicate min-gap bound in {p!r}")
                mn = (iv, op == ">")
        steps.append(typ)
        bounds.append({"min": mn, "max": mx})
    return steps, bounds


def _pattern_events(events: DataFrame, steps: list, user_col: str,
                    type_col: str, ts_col: str) -> DataFrame:
    return events.where(
        F.col(type_col).isin(list(set(steps))) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        # explicit cast: the fold state's timestamp slots must match
        # the event ts type exactly (a TIMESTAMP_NTZ source otherwise
        # fails struct reconstruction inside F.aggregate)
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(type_col).alias("typ"),
    )


def _gap_cond(cond: Column, k: int, ev: Column, p: dict, q: dict,
              steps: list, bounds: list) -> Column:
    """AND the (k-1)->k transition's ordering + gap bounds onto cond.
    ``p`` holds the LATEST strictly-earlier completion per prefix,
    ``q`` the EARLIEST. An upper bound reads p — among completions
    x < y < ev.ts, ev.ts - y < ev.ts - x, so the latest is the weakest
    constraint; a lower bound reads q by the mirror argument (the
    earliest maximizes the elapsed gap). Exact because each step
    carries at most ONE side here (both-sided steps route the whole
    call to _sequence_dp) and both slots are maintained exactly."""
    b = bounds[k - 1]
    prev = q[k - 1] if (b["min"] and not b["max"]) else p[k - 1]
    cond = cond & prev.isNotNull()
    if b["max"] is not None:
        iv, strict = b["max"]
        lim = prev + F.expr(f"INTERVAL {iv}")
        cond = cond & (ev["ts"] < lim if strict else ev["ts"] <= lim)
    if b["min"] is not None:
        iv, strict = b["min"]
        lim = prev + F.expr(f"INTERVAL {iv}")
        cond = cond & (ev["ts"] > lim if strict else ev["ts"] >= lim)
    return cond


def _sequence_dp(e: DataFrame, steps: list, bounds: list,
                 mode: str) -> DataFrame:
    """Exact sequence matcher for arbitrary per-step gap windows — the
    fallback when a step carries BOTH a min and a max bound, where no
    single stored completion dominates (feasibility is an interval
    query over the completion-time SET, which the constant-width fold
    state cannot answer; completions {1, 10} against window [4, 6] is
    the counterexample).

    Level-by-level DP over (ts, typ)-sorted events: completions of
    prefix k-1 form a sorted array; a type-s_k event at t extends iff
    the index window [lo, hi) of completions satisfying t's gap
    bounds is non-empty — np.searchsorted, no per-event Python.

    Shape: ONE user-keyed shuffle (repartition + sortWithinPartitions)
    into mapInPandas, NOT per-user applyInPandas — at product-
    analytics cardinalities (millions of users, dozens of events
    each) the per-group Arrow/pandas overhead dominated by 10x
    (measured: 10M events / 200k users, fold 6 s vs per-user-DP 64 s,
    scripts/sequence_scale.py). Instead, every user in an Arrow batch
    is OFFSET-ENCODED onto a disjoint int64 segment (ts_us + seg*K,
    K > span + 2*max_gap), so one searchsorted per level serves ALL
    users at once; the per-candidate lower bound is clamped to the
    candidate's segment base so windows never bleed across users. A
    batch whose seg*K arithmetic could overflow int64 (pathological
    multi-year spans) falls back to a per-user loop over numpy
    slices. Users split across Arrow batches are re-joined by a
    carry buffer (rows are user-contiguous after the sort). count
    mode iterates leftmost-completion + restart per user — the
    non-overlap reset is inherently sequential — but over numpy
    slices, not per-user pandas frames."""
    m = len(steps)
    uid_t = e.schema["user_id"].dataType.simpleString()
    out_schema = (f"user_id {uid_t}, depth int, matched boolean"
                  if mode == "match" else f"user_id {uid_t}, n_matches int")
    # microsecond bounds: Spark timestamps are micros; every interval
    # unit is >= MICROSECOND so the ns parse divides exactly
    bnd = []
    for b in bounds:
        mn = ((_interval_ns(b["min"][0]) // 1000, b["min"][1])
              if b["min"] else None)
        mx = ((_interval_ns(b["max"][0]) // 1000, b["max"][1])
              if b["max"] else None)
        bnd.append((mn, mx))
    gmax = max((g[0] for mn_mx in bnd for g in mn_mx if g), default=0)

    e2 = e.repartition("user_id").sortWithinPartitions("user_id", "ts",
                                                       "typ")

    def fn(batches):
        import numpy as np
        import pandas as pd

        def exists(comps, cand, seg_lo, k):
            # side='left' at v counts x < v; 'right' counts x <= v
            mn, mx = bnd[k - 1]
            hi = np.searchsorted(comps, cand, side="left")
            if mn is not None:
                g, strict = mn
                hi = np.minimum(hi, np.searchsorted(
                    comps, cand - g, side="left" if strict else "right"))
            if mx is not None:
                g, strict = mx
                lo = np.searchsorted(
                    comps, cand - g, side="right" if strict else "left")
                lo = np.maximum(lo, seg_lo)
            else:
                lo = seg_lo
            return hi > lo

        zeros = lambda a: np.zeros(a.shape, dtype=np.int64)  # noqa: E731

        def match_user(ts_u, typ_u):
            comps = ts_u[typ_u == steps[0]]
            depth = 1 if comps.size else 0
            for k in range(2, m + 1):
                if comps.size == 0:
                    break
                cand = ts_u[typ_u == steps[k - 1]]
                comps = cand[exists(comps, cand, zeros(cand), k)]
                if comps.size:
                    depth = k
            return depth

        def count_user(ts_u, typ_u):
            n, start = 0, 0
            while True:
                sub_ts, sub_typ = ts_u[start:], typ_u[start:]
                idx = np.nonzero(sub_typ == steps[0])[0]
                comps = sub_ts[idx]
                for k in range(2, m + 1):
                    if idx.size == 0:
                        break
                    cand_idx = np.nonzero(sub_typ == steps[k - 1])[0]
                    ok = exists(comps, sub_ts[cand_idx],
                                zeros(cand_idx), k)
                    idx = cand_idx[ok]
                    comps = sub_ts[idx]
                if idx.size == 0:
                    return n
                n += 1
                # restart strictly after the MINIMAL completion event
                # — idx ascends and ts is sorted, so idx[0] is both
                # the min-position and min-ts completion (the oracle's
                # min(e_m.pos))
                start += int(idx[0]) + 1

        def process(pdf):
            s = pdf["ts"]
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            ts = s.to_numpy("datetime64[us]").astype(np.int64)
            typ = pdf["typ"].to_numpy()
            n_rows = len(pdf)
            change = np.empty(n_rows, dtype=bool)
            change[0] = True
            uid_np = pdf["user_id"].to_numpy()
            change[1:] = uid_np[1:] != uid_np[:-1]
            seg = np.cumsum(change) - 1
            nseg = int(seg[-1]) + 1
            uids = pdf["user_id"].iloc[np.nonzero(change)[0]]
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], n_rows)
            if mode == "count":
                vals = [count_user(ts[a:b], typ[a:b])
                        for a, b in zip(starts, ends)]
                return pd.DataFrame({"user_id": uids.reset_index(drop=True),
                                     "n_matches": np.array(vals, "int32")})
            tn = ts - int(ts.min())
            K = int(tn.max()) + 2 * int(gmax) + 2
            if K * (nseg + 1) >= (1 << 62):
                depth = np.array([match_user(ts[a:b], typ[a:b])
                                  for a, b in zip(starts, ends)], "int64")
            else:
                g_ts = seg * K + tn
                mask = typ == steps[0]
                comps = g_ts[mask]
                depth = np.zeros(nseg, dtype=np.int64)
                if comps.size:
                    depth[np.unique(seg[mask])] = 1
                    for k in range(2, m + 1):
                        ckm = typ == steps[k - 1]
                        cand, cseg = g_ts[ckm], seg[ckm]
                        seg_lo = np.searchsorted(comps, cseg * K)
                        ok = exists(comps, cand, seg_lo, k)
                        comps = cand[ok]
                        if comps.size == 0:
                            break
                        depth[np.unique(cseg[ok])] = k
            return pd.DataFrame({"user_id": uids.reset_index(drop=True),
                                 "depth": depth.astype("int32"),
                                 "matched": depth == m})

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            u = pdf["user_id"].to_numpy()
            tail = u == u[-1]
            first_tail = int(np.argmax(tail))  # rows are user-contiguous
            if first_tail == 0:
                carry = pdf
                continue
            carry = pdf.iloc[first_tail:].reset_index(drop=True)
            yield process(pdf.iloc[:first_tail].reset_index(drop=True))
        if carry is not None and len(carry):
            yield process(carry)

    return e2.mapInPandas(fn, schema=out_schema)


def sequence_match(
    events: DataFrame,
    pattern: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse-style sequenceMatch with the FULL gap-operator
    surface ``(?1)(?t OP N)(?2)...`` for OP in < <= > >= ==: per user,
    does SOME placement of events (strictly increasing ts, like the
    funnel family) match the whole chain with every adjacent gap
    bound honored? ``pattern`` elements are event types or
    (event_type, constraint...) tuples — see _parse_pattern; the bare
    interval shorthand ``("view", "1 HOUR")`` keeps its original
    <= meaning. Returns (user_id, depth, matched): depth = longest
    satisfiable pattern PREFIX, matched = the full chain exists.

    Shape: ONE user-keyed shuffle, then a single-pass codegen fold in
    ts order carrying, per pattern prefix k, the LATEST completion ts
    (t_k, published to p_k for strictly-earlier reads whenever the
    fold crosses to a new timestamp — a completion AT ev.ts must not
    be read, or an equal-ts event would shadow an older admissible
    one; caught by the randomized exhaustive-search test) and, when
    any step has a lower bound, the EARLIEST completion ts (e_k/q_k,
    set once). Upper bounds read p (latest strictly-earlier completion
    dominates: ev.ts - x is smallest), lower bounds read q (earliest
    dominates: ev.ts - x is largest) — so a backtracking matcher
    (ClickHouse's) is unnecessary for any chain whose steps each carry
    ONE-sided bounds. A step with BOTH bounds is an interval query
    over the completion set, which no constant-width state answers;
    those calls route to the exact vectorized level DP
    (_sequence_dp) instead — same semantics, same oracle. The
    existential m-way self-join (sequence_match_sql) is the ground
    truth both paths provably equal. O(events x m) per user."""
    steps, bounds = _parse_pattern(pattern)
    m = len(steps)
    if m == 0:
        raise ValueError("sequence_match needs a non-empty pattern")
    e = _pattern_events(events, steps, user_col, type_col, ts_col)
    if any(b["min"] and b["max"] for b in bounds):
        return _sequence_dp(e, steps, bounds, "match")
    need_min = any(b["min"] for b in bounds)
    # ts-sorted array per user; typ breaks ts ties deterministically
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "typ"))).alias("__evs"))

    nul = F.lit(None).cast("timestamp")
    slots = ["p", "t"] + (["q", "e"] if need_min else [])
    init = F.struct(
        nul.alias("last"),
        *[nul.alias(f"{s}{k}") for s in slots for k in range(1, m + 1)],
    )

    def step(acc: Column, ev: Column) -> Column:
        # crossing to a new timestamp publishes t -> p (and e -> q):
        # p_k/q_k are the latest/earliest completions of prefix k at
        # ts STRICTLY BELOW ev.ts
        shift = acc["last"].isNull() | (ev["ts"] > acc["last"])
        p = {k: F.when(shift, acc[f"t{k}"]).otherwise(acc[f"p{k}"])
             for k in range(1, m + 1)}
        q = {k: F.when(shift, acc[f"e{k}"]).otherwise(acc[f"q{k}"])
             for k in range(1, m + 1)} if need_min else p
        fields = [ev["ts"].alias("last")]
        fields += [p[k].alias(f"p{k}") for k in range(1, m + 1)]
        conds = {}
        for k in range(1, m + 1):
            cond = ev["typ"] == steps[k - 1]
            if k > 1:
                cond = _gap_cond(cond, k, ev, p, q, steps, bounds)
            conds[k] = cond
            # ascending fold order => ev.ts >= any stored completion,
            # so "set to ev.ts" IS the latest-completion update
            fields.append(
                F.when(cond, ev["ts"]).otherwise(acc[f"t{k}"]).alias(f"t{k}"))
        if need_min:
            fields += [q[k].alias(f"q{k}") for k in range(1, m + 1)]
            # earliest completion: set once, never overwritten
            fields += [
                F.coalesce(acc[f"e{k}"], F.when(conds[k], ev["ts"]))
                .alias(f"e{k}") for k in range(1, m + 1)]
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


def _gap_conds_sql(i: int, bounds: list) -> list:
    """The transition-(i-1)->i gap bounds as SQL predicates — shared
    by both oracle builders so fold/DP and oracle can never disagree
    on operator strictness."""
    out = []
    b = bounds[i - 1]
    if b["max"] is not None:
        iv, strict = b["max"]
        out.append(f"e{i}.ts {'<' if strict else '<='} "
                   f"e{i - 1}.ts + INTERVAL {iv}")
    if b["min"] is not None:
        iv, strict = b["min"]
        out.append(f"e{i}.ts {'>' if strict else '>='} "
                   f"e{i - 1}.ts + INTERVAL {iv}")
    return out


def sequence_match_sql(pattern: list, min_depth: int = 0) -> str:
    """DuckDB twin of sequence_match: the existential ground truth —
    prefix k is satisfiable iff a k-way self-join placement exists
    with strictly increasing ts and every gap bound (upper, lower, or
    both) honored. Returns (user_id, depth, matched) for every user
    with any pattern event, like the fold and the DP."""
    steps, bounds = _parse_pattern(pattern)
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
            ] + _gap_conds_sql(i, bounds)
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
    steps, bounds = _parse_pattern(pattern)
    m = len(steps)
    froms = ", ".join(f"evs e{i}" for i in range(1, m + 1))
    conds = ["e1.user_id = c.user_id", f"e1.event_type = '{steps[0]}'",
             "e1.pos > c.bpos"]
    for i in range(2, m + 1):
        conds += [
            f"e{i}.user_id = c.user_id",
            f"e{i}.event_type = '{steps[i - 1]}'",
            f"e{i}.ts > e{i - 1}.ts",
        ] + _gap_conds_sql(i, bounds)
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
    """ClickHouse-style sequenceCount over the same gap-operator
    surface as ``sequence_match``: the number of NON-OVERLAPPING chain
    matches per user, counted left-to-right — each time the full chain
    first becomes satisfiable the counter increments and the search
    restarts strictly after that completion event (so matches never
    share events and never interleave). Returns (user_id, n_matches).

    The fold is sequence_match's dual-slot DP plus a reset: t_m first
    turning non-null IS the minimal completion ts (the DP tracks every
    feasible prefix — exact for one-sided bounds by the same dual
    dominance argument), so count-at-first-completion + full state
    reset equals the leftmost-completion + restart reference the tests
    brute-force. Both-sided steps route to _sequence_dp's iterated
    level DP. Same single user-keyed shuffle, O(events x m)."""
    steps, bounds = _parse_pattern(pattern)
    m = len(steps)
    if m == 0:
        raise ValueError("sequence_count needs a non-empty pattern")
    e = _pattern_events(events, steps, user_col, type_col, ts_col)
    if any(b["min"] and b["max"] for b in bounds):
        return _sequence_dp(e, steps, bounds, "count")
    need_min = any(b["min"] for b in bounds)
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "typ"))).alias("__evs"))

    nul = F.lit(None).cast("timestamp")
    slots = ["p", "t"] + (["q", "e"] if need_min else [])
    init = F.struct(
        F.lit(0).alias("n"),
        nul.alias("last"),
        *[nul.alias(f"{s}{k}") for s in slots for k in range(1, m + 1)],
    )

    def step(acc: Column, ev: Column) -> Column:
        shift = acc["last"].isNull() | (ev["ts"] > acc["last"])
        p = {k: F.when(shift, acc[f"t{k}"]).otherwise(acc[f"p{k}"])
             for k in range(1, m + 1)}
        q = {k: F.when(shift, acc[f"e{k}"]).otherwise(acc[f"q{k}"])
             for k in range(1, m + 1)} if need_min else p
        t, conds = {}, {}
        for k in range(1, m + 1):
            cond = ev["typ"] == steps[k - 1]
            if k > 1:
                cond = _gap_cond(cond, k, ev, p, q, steps, bounds)
            conds[k] = cond
            t[k] = F.when(cond, ev["ts"]).otherwise(acc[f"t{k}"])
        done = t[m].isNotNull()
        # completion: count it and restart strictly after this event —
        # last keeps ev.ts, so pre-reset completions can never leak
        # into the next chain via the p/q-shift
        fields = [
            F.when(done, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            ev["ts"].alias("last"),
        ]
        fields += [F.when(done, nul).otherwise(p[k]).alias(f"p{k}")
                   for k in range(1, m + 1)]
        fields += [F.when(done, nul).otherwise(t[k]).alias(f"t{k}")
                   for k in range(1, m + 1)]
        if need_min:
            fields += [F.when(done, nul).otherwise(q[k]).alias(f"q{k}")
                       for k in range(1, m + 1)]
            fields += [
                F.when(done, nul).otherwise(
                    F.coalesce(acc[f"e{k}"], F.when(conds[k], ev["ts"])))
                .alias(f"e{k}") for k in range(1, m + 1)]
        return F.struct(*fields)

    return per_user.select(
        "user_id",
        F.aggregate(F.col("__evs"), init, step)["n"]
        .cast("int").alias("n_matches"),
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 MINUTE",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Inactivity-gap sessionization — the batch twin of Spark's
    streaming ``session_window``: an event starts a NEW session when
    it arrives strictly more than ``gap`` after the user's previous
    event (an exactly-``gap`` pause keeps the session, matching
    session_window's gapDuration semantics). Returns the input rows
    (NULL-ts rows dropped — they order nowhere) plus ``session_no``,
    1-based per user in time order.

    Shape: ONE user-keyed shuffle; both window functions (lag + the
    running sum of session starts) share the same
    partitionBy(user)/orderBy(ts) frame, so Catalyst evaluates them in
    a single Window node over a single sort — and a downstream
    per-(user, session) aggregate reuses the same partitioning with
    map-side partial aggregation, no second shuffle of the events.
    Ties order by (ts, type) deterministically; tie order cannot move
    a boundary, because equal timestamps always fall within any
    non-negative gap of each other."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, type_col)
    prev = F.lag(F.col(ts_col)).over(w)
    starts = (
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}"))
    ).cast("int")
    return (
        events.where(F.col(ts_col).isNotNull())
        .withColumn("session_no",
                    F.sum(starts).over(
                        w.rowsBetween(Window.unboundedPreceding, 0)))
    )


def session_stats_sql(gap: str) -> str:
    """DuckDB twin of sessionize + per-session aggregation: the same
    lag/running-sum windows, spelled in ANSI SQL."""
    return f"""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL {gap}
                  THEN 1 ELSE 0 END AS s
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ), sess AS (
      SELECT user_id, ts, event_type,
             sum(s) OVER (PARTITION BY user_id ORDER BY ts, event_type
                          ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, CAST(session_no AS INT) AS session_no,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
           min(ts) AS session_start,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
               AS duration_sec
    FROM sess
    GROUP BY user_id, session_no
    """


def retention_conditions(
    events: DataFrame,
    conds: list,
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention(cond1, ..., condN)``: per user, cond 1
    is the QUALIFYING event (did it ever hold?) and each later
    condition counts only for qualified users — the classic
    signed-up-on-day-0, came-back-on-day-k funnel where the conditions
    are arbitrary boolean expressions, not just event types (what
    retention_cohorts' fixed week grid cannot express). ``conds`` are
    SQL boolean strings (or Columns) over the event columns.

    Returns one row per condition: (cond_no 1-based, users = #users
    with cond_0 AND cond_i, pct = users / qualified, NULL when nobody
    qualifies — never a divide-by-zero under ANSI).

    Shape: ONE map-side-combined aggregation — per user a vector of
    max(cond_i) flags, then one global sum; no joins, no shuffle of
    events beyond the user groupBy. N conditions cost N counters per
    group, not N passes."""
    from pyspark.sql import Window

    n = len(conds)
    if n == 0:
        raise ValueError("retention_conditions needs >= 1 condition")
    cols = [F.expr(c) if isinstance(c, str) else c for c in conds]
    per_user = events.groupBy(F.col(user_col)).agg(*[
        F.max(F.when(c, 1).otherwise(0)).alias(f"__c{i}")
        for i, c in enumerate(cols)])
    totals = per_user.agg(*[
        F.sum(F.col("__c0") * F.col(f"__c{i}")).alias(f"__r{i}")
        for i in range(n)])
    rows = totals.select(F.posexplode(
        F.array(*[F.col(f"__r{i}") for i in range(n)])
    ).alias("__p", "users"))
    qualified = F.first("users").over(
        Window.orderBy("__p").rowsBetween(Window.unboundedPreceding,
                                          Window.unboundedFollowing))
    return (rows.select(
        (F.col("__p") + 1).cast("int").alias("cond_no"),
        F.coalesce("users", F.lit(0)).alias("users"),
        F.when(qualified > 0,
               F.round(F.coalesce("users", F.lit(0)) / qualified, 6))
        .alias("pct")))


def retention_conditions_sql(conds: list) -> str:
    """DuckDB twin of retention_conditions on the events table."""
    n = len(conds)
    flags = ", ".join(
        f"max(CASE WHEN {c} THEN 1 ELSE 0 END) AS c{i}"
        for i, c in enumerate(conds))
    sums = ", ".join(f"sum(c0 * c{i}) AS r{i}" for i in range(n))
    rows = " UNION ALL ".join(
        f"SELECT {i + 1} AS cond_no, COALESCE(r{i}, 0) AS users, "
        f"CASE WHEN COALESCE(r0, 0) > 0 THEN round(COALESCE(r{i}, 0) "
        f"/ CAST(r0 AS DOUBLE), 6) END AS pct FROM t"
        for i in range(n))
    return f"""
    WITH u AS (SELECT user_id, {flags} FROM events GROUP BY user_id),
    t AS (SELECT {sums} FROM u)
    SELECT CAST(cond_no AS INT) AS cond_no, CAST(users AS BIGINT) AS users,
           pct
    FROM ({rows}) ORDER BY cond_no
    """
