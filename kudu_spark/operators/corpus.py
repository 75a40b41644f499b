"""Corpus-level training-data operators: repetition signals,
benchmark decontamination, stratified sampling, domain mixing, and
vocabulary building.

These complement the per-document codegen expressions in
functions.text with the operators that need a shuffle — each is
shaped so the shuffle is the minimal one:

- repetition_stats: explode -> two-level partial aggregation keyed by
  (doc_id, token). Map-side combine collapses each partition's token
  runs before the exchange, so the shuffle carries O(distinct tokens
  per doc), not O(tokens). No per-doc quadratic array scans — the
  O(n * distinct) array-lambda alternative melts on 100 KB documents.
- decontaminate: the benchmark side (eval sets — thousands of docs,
  not billions) collapses to a distinct shingle set that the planner
  broadcasts; the training corpus is probed with a semi join and never
  shuffles on content. This is the industry-standard n-gram-overlap
  decontamination (e.g. GPT-3 appendix C / PaLM §6) re-expressed as
  two Catalyst joins.
- stratified_sample / domain_mix: deterministic rank-based sampling —
  row_number over md5(text) within each stratum. One shuffle keyed by
  the stratum; quotas are computed from a 1-row-per-stratum aggregate
  that broadcasts. md5 ordering gives a uniform, seedless,
  reproducible sample (the same rows survive on every cluster size —
  rand(seed) does NOT give that guarantee across partitionings).
- vocabulary: the classic word-count top-k: explode -> partial-agg
  count -> one shuffle on token -> global top-k. At 100 TB the
  explode output is huge but the map-side combine bounds the exchange
  by |vocab| per partition.

No Python UDFs anywhere — every expression is JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kudu_spark.errors import KuduSparkError
from kudu_spark.functions import text as TX
from kudu_spark.functions.text import round4, round4_sql

# quality_buckets' exact score histogram collects driver-side; cap it
# (1M distinct rounded scores ≈ 16 MB — far above any rounded-score
# corpus, far below driver OOM)
QUALITY_HIST_MAX_DISTINCT = 1 << 20


# ---------------------------------------------------------------------------
# Repetition signals (Gopher §A.1.1 repetition filters)
# ---------------------------------------------------------------------------


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals: type-token ratio complement
    (dup_word_ratio), most-frequent-token share (top_token_ratio) and
    most-frequent-bigram share (top_2gram_ratio).

    Plan (r14, guide §2.4 — remove shuffles outright): ZERO exchanges.
    The former shape exploded each granularity and paid two
    groupBy shuffles per granularity, moving one (doc_id, gram) row
    per token through the cluster. But every output is a per-DOCUMENT
    array statistic: sorting the gram array and folding it once yields
    the distinct count and the maximum run length (= the top gram's
    frequency, since equal grams are adjacent after the sort) — a
    map-only projection pipelined into the scan, work bounded by the
    document length like every other per-doc text operator here."""

    def _mode_stats(arr):
        # fold over the SORTED array: (prev, run, top, nd) — run
        # tracks the current equal-gram run, top the longest run seen,
        # nd the distinct count. Equal grams are adjacent post-sort,
        # so top == max gram frequency.
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("top"),
            F.lit(0).alias("nd"),
        )

        def step(acc, x):
            same = acc["prev"].eqNullSafe(x)
            run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["top"], run).alias("top"),
                F.when(same, acc["nd"]).otherwise(acc["nd"] + 1).alias("nd"),
            )

        return F.aggregate(F.array_sort(arr), init, step)

    t = F.split(F.lower(F.col(text_col)), " ")
    bigrams = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__t", i), F.element_at("__t", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select("doc_id", t.alias("__t")).select(
        "doc_id",
        F.size("__t").alias("__n"),
        _mode_stats(F.col("__t")).alias("__w"),
        F.size(bigrams).alias("__bn"),
        _mode_stats(bigrams).alias("__b"),
    )
    return base.select(
        "doc_id",
        F.when(F.col("__n") > 0,
               round4(1.0 - F.col("__w.nd") / F.col("__n")))
        .otherwise(0.0).alias("dup_word_ratio"),
        F.when(F.col("__n") > 0,
               round4(F.col("__w.top") / F.col("__n")))
        .otherwise(0.0).alias("top_token_ratio"),
        F.when(F.col("__bn") > 0,
               round4(F.col("__b.top") / F.col("__bn")))
        .otherwise(0.0).alias("top_2gram_ratio"),
    )


def repetition_sql() -> str:
    return """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), words AS (
      SELECT doc_id, unnest(t) AS g FROM toks
    ), wcnt AS (
      SELECT doc_id, g, count(*) AS c FROM words GROUP BY doc_id, g
    ), wstat AS (
      SELECT doc_id,
             floor((1.0 - count(*) / CAST(sum(c) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS dup_word_ratio,
             floor((max(c) / CAST(sum(c) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS top_token_ratio
      FROM wcnt GROUP BY doc_id
    ), bigrams AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
               [t[i] || ' ' || t[i+1] for i in range(1, len(t))] ELSE [] END) AS g
      FROM toks
    ), bcnt AS (
      SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY doc_id, g
    ), bstat AS (
      SELECT doc_id, floor((max(c) / CAST(sum(c) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS top_2gram_ratio
      FROM bcnt GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(w.dup_word_ratio, 0.0) AS dup_word_ratio,
           coalesce(w.top_token_ratio, 0.0) AS top_token_ratio,
           coalesce(b.top_2gram_ratio, 0.0) AS top_2gram_ratio
    FROM documents d
      LEFT JOIN wstat w ON d.doc_id = w.doc_id
      LEFT JOIN bstat b ON d.doc_id = b.doc_id
    """


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame, benchmark: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop training documents sharing any word n-gram shingle with a
    benchmark document. Returns surviving train rows (doc_id only).

    Plan: benchmark -> distinct shingles (small side: eval sets are
    thousands of docs; the planner broadcasts it / AQE keeps it on the
    build side), train -> exploded shingles -> ONE semi join marks
    contaminated ids -> anti join filters. The train corpus never
    shuffles on shingle content beyond the exploded probe."""
    t = F.split(F.lower(F.col(text_col)), " ")
    bench_shingles = (
        benchmark.select(F.explode(TX.shingles_from(t)).alias("s")).distinct()
    )
    train_shingles = train.select(
        "doc_id", F.explode(TX.shingles_from(t)).alias("s")
    )
    contaminated = (
        train_shingles.join(bench_shingles, "s", "left_semi").select("doc_id").distinct()
    )
    return train.select("doc_id").join(contaminated, "doc_id", "left_anti")


def decontaminate_sql(bench_pred: str, shingles_list_sql: str) -> str:
    """Oracle: train = NOT bench_pred, benchmark = bench_pred."""
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t, {bench_pred} AS is_bench
      FROM documents
    ), sh AS (
      SELECT doc_id, is_bench, unnest({shingles_list_sql}) AS s FROM toks
    ), bench AS (
      SELECT DISTINCT s FROM sh WHERE is_bench
    ), bad AS (
      SELECT DISTINCT doc_id FROM sh WHERE NOT is_bench AND s IN (SELECT s FROM bench)
    )
    SELECT doc_id FROM toks
    WHERE NOT is_bench AND doc_id NOT IN (SELECT doc_id FROM bad)
    """


# ---------------------------------------------------------------------------
# Deterministic stratified sampling / domain mixing
# ---------------------------------------------------------------------------


def stratified_sample(
    docs: DataFrame, stratum_col: str, n_per_stratum: int, text_col: str = "text"
) -> DataFrame:
    """Exactly n rows per stratum (fewer if the stratum is smaller),
    chosen by md5(text) rank — uniform over content, deterministic on
    any cluster/partitioning. One shuffle keyed by the stratum."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(text_col)), F.col("doc_id")
    )
    return (
        docs.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_per_stratum)
        .select("doc_id", stratum_col)
    )


def stratified_sample_sql(stratum_col: str, n_per_stratum: int) -> str:
    return f"""
    SELECT doc_id, {stratum_col} FROM (
      SELECT doc_id, {stratum_col},
             row_number() OVER (PARTITION BY {stratum_col}
                                ORDER BY md5(text), doc_id) AS __r
      FROM documents
    ) WHERE __r <= {n_per_stratum}
    """


def domain_mix(
    docs: DataFrame,
    domain_col: str,
    total_target: int,
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-weighted domain mixing: domain d gets a quota
    proportional to count(d)^alpha (alpha<1 upweights small domains —
    the multilingual-sampling temperature trick), rows chosen by
    md5(text) rank within the domain. Quotas come from a per-domain
    aggregate (|domains| rows — broadcast); the only big shuffle is
    the one keyed by domain.

    power() is correctly rounded IEEE in both engines for these
    magnitudes, and quota boundaries are integers, so floor() is
    stable across engines."""
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    weights = counts.select(
        domain_col, F.pow(F.col("__n").cast("double"), F.lit(alpha)).alias("__w")
    )
    total_w = weights.agg(F.sum("__w").alias("__tw"))
    quotas = weights.join(F.broadcast(total_w)).select(
        domain_col,
        F.greatest(
            F.lit(1),
            F.floor(F.lit(float(total_target)) * F.col("__w") / F.col("__tw") + F.lit(1e-9)).cast("int"),
        ).alias("__quota"),
    )
    w = Window.partitionBy(domain_col).orderBy(F.md5(F.col(text_col)), F.col("doc_id"))
    return (
        docs.withColumn("__r", F.row_number().over(w))
        .join(F.broadcast(quotas), domain_col)
        .where(F.col("__r") <= F.col("__quota"))
        .select("doc_id", domain_col)
    )


def domain_mix_sql(domain_col: str, total_target: int, alpha: float = 0.5) -> str:
    return f"""
    WITH w AS (
      SELECT {domain_col}, pow(CAST(count(*) AS DOUBLE), {alpha}) AS wgt
      FROM documents GROUP BY {domain_col}
    ), q AS (
      SELECT {domain_col},
             greatest(1, CAST(floor({float(total_target)} * wgt
               / (SELECT sum(wgt) FROM w) + 1e-9) AS INT)) AS quota
      FROM w
    ), ranked AS (
      SELECT doc_id, {domain_col},
             row_number() OVER (PARTITION BY {domain_col}
                                ORDER BY md5(text), doc_id) AS __r
      FROM documents
    )
    SELECT doc_id, {domain_col} FROM ranked JOIN q USING ({domain_col})
    WHERE __r <= quota
    """


# ---------------------------------------------------------------------------
# Corpus-wide line-level dedup (C4 / RefinedWeb / Dolma boilerplate removal)
# ---------------------------------------------------------------------------


def line_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               min_len: int = 0, delimiter: str = "\n") -> DataFrame:
    """Remove repeated lines ACROSS the corpus, keeping each distinct
    line's first occurrence (ordered by (id, position)) — the
    line/span-level exact dedup of C4 ("discard all but one of any
    three-sentence span occurring more than once") and RefinedWeb/
    Dolma's boilerplate line removal. Lines shorter than ``min_len``
    characters bypass dedup (navigation crumbs, blank lines — real
    pipelines only dedup substantial lines). Docs whose every line is
    dropped disappear from the output.

    Returns (id_col, text_col) with each doc's surviving lines
    rejoined in original order.

    Scale: one shuffle keyed on LINE CONTENT — Spark's
    WindowGroupLimit rewrite keeps only each line's first candidate
    per map partition before the exchange, so a boilerplate line
    repeated 100M times ships one candidate per map task, not 100M
    rows — then one doc-keyed shuffle to reassemble. No driver state,
    no UDFs."""
    parts = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delimiter, -1)).alias("__pos", "__line"),
    )
    w = Window.partitionBy("__line").orderBy(id_col, "__pos")
    kept = (
        parts.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) | (F.length("__line") < min_len))
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            delimiter,
        ).alias(text_col)
    )


def line_dedup_sql(min_len: int = 0, source: str = "documents") -> str:
    """DuckDB oracle for line_dedup over a ``(doc_id, text)`` relation
    (newline-delimited); ``source`` may be a subquery."""
    return f"""
    WITH split AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM {source} AS __src
    ), lines AS (
      SELECT doc_id, pos, ls[pos] AS line
      FROM split, LATERAL UNNEST(generate_series(1, len(ls))) AS g(pos)
    ), ranked AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      FROM lines
    )
    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
    FROM ranked WHERE rn = 1 OR length(line) < {int(min_len)}
    GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Vocabulary building (corpus word-count top-k)
# ---------------------------------------------------------------------------


def vocabulary_topk(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Top-k corpus tokens by frequency (ties broken by token).
    explode -> count (map-side combined) -> global top-k via
    orderBy().limit(k), which Spark plans as TakeOrderedAndProject:
    each partition keeps a k-row heap and the driver merges k rows per
    partition. (A global row_number window would funnel every distinct
    token — billions at web scale: typos, URLs — through ONE task; the
    rank column is reattached over the k survivors only.)"""
    t = F.split(F.lower(F.col(text_col)), " ")
    counts = (
        docs.select(F.explode(t).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("token", "freq", "rank")
    )


def vocabulary_sql(k: int) -> str:
    return f"""
    SELECT token, freq, rank FROM (
      SELECT token, count(*) AS freq,
             CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS BIGINT) AS rank
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
      GROUP BY token
    ) WHERE rank <= {k}
    """


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents until a TOKEN budget is filled (per stratum if
    ``stratum_col`` given, else corpus-wide) — how real training mixes
    are specified ("200B tokens of web, 30B of code"), vs the
    row-count quotas of stratified_sample/domain_mix.

    Docs are ranked by md5(text) (uniform over content, deterministic
    across partitionings, same trick as stratified_sample) and taken
    while the RUNNING token total up to and including the doc stays
    within budget — so the selection is a prefix of a deterministic
    permutation and refilling with a larger budget is a superset
    (monotone: budget B1 <= B2 implies selection(B1) ⊆ selection(B2)).

    Token counts use the single-space tokenizer (functions.text
    parity, identical in DuckDB as ``string_split(text, ' ')``).

    Scale: one shuffle keyed by the stratum for the running-sum window
    (corpus-wide mode: the window is over ONE partition of doc-count
    rows — fine to ~100M docs of metadata; shard by stratum for more).
    Only (doc_id, stratum, tokens) flow through the window, never text.
    """
    toks = F.size(F.split(F.col(text_col), " "))  # functions.text tokenizer
    key = F.col(stratum_col) if stratum_col else F.lit(0)
    out = (
        docs.select(
            id_col,
            *([stratum_col] if stratum_col else []),
            toks.cast("bigint").alias("tokens"),
            F.md5(F.col(text_col)).alias("__rk"),
        )
        .withColumn("running_tokens", F.sum("tokens").over(
            Window.partitionBy(key).orderBy(F.col("__rk"), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"))
        .where(F.col("running_tokens") <= budget_tokens)
        .drop("__rk")
    )
    return out


def token_budget_sample_sql(budget_tokens: int, stratum_col: str | None = None) -> str:
    part = f"PARTITION BY {stratum_col}" if stratum_col else ""
    sel = f", {stratum_col}" if stratum_col else ""
    return f"""
    SELECT doc_id{sel}, tokens, running_tokens FROM (
      SELECT doc_id{sel}, tokens,
             CAST(sum(tokens) OVER ({part} ORDER BY rk, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS running_tokens
      FROM (
        SELECT doc_id{sel},
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
               md5(text) AS rk
        FROM documents
      )
    ) WHERE running_tokens <= {budget_tokens}
    """


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with optional
    overlap — the chunking step in front of embedding / context-window
    training. Returns (doc_id, chunk_id, chunk_text, n_tokens) where
    chunk_id is the 0-based window index and windows start every
    ``chunk_tokens - overlap_tokens`` tokens (the final, possibly
    short, tail window is kept).

    Pure codegen: tokens split once, window starts generated with
    sequence(), slices rebuilt with slice + concat_ws — no UDFs, no
    shuffle at all (a per-row flatMap the optimizer pipelines into
    the scan)."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - F.lit(overlap_tokens)) / step) - 1, F.lit(0)) * step,
        F.lit(step),
    )
    return (
        docs.select(id_col, toks.alias("__t"), starts.alias("__s"))
        .select(id_col, F.posexplode("__s").alias("chunk_id", "__start"), "__t")
        .select(
            id_col,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", F.slice("__t", F.col("__start") + 1, chunk_tokens))
            .alias("chunk_text"),
            F.least(F.size("__t") - F.col("__start"), F.lit(chunk_tokens))
            .cast("bigint").alias("n_tokens"),
        )
    )


def chunk_documents_sql(chunk_tokens: int = 256, overlap_tokens: int = 0,
                        source: str = "documents") -> str:
    step = chunk_tokens - overlap_tokens
    return f"""
    SELECT doc_id, CAST(w AS BIGINT) AS chunk_id,
           array_to_string(t[w * {step} + 1 : w * {step} + {chunk_tokens}], ' ')
             AS chunk_text,
           CAST(least(len(t) - w * {step}, {chunk_tokens}) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, string_split(text, ' ') AS t FROM {source}
    ), UNNEST(range(CAST(greatest(ceil((len(t) - {overlap_tokens}) /
                                        CAST({step} AS DOUBLE)), 1) AS BIGINT)))
       AS u(w)
    """


def split_assign(
    docs: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each document
    lands in exactly one named split with probability proportional to
    its weight, decided by a content hash — so the assignment is
    reproducible across runs, cluster sizes and partitionings (the
    property rand(seed) does NOT give), stable under corpus growth
    (adding documents never moves existing ones between splits), and
    duplicate documents land in the SAME split (no near-identical
    train/test leakage from exact dups). ``salt`` derives independent
    re-splits from the same corpus.

    Returns (doc_id, split). Zero shuffle: a codegen projection.
    """
    cutoffs = _split_cutoffs(weights)
    h = F.substring(F.md5(F.concat(F.col(text_col), F.lit(salt))), 1, 15)
    expr = None
    for name, cut in cutoffs[:-1]:
        cond = h < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = cutoffs[-1][0]
    expr = (F.lit(last) if expr is None else expr.otherwise(last))
    return docs.select(id_col, expr.alias("split"))


def _split_cutoffs(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, 15-hex-char upper cutoff) per split: lowercase hex
    string order is isomorphic to the 60-bit integer order, so BOTH
    engines decide the split with one identical string comparison —
    no float parsing, bit-exact across Spark and DuckDB."""
    if not weights or any(w < 0 for w in weights.values()) \
            or sum(weights.values()) <= 0:
        raise ValueError("weights must be a non-empty map of non-negative "
                         "shares with a positive sum")
    import re as _re

    bad = [n for n in weights if not _re.fullmatch(r"[A-Za-z0-9_.-]+", n)]
    if bad:
        raise ValueError(f"split names must be simple identifiers: {bad}")
    total = float(sum(weights.values()))
    out = []
    acc = 0.0
    for name in sorted(weights):
        acc += weights[name] / total
        out.append((name, format(min(int(acc * 16 ** 15), 16 ** 15 - 1), "015x")))
    return out


def split_assign_sql(weights: dict[str, float], salt: str = "") -> str:
    cutoffs = _split_cutoffs(weights)
    h = f"substring(md5(text || '{salt}'), 1, 15)"
    cases = " ".join(f"WHEN {h} < '{cut}' THEN '{name}'"
                     for name, cut in cutoffs[:-1])
    case_sql = (f"CASE {cases} ELSE '{cutoffs[-1][0]}' END"
                if cases else f"'{cutoffs[-1][0]}'")
    return f"SELECT doc_id, {case_sql} AS split FROM documents"


def training_order(docs: DataFrame, id_col: str = "doc_id",
                   seed: str = "", epoch: int = 0,
                   partitions: int | None = None) -> DataFrame:
    """Deterministic pseudo-random training order: every document gets
    a ``shuffle_key`` = md5(id : seed : epoch), and the frame comes
    back range-partitioned + sorted by it — the scalable shuffle idiom
    (a global row_number would funnel 100 TB through one task; a
    range-partitioned sort is Spark's distributed sort, and readers
    consuming partition files in order see the permutation). The order
    is reproducible across runs, cluster sizes and input
    partitionings (rand(seed) is none of these), and ``epoch``
    re-derives an independent permutation per training epoch without
    rewriting data."""
    k = F.md5(F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit(str(seed)), F.lit(str(epoch))
    ))
    out = docs.withColumn("shuffle_key", k)
    n = partitions or docs.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "shuffle_key") \
              .sortWithinPartitions("shuffle_key")


def training_order_sql(seed: str = "", epoch: int = 0) -> str:
    return (
        "SELECT doc_id, md5(concat_ws(':', CAST(doc_id AS VARCHAR), "
        f"'{seed}', '{epoch}')) AS shuffle_key FROM documents"
    )


def ngram_lm_score(docs: DataFrame, n: int = 3, text_col: str = "text",
                   id_col: str = "doc_id",
                   model_docs: DataFrame | None = None) -> DataFrame:
    """Character-n-gram language-model quality score — the CCNet /
    fastText-perplexity shape of corpus filtering, self-contained: the
    model is the n-gram frequency table of ``model_docs`` (default:
    the corpus itself), and each document scores the MEAN LOG
    PROBABILITY of its character n-grams under that model with
    add-one smoothing (``avg(ln((c+1)/(N+V)))``). Low scores =
    out-of-distribution text (boilerplate, non-language, encoding
    junk); threshold on a corpus quantile like any quality signal.
    A real KenLM has backoff this deliberately omits — the point is
    the SCALABLE plumbing a pluggable model slots into.

    Scale: n-grams come from a codegen ``transform(sequence(...))``
    (no UDF, no Python in the row path); the model is one map-side-
    combined groupBy whose key space is bounded by the observed
    charset^n — small for alphabetic text, but tens of MILLIONS for
    CJK/multilingual corpora, so the scoring join is left UNHINTED:
    Spark/AQE broadcasts it when the runtime size allows and shuffles
    it when it doesn't (a forced broadcast would OOM exactly on the
    CCNet-style multilingual corpus this exists for). Per-doc
    aggregation is the only unconditionally data-sized shuffle.
    Documents shorter than ``n`` have no n-grams and drop out (same
    as the SQL twin)."""
    # guard the short-text case explicitly: sequence(1, 0) infers a
    # NEGATIVE step in Spark and yields [1, 0], not the empty array
    grams = F.expr(
        f"case when length(lower({text_col})) >= {n} then "
        f"transform(sequence(1, length(lower({text_col})) - {n - 1}), "
        f"i -> substring(lower({text_col}), i, {n})) "
        f"else array() end"
    )
    g = docs.select(F.col(id_col), F.explode(grams).alias("g"))
    src = g if model_docs is None else model_docs.select(
        F.col(id_col), F.explode(grams).alias("g"))
    model = src.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    tot = model.agg(F.sum("c").alias("n_total"),
                    F.count(F.lit(1)).alias("v"))
    return (
        g.join(model, on="g", how="left")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.round(F.avg(F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
            / (F.col("n_total") + F.col("v"))
        )), 4).alias("lm_score"))
    )


def ngram_lm_sql(n: int = 3) -> str:
    """DuckDB twin of ngram_lm_score (model = the corpus itself)."""
    return f"""
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
    grams AS (
      SELECT doc_id, substring(t, CAST(i AS INT), {n}) AS g
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(length(t) - {n - 1}, 0) + 1)) AS i
            FROM d)
    ),
    model AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
    tot AS (SELECT sum(c) AS n_total, count(*) AS v FROM model)
    SELECT doc_id,
           round(avg(ln((c + 1.0) / (n_total + v))), 4) AS lm_score
    FROM grams JOIN model USING (g) CROSS JOIN tot
    GROUP BY doc_id
    """


def quality_buckets(scored: DataFrame, score_col: str = "lm_score",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet's head/middle/tail split: partition a scored corpus into
    quality thirds (head = best scores). The cutoffs come from the
    EXACT cumulative distribution of the score HISTOGRAM — scores are
    already rounded (ngram_lm_score rounds to 4 decimals), so distinct
    values are bounded and the histogram collects driver-side in one
    small aggregate; assignment is then a codegen CASE. No global sort,
    no row_number funnel, no approx_percentile nondeterminism — the
    100 TB-honest quantile idiom. Ties share a bucket (the rule is a
    pure function of the score): with inclusive descending cumulative
    count ``cum``, a score is head when ``3*cum <= n``, middle when
    ``3*cum <= 2n``, else tail — so boundary-straddling scores fall to
    the worse bucket, deterministically.

    The histogram collect is GUARDED, not assumed bounded: an
    unrounded double ``score_col`` would make it O(corpus distinct
    values) — a driver OOM at scale — so the collect is capped at
    QUALITY_HIST_MAX_DISTINCT distinct scores (a pushed-down LIMIT in
    the same job, no extra pass) and raises loudly past it, telling
    the caller to round the score first."""
    hist = (scored.groupBy(score_col).count()
            .limit(QUALITY_HIST_MAX_DISTINCT + 1).collect())
    if len(hist) > QUALITY_HIST_MAX_DISTINCT:
        raise KuduSparkError(
            f"quality_buckets: score column {score_col!r} has more than "
            f"{QUALITY_HIST_MAX_DISTINCT} distinct values — the exact "
            "histogram would be driver-sized. Round the score first "
            "(e.g. F.round(col, 4), as ngram_lm_score already does)."
        )
    hist.sort(key=lambda r: r[score_col], reverse=True)
    n = sum(r["count"] for r in hist)
    head_cut = mid_cut = None  # minimum score still in head / middle
    cum = 0
    for r in hist:
        cum += r["count"]
        if 3 * cum <= n:
            head_cut = r[score_col]
        if 3 * cum <= 2 * n:
            mid_cut = r[score_col]
    c = F.col(score_col)
    bucket = F.when(F.lit(head_cut is not None) & (c >= F.lit(head_cut)),
                    F.lit("head"))
    bucket = bucket.when(F.lit(mid_cut is not None) & (c >= F.lit(mid_cut)),
                         F.lit("middle")).otherwise(F.lit("tail"))
    return scored.select(id_col, score_col, bucket.alias("bucket"))


def quality_buckets_sql(scored_sql: str, score_col: str = "lm_score") -> str:
    """DuckDB twin of quality_buckets over a scored subquery."""
    return f"""
    WITH scored AS ({scored_sql}),
    hist AS (SELECT {score_col}, count(*) AS c FROM scored GROUP BY {score_col}),
    cum AS (
      SELECT {score_col},
             sum(c) OVER (ORDER BY {score_col} DESC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT sum(c) FROM hist) AS n
      FROM hist
    ),
    lab AS (
      SELECT {score_col},
             CASE WHEN 3 * cum <= n THEN 'head'
                  WHEN 3 * cum <= 2 * n THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM cum
    )
    SELECT doc_id, {score_col}, bucket
    FROM scored JOIN lab USING ({score_col})
    """


def tfidf_top_terms(docs: DataFrame, k: int = 5, group_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Top-``k`` characteristic terms per document group by tf-idf —
    the standard "what is this source/domain about" profiling step of
    a training-data pipeline. tf = term count within the group; idf =
    ``ln((N+1)/(df+1)) + 1`` over N groups (smoothed, always
    positive); ties break (score desc, term asc) for determinism.

    Scale: the (group, term) and per-term-df tables are map-side-
    combined groupBys bounded by vocabulary size, never corpus rows;
    N is a 1-row broadcast; the per-group top-k is a PARTITIONED
    rank window (Spark plans rank<=k as WindowGroupLimit — per-
    partition heaps, no global funnel). No UDFs anywhere."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_groups = docs.agg(
        F.countDistinct(group_col).alias("n_groups"))
    scored = (
        tf.join(df_t, on="term")
        .crossJoin(F.broadcast(n_groups))
        .select(
            "grp", "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_groups") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "term", "tfidf", "rank")
    )


def tfidf_sql(k: int = 5, group_col: str = "source") -> str:
    """DuckDB twin of tfidf_top_terms over the ``documents`` view."""
    return f"""
    WITH toks AS (
      SELECT {group_col} AS grp, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT grp, term, count(*) AS tf FROM toks WHERE term <> ''
      GROUP BY grp, term
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    ng AS (SELECT count(DISTINCT {group_col}) AS n_groups FROM documents),
    scored AS (
      SELECT grp, term,
             round(tf * (ln((n_groups + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
      FROM tf JOIN dft USING (term) CROSS JOIN ng
    )
    SELECT grp AS {group_col}, term, tfidf, rank FROM (
      SELECT grp, term, tfidf,
             CAST(row_number() OVER (PARTITION BY grp
                                     ORDER BY tfidf DESC, term) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def word_pair_pmi(docs: DataFrame, k: int = 20, min_count: int = 5,
                  text_col: str = "text") -> DataFrame:
    """Top-``k`` collocations (adjacent word pairs) by pointwise
    mutual information — ``ln((c_xy/B) / ((c_x/T)^2-ish))`` with
    unigram probabilities from token counts — the classic phrase-
    mining / tokenizer-vocab-candidate signal. Pairs below
    ``min_count`` are cut first (PMI is noise at low counts).

    Scale: bigrams come from a codegen ``transform(sequence(...))``
    (guarded for 1-token docs — Spark's sequence(0,-1) infers a
    NEGATIVE step); unigram and bigram counts are map-side-combined
    groupBys bounded by vocabulary, joined UNHINTED so AQE broadcasts
    small vocabularies and shuffles huge ones; totals are a 1-row
    broadcast; the final top-k is TakeOrdered. Determinism: rounded
    PMI, ties by (w1, w2)."""
    t = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(t.alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = base.select(F.explode(F.expr(
        "CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(0, size(__t) - 2), "
        "i -> struct(__t[i] AS w1, __t[i + 1] AS w2)) "
        "ELSE array() END"
    )).alias("p")).select("p.w1", "p.w2").where(
        (F.col("w1") != "") & (F.col("w2") != ""))
    big = (
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
        .where(F.col("cxy") >= min_count)
    )
    tot = uni.agg(F.sum("c").alias("t_uni")).crossJoin(
        pairs.agg(F.count(F.lit(1)).alias("t_big")))
    scored = (
        big.join(uni.withColumnRenamed("w", "w1")
                    .withColumnRenamed("c", "c1"), on="w1")
        .join(uni.withColumnRenamed("w", "w2")
                 .withColumnRenamed("c", "c2"), on="w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", F.col("cxy").alias("pair_count"),
            F.round(F.log(
                (F.col("cxy") / F.col("t_big"))
                / ((F.col("c1") / F.col("t_uni"))
                   * (F.col("c2") / F.col("t_uni")))
            ), 4).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(k)


def word_pair_pmi_sql(k: int = 20, min_count: int = 5) -> str:
    """DuckDB twin of word_pair_pmi over the ``documents`` view."""
    return f"""
    WITH base AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
    uni AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(t) AS w FROM base
      ) WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
      FROM (SELECT t, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
            FROM base)
    ),
    fp AS (SELECT * FROM pairs WHERE w1 <> '' AND w2 <> ''),
    big AS (
      SELECT w1, w2, count(*) AS cxy FROM fp GROUP BY w1, w2
      HAVING count(*) >= {min_count}
    ),
    tot AS (
      SELECT (SELECT sum(c) FROM uni) AS t_uni,
             (SELECT count(*) FROM fp) AS t_big
    )
    SELECT w1, w2, cxy AS pair_count,
           round(ln((cxy / t_big) / ((u1.c / t_uni) * (u2.c / t_uni))), 4) AS pmi
    FROM big
    JOIN uni u1 ON big.w1 = u1.w
    JOIN uni u2 ON big.w2 = u2.w
    CROSS JOIN tot
    ORDER BY pmi DESC, w1, w2
    LIMIT {k}
    """


def sentence_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document sentence statistics — sentence count, mean
    sentence length in characters, and the longest sentence — the
    segmentation-level quality signals next to the token-level ones
    (functions/text.py quality_cols). Sentences split on ``[.!?]+``
    runs with whitespace-only fragments dropped; all codegen
    expressions (filter/transform/aggregate over a split array), no
    UDFs, zero shuffles beyond the scan."""
    sents = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    d = docs.select(F.col(id_col), sents.alias("__s"))
    lens = F.transform(F.col("__s"), lambda x: F.length(x))
    return d.select(
        id_col,
        F.size("__s").cast("bigint").alias("n_sentences"),
        F.when(
            F.size("__s") > 0,
            F.round(
                F.aggregate(lens, F.lit(0).cast("bigint"),
                            lambda acc, x: acc + x).cast("double")
                / F.size("__s"), 4),
        ).otherwise(F.lit(0.0)).alias("avg_sentence_chars"),
        F.coalesce(
            F.array_max(lens).cast("bigint"), F.lit(0).cast("bigint")
        ).alias("max_sentence_chars"),
    )


def sentence_stats_sql() -> str:
    """DuckDB twin of sentence_stats over the ``documents`` view."""
    return """
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                        x -> trim(x)),
                         x -> x <> '') AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CASE WHEN len(sents) > 0 THEN
             round(CAST(list_sum(list_transform(sents, x -> length(x)))
                        AS DOUBLE) / len(sents), 4)
           ELSE 0.0 END AS avg_sentence_chars,
           CAST(coalesce(list_max(list_transform(sents, x -> length(x))), 0)
                AS BIGINT) AS max_sentence_chars
    FROM s
    """


def corpus_profile(docs: DataFrame, group_cols: tuple = ("lang", "source"),
                   text_col: str = "text") -> DataFrame:
    """Per-(lang, source) corpus profile — document counts, token
    totals, and character-length distribution (mean / exact p50 / p95)
    — the first report any 100 TB ingest run produces to decide
    sampling weights and quality thresholds. One map-side-combined
    aggregate over the scan; exact interpolated percentiles computed
    per group (both engines implement continuous quantiles
    identically, the agg_percentiles precedent)."""
    ntok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    nchr = F.length(F.col(text_col)).cast("bigint")
    return (
        docs.select(*group_cols, ntok.alias("__nt"), nchr.alias("__nc"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("total_tokens"),
            F.round(F.avg("__nc"), 4).alias("avg_chars"),
            F.round(F.expr("percentile(__nc, 0.5)"), 4).alias("p50_chars"),
            F.round(F.expr("percentile(__nc, 0.95)"), 4).alias("p95_chars"),
        )
    )


def corpus_profile_sql(group_cols: tuple = ("lang", "source")) -> str:
    """DuckDB twin of corpus_profile over the ``documents`` view."""
    g = ", ".join(group_cols)
    return f"""
    SELECT {g},
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(length(text)), 4) AS avg_chars,
           round(quantile_cont(length(text), 0.5), 4) AS p50_chars,
           round(quantile_cont(length(text), 0.95), 4) AS p95_chars
    FROM documents GROUP BY {g}
    """


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit (corpus health diagnostic)
# ---------------------------------------------------------------------------


def zipf_fit(docs: DataFrame, top_n: int = 500,
             text_col: str = "text") -> DataFrame:
    """Per-language Zipf fit: regress log(freq) on log(rank) over the
    top-N terms and report the slope — the standard sanity check that
    a scraped corpus is natural language (slope near -1) rather than
    templated/boilerplate spam (much steeper) or shredded tokens
    (much flatter). One row per lang: (lang, n_terms, zipf_slope).

    Plan: explode -> map-side-combined (lang, token) counts (exchange
    bounded by |vocab| per partition, not token count) -> per-lang
    row_number with a deterministic (freq DESC, token ASC) tiebreak,
    which Spark plans as WindowGroupLimit under the rank <= N filter
    (per-partition top-N heaps, no global funnel) -> one tiny
    covar/var aggregate over <= N rows per language."""
    toks = docs.select(
        F.col("lang"), F.explode(TX.tokens_expr(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("tok"))
    ranked = tf.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_n
    )
    lr = F.log(F.col("rank").cast("double"))
    lf = F.log(F.col("freq").cast("double"))
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_terms"),
        round4(F.covar_pop(lr, lf) / F.var_pop(lr)).alias("zipf_slope"),
    )


def zipf_fit_sql(top_n: int = 500) -> str:
    """DuckDB twin (regr_slope(y, x) = covar_pop / var_pop)."""
    return f"""
    WITH tf AS (
      SELECT lang, tok, count(*) AS freq
      FROM (SELECT lang, unnest({TX.tokens_sql()}) AS tok FROM documents)
      WHERE tok <> '' GROUP BY lang, tok
    ), ranked AS (
      SELECT lang, freq,
             row_number() OVER (PARTITION BY lang
                                ORDER BY freq DESC, tok ASC) AS rank
      FROM tf
    )
    SELECT lang, count(*) AS n_terms,
           {round4_sql('regr_slope(ln(freq), ln(rank))')} AS zipf_slope
    FROM ranked WHERE rank <= {top_n} GROUP BY lang
    """


# ---------------------------------------------------------------------------
# Cross-source n-gram overlap (corpus-mix contamination diagnostic)
# ---------------------------------------------------------------------------


def source_ngram_overlap(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pairwise source-level shingle containment: for each ordered
    source pair (a, b), |shingles(a) INTERSECT shingles(b)| /
    |shingles(a)| — how much of source a's n-gram inventory also
    appears in b. The mix-design diagnostic that catches one slice of
    a 100 TB corpus silently mirroring another (a crawl that re-ingests
    a curated set, a dump syndicated across sites) BEFORE per-document
    dedup spends the big join.

    Plan (r14, guide §2.3/§2.4): explode shingles -> ONE
    groupBy(60-bit md5 prefix) collecting the DISTINCT sources per
    shingle (the shuffle carries 8-byte ints, not gram strings, and
    collect_set subsumes the former standalone distinct — one shuffle
    where the old shape paid a distinct THEN re-shuffled a self-join;
    the set is |sources|-bounded, so no hot-key blowup is possible).
    Ordered source pairs and the per-source totals both expand from
    the same grouped frame with codegen transforms — the old
    formulation planned the scan+explode+distinct subtree three times
    (join a-side, b-side, totals). Output rows = |sources|^2 at
    most."""
    sh = (
        docs.withColumn("__t", TX.tokens_expr(text_col))
        .select("source", F.explode(TX.shingles_from("__t")).alias("g"))
        .select(
            "source",
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    buckets = sh.groupBy("h").agg(
        F.sort_array(F.collect_set("source")).alias("srcs"))
    tot = (
        buckets.select(F.explode("srcs").alias("source"))
        .groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    )
    pair_expr = F.flatten(
        F.transform(
            "srcs",
            lambda x: F.transform(
                F.filter("srcs", lambda y: y != x),
                lambda y: F.struct(x.alias("source_a"),
                                   y.alias("source_b")),
            ),
        )
    )
    inter = (
        buckets.where(F.size("srcs") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.join(
        tot.withColumnRenamed("source", "source_a"), "source_a"
    ).select(
        "source_a",
        "source_b",
        "n_common",
        round4(F.col("n_common") / F.col("__n")).alias("containment"),
    )


def source_ngram_overlap_sql(shingles_list_sql: str) -> str:
    """DuckDB twin — joins raw gram strings (the Spark side's 60-bit
    md5 prefix is collision-free at oracle scale, the
    ngram_jaccard_pairs precedent)."""
    return f"""
    WITH toks AS (
      SELECT source, {TX.tokens_sql()} AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source, unnest({shingles_list_sql}) AS g FROM toks
    ), tot AS (
      SELECT source, count(*) AS n FROM sh GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM sh a JOIN sh b ON a.g = b.g AND a.source <> b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_common,
           {round4_sql('n_common / tot.n')} AS containment
    FROM inter JOIN tot ON tot.source = inter.source_a
    """
