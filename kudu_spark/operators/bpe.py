"""Byte-pair-encoding tokenizer training + encoding, corpus-scale.

A real BPE vocabulary trained ON the corpus (not the BPE-ish regex
approximation in functions/text.py): the standard subword-nmt
procedure — word-frequency table, then repeated most-frequent-
adjacent-pair merges — split so each half runs where it is cheap:

- WORD COUNTING is the corpus-sized work: one map-side-combined
  groupBy over the pre-tokenized stream, capped to the top
  ``max_words`` types by (freq DESC, word) — deterministic, and the
  cap is the scale lever: at 100 TB the distinct-word tail is
  enormous but the dropped mass is tiny and REPORTED (dropped_mass in
  the train artifact), the same capped-model discipline as the corpus
  LM quality scorer.
- The MERGE LOOP is model-sized work (<= max_words rows), so it runs
  driver-side with an incremental pair index (subword-nmt's shape) —
  like kmeans_centroids, the driver only ever holds model-scale data.
- ENCODING is corpus-sized again and stays in CODEGEN: a word's
  symbol state is a DOUBLE-SPACE-delimited string ("  l  o  w  </w>  ")
  and one merge application is ONE literal replace() — the doubled
  delimiter makes adjacent pair occurrences share zero characters, so
  replace()'s greedy left-to-right non-overlapping scan IS the BPE
  merge pass (with single spaces, " a b a b " loses the shared middle
  space to the first match and misses the second — the classic
  sentinel bug, caught in test). Applying merges in rank order equals
  lowest-rank-first encoding because a merge's operands can only be
  produced by strictly earlier merges. Encoding runs once per
  DISTINCT word (one shuffle), then joins back to the doc stream —
  O(|word types|) fold work, not O(corpus).

Everything is deterministic end to end (count-desc + lexicographic
tiebreaks), so BOTH training and encoding carry full DuckDB oracles:
the training loop unrolls into chained CTEs (one pair-count + argmax
+ replace block per merge), the same discipline kmeans_oracle_sql
uses for Lloyd iterations — "iterative" is not an excuse for a
weaker gate.

Pre-tokenizer: ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+`` (letter runs,
digit runs, punctuation runs; ASCII classes so Java regex and RE2
agree), each word closed with a ``</w>`` end-of-word symbol — the
space-delimited representation keeps it distinct from any character
run the pre-tokenizer can emit.

Reference: Sennrich et al. 2016 (subword-nmt); beyond-reference scope
(training-data pipeline mandate).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
# Spark SQL string literals process backslash escapes ('\s' -> 's'),
# DuckDB's do not — escape for the Spark spelling only
_SPARK_RE = PRETOKEN_RE.replace("\\", "\\\\")
EOW = "</w>"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(
            F.expr(f"regexp_extract_all({text_col}, '{_SPARK_RE}', 0)")
        ).alias("word")
    )


def word_counts(docs: DataFrame, text_col: str = "text",
                max_words: int | None = None) -> DataFrame:
    """(word, freq) for the corpus, optionally capped to the top
    ``max_words`` types by (freq DESC, word ASC) — the deterministic
    TOTAL order that makes the cap reproducible across cluster sizes.
    The cap plans as TakeOrderedAndProject (per-partition top-k +
    merge), never a single-partition global sort: a web-scale type
    table has hundreds of millions of rows, and only k of them ever
    travel."""
    wc = _words(docs, text_col).groupBy("word").agg(
        F.count("*").alias("freq"))
    if max_words is None:
        return wc
    return wc.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)


def _sym_text(syms: tuple) -> str:
    return "  " + "  ".join(syms) + "  "


def train_bpe(docs: DataFrame, n_merges: int = 64,
              text_col: str = "text",
              max_words: int | None = 100_000) -> dict:
    """Train BPE merges on the corpus. Returns an artifact dict:
    ``merges`` = [(left, right), ...] in rank order, ``n_word_types``
    kept, ``dropped_mass`` = fraction of word OCCURRENCES lost to the
    ``max_words`` cap (0.0 when uncapped — report, never hide, what a
    bound drops).

    Pair counting weights every adjacent occurrence (overlapping
    included: 'aaa' holds (a,a) twice) by word frequency; the winner
    is (count DESC, pair lexicographic ASC); a merge pass rewrites
    occurrences greedily left to right. The loop maintains an
    incremental pair->count + pair->words index, touching only the
    words containing the merged pair — the model-sized cost that
    justifies running it on the driver."""
    # one corpus scan: materialize the TYPE table, then both the
    # total-mass aggregate and the top-k cap read the cached
    # aggregate instead of re-tokenizing the corpus
    wc = _words(docs, text_col).groupBy("word").agg(
        F.count("*").alias("freq")).persist()
    try:
        total = wc.agg(F.sum("freq")).collect()[0][0] or 0
        capped = wc if max_words is None else (
            wc.orderBy(F.desc("freq"), F.asc("word")).limit(max_words))
        rows = capped.collect()
    finally:
        wc.unpersist()
    kept = sum(r["freq"] for r in rows)
    words = [tuple(r["word"]) + (EOW,) for r in rows]
    freqs = [int(r["freq"]) for r in rows]

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, syms in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freqs[wi]
            pair_words[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in sorted(pair_words[best]):
            syms, fq = words[wi], freqs[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= fq
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(wi)
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = tuple(out)
            for p in zip(out, out[1:]):
                pair_counts[p] += fq
                pair_words[p].add(wi)
    return {
        "merges": merges,
        "n_word_types": len(rows),
        "dropped_mass": 0.0 if total == 0 else round(1 - kept / total, 6),
    }


def merges_df(spark: SparkSession, artifact: dict) -> DataFrame:
    return spark.createDataFrame(
        [(i + 1, a, b, a + b)
         for i, (a, b) in enumerate(artifact["merges"])],
        "rank int, lhs string, rhs string, merged string")


def encode_tokens_expr(word_col: str, merges: list) -> Column:
    """Column: the BPE symbol count of ``word_col`` under ``merges``.
    Constant-size expression — the merges live in a literal array and
    F.aggregate loops over them at runtime (one replace per merge),
    so 1000 merges cost zero codegen depth."""
    init = F.concat(
        F.lit("  "),
        F.array_join(
            F.concat(F.expr(f"regexp_extract_all({word_col}, '.', 0)"),
                     F.array(F.lit(EOW))),
            "  "),
        F.lit("  "))
    if not merges:
        return F.size(F.split(F.trim(init), "  "))
    mlit = F.array(*[
        F.struct(F.lit(f" {a}  {b} ").alias("p"),
                 F.lit(f" {a}{b} ").alias("r"))
        for a, b in merges])
    folded = F.aggregate(
        mlit, init, lambda acc, m: F.replace(acc, m["p"], m["r"]))
    return F.size(F.split(F.trim(folded), "  "))


def bpe_token_counts(docs: DataFrame, artifact: dict,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) under the trained merges. Per-doc word
    multiset -> encode each DISTINCT word once -> weighted sum; the
    distinct-word frame is the only thing the fold touches."""
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all({text_col}, '{_SPARK_RE}', 0)")
        ).alias("word"),
    ).groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    enc = per_doc.select("word").distinct().withColumn(
        "n_tok", encode_tokens_expr("word", artifact["merges"]))
    counted = per_doc.join(enc, "word").groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("n_tok")).alias("n_tokens"))
    # docs whose text pre-tokenizes to nothing still count, at zero
    return docs.select(F.col(id_col).alias("doc_id")).join(
        counted, "doc_id", "left").select(
        "doc_id", F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"))


# ---- DuckDB oracles: the training loop unrolled ----

def _train_ctes(n_merges: int, max_words: int | None,
                table: str = "documents", text_col: str = "text") -> str:
    """Chained CTEs computing the merge sequence: t{i} is the word
    state after merge i, b{i} the pair merge i chose (a 1-row-or-empty
    relation read via scalar subqueries, so an exhausted pair table
    yields NULL rows instead of wiping the chain)."""
    cap = f"ORDER BY freq DESC, word LIMIT {max_words}" \
        if max_words is not None else ""
    parts = [f"""
    wc AS MATERIALIZED (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(regexp_extract_all({text_col},
                      '{PRETOKEN_RE}')) AS word
        FROM {table}
      ) GROUP BY word {cap}
    ),
    t0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY word) AS wid, freq,
             '  ' || array_to_string(
                 list_append(regexp_extract_all(word, '.'), '{EOW}'),
                 '  ') || '  ' AS w
      FROM wc
    )"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""
    p{i} AS MATERIALIZED (
      SELECT a, b, sum(freq) AS c FROM (
        SELECT freq, sym AS a,
               lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS b
        FROM (
          SELECT wid, freq,
                 unnest(string_split(trim(w), '  ')) AS sym,
                 generate_subscripts(string_split(trim(w), '  '), 1) AS pos
          FROM t{i - 1}
        )
      ) WHERE b IS NOT NULL GROUP BY a, b
    ),
    b{i} AS MATERIALIZED (
      SELECT a, b FROM p{i} ORDER BY c DESC, a, b LIMIT 1
    ),
    t{i} AS MATERIALIZED (
      SELECT wid, freq,
             CASE WHEN (SELECT a FROM b{i}) IS NULL THEN w
                  ELSE replace(w,
                       ' ' || (SELECT a FROM b{i}) || '  '
                           || (SELECT b FROM b{i}) || ' ',
                       ' ' || (SELECT a FROM b{i})
                           || (SELECT b FROM b{i}) || ' ')
             END AS w
      FROM t{i - 1}
    )""")
    return ",".join(parts)


def bpe_merges_sql(n_merges: int, max_words: int | None = None) -> str:
    """DuckDB twin of train_bpe on the documents table: the unrolled
    loop's chosen pairs as (rank, left, right, merged)."""
    selects = " UNION ALL ".join(
        f"SELECT {i} AS rank, a AS lhs, b AS rhs, a || b AS merged "
        f"FROM b{i}" for i in range(1, n_merges + 1))
    return f"""
    WITH {_train_ctes(n_merges, max_words)}
    SELECT CAST(rank AS INT) AS rank, lhs, rhs, merged
    FROM ({selects}) ORDER BY rank
    """


def bpe_token_counts_sql(n_merges: int,
                         max_words: int | None = None) -> str:
    """DuckDB twin of train-then-encode: re-derives the merges with
    the unrolled loop, then applies them — in the same rank order,
    with the same doubled-delimiter replace — to every distinct word
    of the corpus (capped OR not: encoding covers words the training
    cap dropped, exactly like the Spark side)."""
    enc = ["""
    e0 AS MATERIALIZED (
      SELECT word,
             '  ' || array_to_string(
                 list_append(regexp_extract_all(word, '.'), '{eow}'),
                 '  ') || '  ' AS w
      FROM (SELECT DISTINCT word FROM doc_words)
    )""".replace("{eow}", EOW)]
    for i in range(1, n_merges + 1):
        enc.append(f"""
    e{i} AS MATERIALIZED (
      SELECT word,
             CASE WHEN (SELECT a FROM b{i}) IS NULL THEN w
                  ELSE replace(w,
                       ' ' || (SELECT a FROM b{i}) || '  '
                           || (SELECT b FROM b{i}) || ' ',
                       ' ' || (SELECT a FROM b{i})
                           || (SELECT b FROM b{i}) || ' ')
             END AS w
      FROM e{i - 1}
    )""")
    return f"""
    WITH doc_words AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_extract_all(text,
                     '{PRETOKEN_RE}')) AS word
      FROM documents
    ), {_train_ctes(n_merges, max_words)},{",".join(enc)},
    wtok AS (
      SELECT word, len(string_split(trim(w), '  ')) AS n_tok
      FROM e{n_merges}
    ),
    per AS (
      SELECT dw.doc_id, sum(wt.n_tok) AS n_tokens
      FROM doc_words dw JOIN wtok wt USING (word)
      GROUP BY dw.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN per p USING (doc_id)
    """


# ---- artifact lifecycle + token ids ----

def save_artifact(path: str, artifact: dict) -> None:
    """Persist a trained tokenizer (train once, encode in every later
    job — the vocabulary must be FROZEN across a training-data
    pipeline's runs or token ids silently shift between shards)."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        json.dump({"merges": [list(m) for m in artifact["merges"]],
                   "n_word_types": artifact["n_word_types"],
                   "dropped_mass": artifact["dropped_mass"]}, f)


def load_artifact(path: str) -> dict:
    import json

    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    d["merges"] = [tuple(m) for m in d["merges"]]
    return d


def vocab(artifact: dict) -> list[str]:
    """The deterministic id space: byte/char symbols CANNOT be
    enumerated up front (any unicode char may appear), so ids are
    assigned to the MERGED symbols only — rank order, id = rank - 1 —
    and unmerged base symbols map to negative ids derived from the
    symbol itself (stable across corpora; id collisions impossible
    because merged ids are >= 0). Returns the merged-symbol list in
    id order."""
    return [a + b for a, b in artifact["merges"]]


def encode_ids(docs: DataFrame, artifact: dict,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, token_ids array<bigint>, n_tokens) — the shape a
    sequence-packing / pretraining-batch pipeline consumes. Ids:
    merged symbols get their merge rank - 1 (>= 0); base symbols
    (single chars and </w>-closed chars that never merged) get
    -(xxhash64(symbol) magnitude), a stable negative id — a frozen
    artifact yields identical ids on any corpus, and real deployments
    remap the (tiny) observed id set to dense ids downstream.

    Plan shape: distinct words encode once (the codegen replace
    fold), the symbol split + id join happens per DISTINCT word, and
    docs re-join by word — token arrays re-assemble in word order via
    posexplode positions. The only corpus-sized shuffles are the
    word explode and the final doc-keyed collect."""
    merges = artifact["merges"]
    vdf = F.broadcast(docs.sparkSession.createDataFrame(
        [(s, i) for i, s in enumerate(vocab(artifact))],
        "sym string, vid bigint"))
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.expr(f"regexp_extract_all({text_col}, '{_SPARK_RE}', 0)")
        ).alias("wpos", "word"),
    )
    init = F.concat(
        F.lit("  "),
        F.array_join(
            F.concat(F.expr("regexp_extract_all(word, '.', 0)"),
                     F.array(F.lit(EOW))),
            "  "),
        F.lit("  "))
    folded = init if not merges else F.aggregate(
        F.array(*[F.struct(F.lit(f" {a}  {b} ").alias("p"),
                           F.lit(f" {a}{b} ").alias("r"))
                  for a, b in merges]),
        init, lambda acc, m: F.replace(acc, m["p"], m["r"]))
    enc = (per_doc.select("word").distinct()
           .withColumn("syms", F.split(F.trim(folded), "  "))
           .select("word", F.posexplode("syms").alias("spos", "sym"))
           .join(vdf, "sym", "left")
           .withColumn("tid", F.coalesce(
               "vid", -F.abs(F.xxhash64("sym"))))
           .groupBy("word")
           .agg(F.array_sort(F.collect_list(F.struct("spos", "tid")))
                .alias("sp")))
    assembled = (per_doc.join(enc, "word")
                 .select("doc_id", "wpos",
                         F.transform("sp", lambda x: x["tid"]).alias("wt"))
                 .groupBy("doc_id")
                 .agg(F.flatten(
                     F.array_sort(F.collect_list(F.struct("wpos", "wt")))
                      .getField("wt")).alias("token_ids")))
    # a doc whose text pre-tokenizes to nothing still gets a row
    # (empty id array), like bpe_token_counts
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(assembled, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("token_ids",
                               F.array().cast("array<bigint>"))
                    .alias("token_ids"))
            .withColumn("n_tokens", F.size("token_ids")))
