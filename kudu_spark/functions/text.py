"""Text-analysis functions for training-data pipelines: tokenization,
language ID, quality scoring, token counting, fingerprinting.

Every function exists twice — a Spark Column expression and a DuckDB
SQL fragment — generated from the same constants so the two engines
agree value-for-value (the correctness gate hashes outputs). Hashes
are md5-hex prefixes: fixed-width lowercase hex compares
lexicographically exactly like the underlying number, so MIN() over
them is a valid min-hash in both engines with no bigint parsing.

All expressions stay JVM-side on the Spark side (built-in functions,
no Python UDFs) — at 100 TB these run inside WholeStageCodegen with
no serialization boundary.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# n-gram size for shingles, number of minhash permutations, LSH bands
SHINGLE_N = 3
MINHASH_SEEDS = 8
LSH_BANDS = 4  # rows-per-band = MINHASH_SEEDS / LSH_BANDS = 2
SIMHASH_BITS = 60  # keep within a signed 64-bit value

# Universal-hash family for minhash permutations: mh_i = (a_i*h + b_i) mod P
# over h = first 32 bits of md5(shingle). One md5 per shingle, then
# multiply-add per permutation — 8-128 permutations cost ~nothing vs
# one md5 each. Constants derived from md5(seed) so both engines can
# inline them as literals. a < 2^29 (odd), h < 2^32, b < 2^32 →
# a*h + b < 2^62: no bigint overflow in either engine (DuckDB raises
# on overflow; Spark silently wraps — both stay exact here).
MINHASH_P = (1 << 61) - 1


def minhash_perms(seeds: int = MINHASH_SEEDS) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for s in range(seeds):
        a = int(hashlib.md5(f"a{s}".encode()).hexdigest()[:7], 16) * 2 + 1
        b = int(hashlib.md5(f"b{s}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "del"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "ein", "eine", "zu", "den", "von", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}
ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


# -- deterministic cross-engine rounding --------------------------------------

# Spark's round(double, n) ties via BigDecimal HALF_UP of the double's
# exact binary expansion; DuckDB's rounds the scaled double. On values
# that land within an ulp of a .xxxx5 boundary the two disagree by a
# full 1e-4 — one row in a few thousand for per-row rational ratios.
# floor(x*10^n + 0.5)/10^n is the same IEEE op sequence in both
# engines, so identical inputs give identical outputs (all our rounded
# ratios are non-negative).


def round4(c: Column) -> Column:
    return F.floor(c * 10000.0 + F.lit(0.5)) / 10000.0


def round4_sql(x: str) -> str:
    return f"floor(({x}) * 10000.0 + 0.5) / 10000.0"


# -- tokenization -------------------------------------------------------------

@lru_cache(maxsize=None)
def tokens_expr(col: str = "text") -> Column:
    # cached one-parse expr (r15, guide §4 driver overhead): identical
    # analyzed plan to F.split(F.lower(F.col(col)), " "), and F.expr
    # Columns are unresolved (no ExprIds) so reuse across plans is safe
    return F.expr(f"split(lower({col}), ' ')")


def tokens_sql(col: str = "text") -> str:
    return f"string_split(lower({col}), ' ')"


@lru_cache(maxsize=None)
def _shingles_attr_expr(name: str, n: int) -> Column:
    """shingles_from over a named column as ONE cached parse call
    (r15, guide §4 driver overhead): the Column-composed version costs
    ~25 py4j round trips (HOF lambda registration dominates) per query
    construction. Analyzed plan verified identical to the composed
    form modulo lambda-variable names."""
    k = f"(size({name}) - {n - 1})"
    elems = ", ".join(f"element_at({name}, i + {j})" for j in range(n))
    return F.expr(
        f"array_distinct(CASE WHEN {k} >= 1 THEN "
        f"transform(sequence(1, {k}), i -> concat_ws(' ', {elems})) "
        f"ELSE CAST(array() AS array<string>) END)"
    )


def shingles_from(t: Column | str, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles over an ALREADY-MATERIALIZED
    tokens column (guarding short docs: Spark's sequence(1, k)
    DESCENDS when k < 1, so it must be gated).

    Performance contract: ``t`` must be a bound attribute (e.g. via
    ``withColumn("__t", tokens_expr())``), not an inline expression —
    ``element_at(t, i)`` runs once per sequence index, and an inline
    ``split`` there re-tokenizes the document per index (quadratic;
    measured 10-17x slower at 100-token docs, worse at 100 TB doc
    sizes). Pass the attribute NAME (str) on hot paths to hit the
    cached one-parse expression."""
    if isinstance(t, str):
        return _shingles_attr_expr(t, n)
    k = F.size(t) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(k >= 1, grams).otherwise(F.array().cast("array<string>")))


def shingles_expr(col: str = "text", n: int = SHINGLE_N) -> Column:
    """Inline-tokenizing variant — only for one-shot/small uses; hot
    paths must materialize tokens and call shingles_from."""
    return shingles_from(tokens_expr(col), n)


def shingles_sql(col: str = "text", n: int = SHINGLE_N) -> str:
    t = tokens_sql(col)
    parts = " || ' ' || ".join(f"__t[i+{j}]" if j else "__t[i]" for j in range(n))
    return (
        f"(SELECT list_distinct(CASE WHEN len(__t) >= {n} THEN "
        f"[{parts} for i in range(1, len(__t) - {n - 2})] ELSE [] END) "
        f"FROM (SELECT {t} AS __t) __sh)"
    )


# -- token counting -----------------------------------------------------------

def token_count_cols() -> list[Column]:
    t = tokens_expr()
    return [
        F.size(t).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("bigint").alias("est_bpe_tokens"),
    ]


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split(lower(text), ' '))      AS n_tokens,
       length(text)                             AS n_chars_measured,
       CAST(ceil(length(text) / 4) AS BIGINT)   AS est_bpe_tokens
FROM documents
"""


# -- language ID (stopword-hit heuristic) ---------------------------------------

def langid_expr() -> Column:
    """argmax over per-language stopword hit counts; deterministic
    tiebreak by language order; 'und' when nothing matches."""
    t = tokens_expr()
    scores = {
        lang: F.size(F.filter(t, lambda x: x.isin(*ws)))
        for lang, ws in STOPWORDS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(STOPWORDS):  # later langs win ties only if strictly greater
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def langid_sql() -> str:
    score = {
        lang: (
            "len(list_filter(string_split(lower(text), ' '), x -> x IN ("
            + ", ".join(f"'{w}'" for w in ws)
            + ")))"
        )
        for lang, ws in STOPWORDS.items()
    }
    expr = "'und'"
    score_expr = "0"
    for lang in sorted(STOPWORDS):
        expr = f"CASE WHEN {score[lang]} > {score_expr} THEN '{lang}' ELSE {expr} END"
        score_expr = f"CASE WHEN {score[lang]} > {score_expr} THEN {score[lang]} ELSE {score_expr} END"
    return expr


# -- quality score ---------------------------------------------------------------

@lru_cache(maxsize=None)
def _quality_col_exprs() -> tuple:
    """quality_cols as three cached one-parse expressions (r15, guide
    §4 driver overhead): the Column-composed version cost ~100 py4j
    round trips per construction — the stopword isin() seq transfer
    plus the filter() HOF lambda dominate. Every float literal carries
    the D (double) suffix so the SQL literals match F.lit(float)'s
    DoubleType exactly, and the operator nesting reproduces Python's
    left-associative grouping — analyzed plan verified identical to
    the composed form, so the IEEE op sequence (and thus every bit of
    every ratio) is unchanged."""
    stops = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    t = "split(lower(text), ' ')"
    n = f"CAST(size({t}) AS DOUBLE)"
    chars = "CAST(length(text) AS DOUBLE)"
    avg_len = f"({chars} / {n})"
    stop_ratio = f"(CAST(size(filter({t}, x -> x IN ({stops}))) AS DOUBLE) / {n})"
    score = (
        f"(((least(1.0D, ({n} / 500.0D)) * 0.4D) + ({stop_ratio} * 0.4D)) + "
        f"((1.0D - least(1.0D, (abs(({avg_len} - 5.0D)) / 10.0D))) * 0.2D))"
    )

    def r4(x: str, alias: str) -> Column:
        return F.expr(f"(floor((({x}) * 10000.0D) + 0.5D) / 10000.0D) AS {alias}")

    return (
        r4(stop_ratio, "stopword_ratio"),
        r4(avg_len, "avg_token_len"),
        r4(score, "quality_score"),
    )


def quality_cols() -> list[Column]:
    """Rational-arithmetic-only quality score (no transcendentals, so
    Spark and DuckDB agree bit-for-bit before rounding)."""
    return list(_quality_col_exprs())


def quality_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    return f"""
    SELECT doc_id,
           {round4_sql('__stop / __n')} AS stopword_ratio,
           {round4_sql('__chars / __n')} AS avg_token_len,
           {round4_sql('least(1.0, __n / 500.0) * 0.4 + (__stop / __n) * 0.4'
                       ' + (1.0 - least(1.0, abs(__chars / __n - 5.0) / 10.0)) * 0.2')}
             AS quality_score
    FROM (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS __n,
             CAST(length(text) AS DOUBLE) AS __chars,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x IN ({stops}))) AS DOUBLE) AS __stop
      FROM documents
    )
    """


# -- fingerprint ------------------------------------------------------------------

@lru_cache(maxsize=None)
def _fingerprint_attr_expr(name: str) -> Column:
    """fingerprint_from over a named column as one cached parse call —
    same rationale and plan-equality argument as _shingles_attr_expr."""
    k = f"(size({name}) - {SHINGLE_N - 1})"
    elems = ", ".join(f"element_at({name}, i + {j})" for j in range(SHINGLE_N))
    sh = (
        f"array_distinct(CASE WHEN {k} >= 1 THEN "
        f"transform(sequence(1, {k}), i -> concat_ws(' ', {elems})) "
        f"ELSE CAST(array() AS array<string>) END)"
    )
    return F.expr(
        f"coalesce(array_min(transform({sh}, s -> substring(md5(s), 1, 16))), "
        f"substring(md5(text), 1, 16))"
    )


def fingerprint_from(t: Column | str) -> Column:
    """Winnowing-lite document fingerprint over a materialized tokens
    column: min md5-prefix over word n-gram shingles (empty-doc guard
    → md5 of whole text). Pass the attribute NAME (str) on hot paths
    to hit the cached one-parse expression."""
    if isinstance(t, str):
        return _fingerprint_attr_expr(t)
    sh = shingles_from(t)
    mins = F.array_min(F.transform(sh, lambda s: F.substring(F.md5(s), 1, 16)))
    return F.coalesce(mins, F.substring(F.md5(F.col("text")), 1, 16))


def fingerprint_expr() -> Column:
    return fingerprint_from(tokens_expr())


def fingerprint_sql() -> str:
    return (
        f"coalesce(list_min(list_transform({shingles_sql()}, "
        f"s -> substring(md5(s), 1, 16))), substring(md5(text), 1, 16))"
    )


# -- Gopher-style quality rules ----------------------------------------------------

# Thresholds follow the published Gopher (Rae et al. 2021, arXiv
# 2112.11446 §A.1.1) data-quality heuristics, adapted to the bounds
# that are computable from the driver's plain-text corpus. All
# rational arithmetic — both engines agree bit-for-bit pre-round.
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_WORD_RATIO = 0.6
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_cols(col: str = "text") -> list[Column]:
    """Gopher repetition-free quality signals + the accept/reject
    verdict, all as codegen array expressions (map-only at any scale).
    mean word length uses total chars of words / word count (split
    already consumed the separators)."""
    t = F.split(F.lower(F.col(col)), " ")
    n = F.size(t)
    word_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean_len = word_chars.cast("double") / n.cast("double")
    ellipsis = F.size(F.filter(t, lambda x: x.endswith("...")))
    alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    stops = F.size(F.filter(t, lambda x: x.isin(*ALL_STOPWORDS)))
    passed = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (ellipsis.cast("double") / n.cast("double") <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (alpha.cast("double") / n.cast("double") >= GOPHER_MIN_ALPHA_WORD_RATIO)
        & (stops >= GOPHER_MIN_STOPWORD_HITS)
    )
    return [
        n.cast("bigint").alias("n_words"),
        round4(mean_len).alias("mean_word_len"),
        round4(alpha.cast("double") / n.cast("double")).alias("alpha_word_ratio"),
        stops.cast("bigint").alias("stopword_hits"),
        passed.alias("gopher_pass"),
    ]


def gopher_sql(col: str = "text") -> str:
    stops = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    return f"""
    SELECT doc_id,
           CAST(__n AS BIGINT) AS n_words,
           {round4_sql('__wc / __n')} AS mean_word_len,
           {round4_sql('__alpha / __n')} AS alpha_word_ratio,
           CAST(__stops AS BIGINT) AS stopword_hits,
           (__n >= {GOPHER_MIN_WORDS} AND __n <= {GOPHER_MAX_WORDS}
            AND __wc / __n >= {GOPHER_MIN_MEAN_WORD_LEN}
            AND __wc / __n <= {GOPHER_MAX_MEAN_WORD_LEN}
            AND __ell / __n <= {GOPHER_MAX_ELLIPSIS_RATIO}
            AND __alpha / __n >= {GOPHER_MIN_ALPHA_WORD_RATIO}
            AND __stops >= {GOPHER_MIN_STOPWORD_HITS}) AS gopher_pass
    FROM (
      SELECT doc_id,
             CAST(len(__t) AS DOUBLE) AS __n,
             CAST(list_sum(list_transform(__t, x -> length(x))) AS DOUBLE) AS __wc,
             CAST(len(list_filter(__t, x -> x LIKE '%...')) AS DOUBLE) AS __ell,
             CAST(len(list_filter(__t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS __alpha,
             CAST(len(list_filter(__t, x -> x IN ({stops}))) AS DOUBLE) AS __stops
      FROM (SELECT doc_id, string_split(lower({col}), ' ') AS __t FROM documents)
    )
    """


# -- PII scrubbing ----------------------------------------------------------------

# Portable regex subset (Java regex AND RE2/DuckDB agree): applied in
# order email -> IPv4 -> phone, each over the previously masked text so
# digit runs inside an already-masked token are never re-matched.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def pii_scrub_cols(col: str = "text") -> list[Column]:
    """Counts per PII class + the masked text (codegen regexps — no
    UDF; scales as a map-only stage). The count uses the ORIGINAL
    text; the mask cascades so classes never double-match."""
    c = F.col(col)
    masked = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    masked = F.regexp_replace(masked, PII_IP_RE, "<IP>")
    masked = F.regexp_replace(masked, PII_PHONE_RE, "<PHONE>")
    return [
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_IP_RE), F.lit(0))).alias("n_ips"),
        F.substring(F.md5(masked), 1, 16).alias("masked_md5"),
    ]


def pii_scrub_sql(col: str = "text") -> str:
    """DuckDB equivalent ('g' flag: DuckDB replaces first match only by
    default, Spark replaces all)."""
    masked = (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PII_IP_RE}', '<IP>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g')"
    )
    return (
        f"len(regexp_extract_all({col}, '{PII_EMAIL_RE}')) AS n_emails, "
        f"len(regexp_extract_all({col}, '{PII_IP_RE}')) AS n_ips, "
        f"substring(md5({masked}), 1, 16) AS masked_md5"
    )


# -- URL normalization -------------------------------------------------------------

URL_HOST_RE = r"^https?://(?:www\.)?([^/?#]+)"


def url_host_expr(col: str = "url") -> Column:
    """Registrable host of a URL, lowercased, www-stripped — the key
    for host-level dedup/stats (a map-only expression; the groupBy on
    it is one shuffle keyed by host)."""
    return F.regexp_extract(F.lower(F.col(col)), URL_HOST_RE, 1)


def url_host_sql(col: str = "url") -> str:
    return f"regexp_extract(lower({col}), '{URL_HOST_RE}', 1)"
