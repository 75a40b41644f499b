"""Edge cases for corpus-level operators (the sf-corpus oracle
comparison runs via test_queries_oracle; these cover degenerate
inputs the synthetic corpus doesn't produce)."""

from __future__ import annotations

from kudu_spark.operators import corpus as CP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_repetition_single_word_doc(spark):
    docs = _docs(spark, [(1, "hello", "en"), (2, "a a a a b", "en")])
    got = {r["doc_id"]: r.asDict() for r in CP.repetition_stats(docs).collect()}
    # single word: no bigrams -> filled 0; one distinct of one token
    assert got[1]["top_2gram_ratio"] == 0.0
    assert got[1]["dup_word_ratio"] == 0.0
    assert got[1]["top_token_ratio"] == 1.0
    # 'a' 4/5 of tokens; 'a a' 3/4 of bigrams
    assert got[2]["top_token_ratio"] == 0.8
    assert got[2]["top_2gram_ratio"] == 0.75
    assert got[2]["dup_word_ratio"] == 0.6  # 2 distinct / 5 tokens


def test_decontaminate_drops_only_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta", "en")])
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma totally different tail", "en"),  # shares shingle
            (2, "entirely unrelated words here now", "en"),
            (3, "xx", "en"),  # too short for any shingle
        ],
    )
    kept = sorted(r["doc_id"] for r in CP.decontaminate(train, bench).collect())
    assert kept == [2, 3]


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, f"text number {i}", "en" if i % 2 else "de") for i in range(20)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, CP.stratified_sample(docs, "lang", 3).collect()))
    b = sorted(map(tuple, CP.stratified_sample(docs, "lang", 3).collect()))
    assert a == b  # deterministic
    per = {}
    for _, lang in a:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 3, "de": 3}


def test_domain_mix_small_domain_floor(spark):
    rows = [(i, f"doc {i} body", "big") for i in range(50)] + [
        (100, "rare domain doc", "tiny")
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = CP.domain_mix(docs, "source", total_target=10, alpha=0.5).collect()
    domains = {r["source"] for r in out}
    assert "tiny" in domains  # greatest(1, ...) floor keeps every domain represented


def test_vocabulary_rank_ties_deterministic(spark):
    docs = _docs(spark, [(1, "b a b a c", "en")])
    out = [(r["token"], r["freq"], r["rank"]) for r in
           CP.vocabulary_topk(docs, 3).orderBy("rank").collect()]
    assert out == [("a", 2, 1), ("b", 2, 2), ("c", 1, 3)]


def test_vocabulary_topk_plans_take_ordered(spark):
    """The global top-k must plan as TakeOrderedAndProject (per-
    partition k-row heaps, k-row driver merge) — NOT a row_number
    window with no partition key, which funnels every distinct token
    (billions at web scale) through one task. The residual rank window
    runs over the k survivors only."""
    docs = _docs(spark, [(i, f"tok{i} common word", "en") for i in range(50)])
    df = CP.vocabulary_topk(docs, 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # no single-partition exchange BEFORE the top-k cut: the only
    # SinglePartition may feed the k-row rank window, never the full
    # token count stream
    pre_topk = plan.split("TakeOrderedAndProject", 1)[1]
    assert "Exchange SinglePartition" not in pre_topk
