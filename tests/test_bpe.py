"""BPE tokenizer ops (operators/bpe.py): the incremental trainer vs a
from-scratch recount-per-iteration reference, the codegen replace-fold
encoder vs a pure-python symbol-list encoder (including the
consecutive-pair words the single-space sentinel misses), and the cap
accounting. The DuckDB train+encode oracles run in
test_queries_oracle via the registry."""

from __future__ import annotations

import random

import pytest

from kudu_spark.operators import bpe as BP


def _ref_train(word_freqs: dict, n_merges: int):
    """Brute-force trainer: recount every pair each iteration (no
    incremental index) — an independent implementation of the spec."""
    words = {tuple(w) + (BP.EOW,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


def _ref_encode(word: str, merges: list) -> int:
    """Symbol-list encoder applying merges in rank order."""
    syms = list(word) + [BP.EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def _ref_encode_lowest_rank(word: str, merges: list) -> int:
    """GPT-2-style encoder: repeatedly merge the lowest-rank pair
    PRESENT — the other standard formulation; rank-order application
    must equal it (a merge's operands come from strictly earlier
    merges)."""
    rank = {tuple(m): i for i, m in enumerate(merges)}
    syms = list(word) + [BP.EOW]
    while len(syms) > 1:
        pairs = [(rank.get((syms[i], syms[i + 1])), i)
                 for i in range(len(syms) - 1)]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        r, _ = min(pairs)
        a, b = merges[r]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_trainer_matches_bruteforce_randomized(spark):
    """Incremental trainer == recount-per-iteration reference on 25
    seeded random corpora (small alphabets force heavy pair ties and
    repeated-symbol runs)."""
    rng = random.Random(20260816)
    for trial in range(25):
        alpha = "ab" if trial % 3 == 0 else "abc"
        docs_rows = []
        word_freqs = {}
        did = 0
        for _ in range(rng.randint(2, 6)):
            words = [
                "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 12))
            ]
            for w in words:
                word_freqs[w] = word_freqs.get(w, 0) + 1
            did += 1
            docs_rows.append((did, " ".join(words)))
        docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
        n_merges = rng.randint(1, 10)
        art = BP.train_bpe(docs, n_merges=n_merges, max_words=None)
        want = _ref_train(word_freqs, n_merges)
        assert art["merges"] == want, (trial, docs_rows, art["merges"], want)
        assert art["dropped_mass"] == 0.0


def test_encode_fold_matches_reference_randomized(spark):
    """The doubled-delimiter replace fold == the symbol-list encoder
    on adversarial words: consecutive pair runs ('abab', 'aaaa' — the
    words a single-space sentinel representation undercounts),
    punctuation symbols, and random strings; and rank-order
    application == lowest-rank-first encoding."""
    from pyspark.sql import functions as F

    rng = random.Random(77)
    corpus_rows = [(1, "ab ab abab aaa the lower newest wide 42"),
                   (2, "abab aaaa baba bab the the lowest !!")]
    docs = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    art = BP.train_bpe(docs, n_merges=8, max_words=None)
    merges = art["merges"]

    words = ["abab", "aaaa", "aaa", "ab", "ba", "the", "lower", "!!",
             "42", "x"]
    words += ["".join(rng.choice("ab!")
                      for _ in range(rng.randint(1, 8)))
              for _ in range(40)]
    words = sorted(set(words))
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["n"] for r in wdf.select(
        "word", BP.encode_tokens_expr("word", merges).alias("n")).collect()}
    for w in words:
        assert got[w] == _ref_encode(w, merges), (w, got[w], merges)
        assert got[w] == _ref_encode_lowest_rank(w, merges), w

    # token counts roll up per doc with multiplicity
    tc = {r["doc_id"]: r["n_tokens"]
          for r in BP.bpe_token_counts(docs, art).collect()}
    want = {}
    for did, text in corpus_rows:
        toks = __import__("re").findall(BP.PRETOKEN_RE, text)
        want[did] = sum(_ref_encode(w, merges) for w in toks)
    assert tc == want
    # empty-after-pretokenization doc counts zero, not missing
    docs2 = docs.union(spark.createDataFrame([(3, "   ")],
                                             "doc_id bigint, text string"))
    tc2 = {r["doc_id"]: r["n_tokens"]
           for r in BP.bpe_token_counts(docs2, art).collect()}
    assert tc2[3] == 0


def test_cap_determinism_and_dropped_mass(spark):
    """max_words keeps the top types by (freq DESC, word ASC) and the
    artifact reports exactly the occurrence mass the cap dropped."""
    rows = [(1, "aa aa aa bb bb cc cc dd")]  # aa:3 bb:2 cc:2 dd:1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    wc = {r["word"]: r["freq"]
          for r in BP.word_counts(docs, max_words=2).collect()}
    assert wc == {"aa": 3, "bb": 2}  # cc loses the tie to bb by word
    art = BP.train_bpe(docs, n_merges=3, max_words=2)
    assert art["n_word_types"] == 2
    assert art["dropped_mass"] == pytest.approx(3 / 8)
    # capped training still encodes dropped words (cc, dd)
    tc = {r["doc_id"]: r["n_tokens"]
          for r in BP.bpe_token_counts(docs, art).collect()}
    want = sum(_ref_encode(w, art["merges"])
               for w in ["aa"] * 3 + ["bb"] * 2 + ["cc"] * 2 + ["dd"])
    assert tc == {1: want}


def test_pair_exhaustion_stops_both_sides(spark):
    """A corpus whose pairs run dry before n_merges emits exactly the
    satisfiable prefix (the SQL oracle's NULL-argmax rows mirror
    this; its equality runs in the registry harness)."""
    docs = spark.createDataFrame([(1, "a a a b")],
                                 "doc_id bigint, text string")
    art = BP.train_bpe(docs, n_merges=50, max_words=None)
    # types 'a' and 'b': a</w> -> 1 merge; b</w> -> 1 merge; done
    assert 0 < len(art["merges"]) < 50
    final_syms = {r["word"]: r["n"] for r in spark.createDataFrame(
        [("a",), ("b",)], "word string").select(
        "word", BP.encode_tokens_expr("word", art["merges"])
        .alias("n")).collect()}
    assert final_syms == {"a": 1, "b": 1}


def test_encode_ids_and_artifact_roundtrip(spark, tmp_path):
    """encode_ids: token-id arrays re-assemble in word order, merged
    symbols carry rank ids, unmerged base symbols carry stable
    negative hash ids; artifact save/load round-trips exactly."""
    from pyspark.sql import functions as F

    rows = [(1, "the lower the newest"), (2, "low the 42!"), (3, "  ")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    art = BP.train_bpe(docs, n_merges=10, max_words=None)

    p = str(tmp_path / "tok.json")
    BP.save_artifact(p, art)
    art2 = BP.load_artifact(p)
    assert art2 == art

    out = {r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
           for r in BP.encode_ids(docs, art2).collect()}
    v = {s: i for i, s in enumerate(BP.vocab(art))}

    def ref_ids(text):
        import re
        ids = []
        for w in re.findall(BP.PRETOKEN_RE, text):
            syms = list(w) + [BP.EOW]
            for a, b in art["merges"]:
                o, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        o.append(a + b)
                        i += 2
                    else:
                        o.append(syms[i])
                        i += 1
                syms = o
            ids += [v[s] if s in v else None for s in syms]
        return ids

    for did, text in rows:
        want = ref_ids(text)
        got, n = out[did]
        assert n == len(want) and len(got) == len(want), (did, got, want)
        for g, w in zip(got, want):
            if w is None:
                assert g < 0  # stable hash id for base symbols
            else:
                assert g == w, (did, got, want)
    assert out[3] == ([], 0)
    # token counts agree with the counting operator
    tc = {r["doc_id"]: r["n_tokens"]
          for r in BP.bpe_token_counts(docs, art).collect()}
    assert tc == {d: n for d, (_ids, n) in out.items()}
    # same base symbol -> same negative id across docs
    neg = {}
    for did, text in rows[:2]:
        import re
        words = re.findall(BP.PRETOKEN_RE, text)
        syms = []
        for w in words:
            s = list(w) + [BP.EOW]
            for a, b in art["merges"]:
                o, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        o.append(a + b); i += 2
                    else:
                        o.append(s[i]); i += 1
                s = o
            syms += s
        for sym, tid in zip(syms, out[did][0]):
            if sym in neg:
                assert neg[sym] == tid, sym
            neg[sym] = tid
