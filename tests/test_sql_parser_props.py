"""Property tests for the SQL statement parser primitives
(sql_dml string scanning): the quote/paren-aware splitter functions
must never be confused by keywords, separators or comment markers
inside string literals, for ANY input — the invariant every statement
router path relies on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kudu_spark.sql_dml import (
    _find_top_level_keyword,
    _skip_string,
    _split_top_level,
    extract_as_of,
    strip_comments,
)

# fragments that stress the scanner: quotes, escapes, separators,
# keywords, comment markers
FRAGMENTS = st.sampled_from([
    "a", ",", "(", ")", "'", '"', "\\", " WHERE ", " where ", "--x\n",
    "/*", "*/", "''", "x=1", ";", " VERSION AS OF 3", "O'Brien",
    "'lit, (with) where'", '"dq, lit"', "\n",
])
TEXTS = st.lists(FRAGMENTS, min_size=0, max_size=12).map("".join)


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_split_top_level_rejoins_lossless(s):
    # splitting on a separator and rejoining must reproduce the input
    assert ",".join(_split_top_level(s, ",")) == s
    assert ";".join(_split_top_level(s, ";")) == s


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_find_keyword_never_inside_string_or_parens(s):
    i = _find_top_level_keyword(s, "WHERE")
    if i < 0:
        return
    assert s[i:i + 5].upper() == "WHERE"
    # verify by independent scan: position i is at depth 0, not in a string
    depth = 0
    j = 0
    while j < i:
        ch = s[j]
        if ch in ("'", '"'):
            j = _skip_string(s, j)
            assert j <= i or j > i, "scan must not land mid-keyword"
            if j > i:
                raise AssertionError("keyword found inside a string literal")
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        j += 1
    assert depth == 0


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_skip_string_always_advances(s):
    for i, ch in enumerate(s):
        if ch in ("'", '"'):
            j = _skip_string(s, i)
            assert j > i
            assert j <= len(s)
            break


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_strip_comments_total_and_preserves_strings(s):
    out = strip_comments(s)  # must never raise
    assert isinstance(out, str)
    # a complete single-quoted literal with no comment markers inside
    # survives verbatim
    lit = "'keep -- /* this */'"
    out2 = strip_comments("SELECT " + lit)
    assert lit in out2


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_extract_as_of_total(s):
    # must either parse or raise the module's own error type — never
    # an unhandled exception, and cleaned text never grows
    from kudu_spark.errors import KuduSparkError

    try:
        clean, pins = extract_as_of(s)
    except KuduSparkError:
        return
    assert len(clean) <= len(s)
    for pin in pins.values():
        assert "version" in pin or "timestamp_ms" in pin
