"""Property-based tests (hypothesis) — robustness the reference lacks
(SURVEY §5: no fuzzing in the data path).

Driver-less: these exercise pure-Python components (tokengen math, OTTL
lexer/parser, pattern translation) so they run in milliseconds.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from opentelemetry_collector_contrib_spark.sources.tokengen import (
    MAX_TOK,
    MIN_TOK,
    VOCAB,
    columns_for_ids,
)
from opentelemetry_collector_contrib_spark.ottl.parser import (
    Statement,
    parse_statement,
    tokenize,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=50))
@settings(max_examples=200, deadline=None)
def test_tokengen_total_function(ids):
    cols = columns_for_ids(np.array(ids, dtype=np.uint64))
    assert len(cols["doc_id"]) == len(ids)
    for i in range(len(ids)):
        n = int(cols["n_tok"][i])
        assert MIN_TOK <= n <= MAX_TOK
        toks = cols["tokens"][i]
        assert len(toks) == n
        assert toks.min() >= 0 and toks.max() < VOCAB
        assert cols["source"][i].startswith("src-")


@given(st.integers(min_value=0, max_value=2**40))
@settings(max_examples=100, deadline=None)
def test_tokengen_pure(i):
    a = columns_for_ids(np.array([i], dtype=np.uint64))
    b = columns_for_ids(np.array([i, i + 1], dtype=np.uint64))
    assert list(a["tokens"][0]) == list(b["tokens"][0])
    assert a["source"][0] == b["source"][0]


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_ottl_lexer_never_crashes_unexpectedly(s):
    """Lexer/parser may reject input (SyntaxError) but must never raise
    anything else."""
    try:
        tokenize(s)
    except SyntaxError:
        pass


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_ottl_parser_rejects_garbage_cleanly(s):
    try:
        parse_statement(s)
    except (SyntaxError, ValueError):
        pass


@given(
    key=st.from_regex(r"[a-z][a-z0-9_]{0,9}", fullmatch=True),
    val=st.from_regex(r"[a-zA-Z0-9 _.-]{0,20}", fullmatch=True),
    sev=st.integers(min_value=0, max_value=24),
)
@settings(max_examples=150, deadline=None)
def test_ottl_statement_roundtrip_structure(key, val, sev):
    stmt = parse_statement(
        f'set(attributes["{key}"], "{val}") where severity_number == {sev}'
    )
    assert isinstance(stmt, Statement)
    assert stmt.editor.name == "set"
    assert stmt.condition is not None
