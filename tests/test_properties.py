"""Property-based tests (hypothesis) for the pure kernels — the
reference's doctest discipline extended to generative inputs."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.extract import extract_text_py
from kgforge.sqlrunner import check_statement, split_statements, strip_comments
from tests.oracle.reference_emitter import shingles


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_total_and_deterministic(raw):
    """Extraction never raises and is a pure function of the bytes."""
    a = extract_text_py(raw)
    b = extract_text_py(raw)
    assert a == b
    assert a is None or isinstance(a, str)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_no_tags_survive(txt):
    out = extract_text_py(f"<html><body><p>{txt}</p></body></html>".encode())
    assert out is not None
    assert not re.search(r"<[a-zA-Z/][^>]*>", out)


@given(
    st.lists(
        st.sampled_from(["select 1", "select * from t", "with x as (select 1) select 2"]),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_split_statements_roundtrip(stmts):
    """Joining legal statements with ';' splits back to the same list,
    and every piece passes the whitelist."""
    joined = " ; ".join(stmts)
    out = split_statements(joined)
    assert out == stmts
    for s in out:
        check_statement(s)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_strip_comments_total(sql):
    strip_comments(sql)  # never raises


FORBIDDEN = ["delete", "insert", "truncate", "drop", "update", "merge"]


@given(st.sampled_from(FORBIDDEN), st.text(alphabet="abcdefg ", max_size=40))
@settings(max_examples=100, deadline=None)
def test_forbidden_verbs_always_rejected(verb, tail):
    import pytest

    with pytest.raises(ValueError):
        check_statement(f"{verb} {tail}")


@given(st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_shingles_properties(words):
    """Shingle invariants: every shingle has <= k words, all drawn from
    the text; identical texts give identical shingle sets."""
    text = " ".join(words)
    sh = shingles(text)
    assert sh == shingles(text)
    for s in sh:
        assert len(s.split()) <= 3
        for w in s.split():
            assert w in words
