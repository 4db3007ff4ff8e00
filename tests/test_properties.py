"""Property-based tests (hypothesis) for the schema-repair library —
SURVEY §7.3.2 requires the normalization pass to be total (never throw on
arbitrary scraped headers) and idempotent (re-running a repair changes
nothing). Pure-Python properties: no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nba_data_pipeline_spark.functions.extract import ODDS_PATTERN  # noqa: F401
from nba_data_pipeline_spark.operators.normalize import (
    canonical_name,
    flatten_header,
    uniquify,
)

header_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@given(header_text)
@settings(max_examples=300, deadline=None)
def test_canonical_name_total_and_clean(name):
    out = canonical_name(name)
    assert isinstance(out, str) and out  # total: never raises, never empty
    assert "%" not in out  # '%' always rewritten
    assert not any(ch.isspace() for ch in out)  # whitespace collapsed to sep


@given(header_text)
@settings(max_examples=300, deadline=None)
def test_canonical_name_idempotent(name):
    once = canonical_name(name)
    assert canonical_name(once) == once


@given(st.lists(header_text, max_size=20))
@settings(max_examples=200, deadline=None)
def test_uniquify_unique_and_stable(names):
    out = uniquify(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out)  # all distinct
    # first occurrence of each name is preserved verbatim
    seen = set()
    for src, dst in zip(names, out):
        if src not in seen:
            assert dst == src
            seen.add(src)


@given(st.lists(header_text, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_flatten_header_total(parts):
    out = flatten_header(parts)
    assert isinstance(out, str) and out
