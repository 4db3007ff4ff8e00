"""X11/W1: team canonicalization + deterministic LA disambiguation
(DEFENSEVSPOSTION.PY:159-188 semantics, FIXTURES.md §2-3 shapes)."""

from __future__ import annotations

import pytest

from nba_data_pipeline_spark.operators.enrich import canonicalize_teams


@pytest.fixture(scope="module")
def aliases(spark):
    return spark.createDataFrame(
        [
            ("GOLDEN STATE", "WARRIORS"),
            ("GS", "WARRIORS"),
            ("NEW YORK", "KNICKS"),
            ("CHICAGO", "BULLS"),
        ],
        ["alias", "canonical"],
    )


def test_alias_and_mascot_strip(spark, aliases):
    df = spark.createDataFrame(
        [
            ("Chicago (14-15)", "PG", 1),
            ("G.S.", "PG", 2),
            ("New York Knicks", "PG", 3),  # mascot-strip retry resolves
            ("Unknownville", "PG", 4),     # passthrough
        ],
        ["team_raw", "position", "row_idx"],
    )
    out = {r.row_idx: r.team for r in canonicalize_teams(df, aliases).collect()}
    assert out[1] == "BULLS"
    assert out[2] == "WARRIORS"
    assert out[3] == "KNICKS"
    assert out[4] == "UNKNOWNVILLE"


def test_la_disambiguation_per_position(spark, aliases):
    df = spark.createDataFrame(
        [
            ("Los Angeles", "PG", 4),
            ("Los Angeles", "PG", 9),
            ("Los Angeles", "SG", 2),
            ("Los Angeles", "SG", 1),
        ],
        ["team_raw", "position", "row_idx"],
    )
    rows = canonicalize_teams(df, aliases).collect()
    got = {(r.position, r.row_idx): r.team for r in rows}
    # first-by-row_idx is LAKERS, second CLIPPERS — reset per position
    assert got[("PG", 4)] == "LAKERS"
    assert got[("PG", 9)] == "CLIPPERS"
    assert got[("SG", 1)] == "LAKERS"
    assert got[("SG", 2)] == "CLIPPERS"
