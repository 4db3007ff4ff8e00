"""Unit tests for the schema-normalization operators (SURVEY §2.2, §5.2) on
the reference's pathologies: Unnamed headers, duplicate names, header-repeat
rows, the ≥50%-parse coercion boundary."""

from __future__ import annotations

from nba_data_pipeline_spark.operators.normalize import (
    canonical_name,
    coerce_numeric,
    drop_header_repeats,
    flatten_header,
    normalize_columns,
    uniquify,
)


def test_flatten_header_drops_unnamed():
    assert flatten_header(("Unnamed: 0_level_0", "Player")) == "Player"
    assert flatten_header(("Per Game", "PTS")) == "Per Game_PTS"
    assert flatten_header(("Unnamed: 1", "")) == "col"


def test_canonical_name_longest_token_first():
    assert canonical_name("eFG%") == "eFG_pct"  # not FG_pct inside eFG%
    assert canonical_name("FG%") == "FG_pct"
    assert canonical_name("Opp 3PTM") == "Opp_3PM"
    assert canonical_name("Unnamed: 0_level_0 Player") == "Player"
    assert canonical_name("Win %") == "Win__pct"


def test_uniquify_suffixes():
    assert uniquify(["a", "b", "a", "a"]) == ["a", "b", "a_1", "a_2"]


def test_normalize_columns_and_header_repeats(spark):
    df = spark.createDataFrame(
        [("Player", "10"), ("Alice", "12"), ("Bob", "x")],
        ["Unnamed: 0_level_0 Player", "Per Game PTS"],
    )
    out = normalize_columns(df)
    assert out.columns == ["Player", "Per_Game_PTS"]
    kept = drop_header_repeats(out, "Player").collect()
    assert {r.Player for r in kept} == {"Alice", "Bob"}


def test_coerce_numeric_threshold(spark):
    # 2 of 4 parse (exactly 50%) -> cast kept; 1 of 4 -> kept as string
    df = spark.createDataFrame(
        [("1", "1"), ("2", "x"), ("a", "y"), ("b", "z")], ["half", "quarter"]
    )
    out = coerce_numeric(df)
    types = dict(out.dtypes)
    assert types["half"] == "double"
    assert types["quarter"] == "string"
    vals = [r.half for r in out.orderBy("quarter").collect()]
    assert vals == [1.0, 2.0, None, None] or set(vals) == {1.0, 2.0, None}
