"""CLI entry points (cli.py) + reference-layout sink writers (sinks_ref.py):
the migration on-ramp mirroring the reference's argparse surfaces
(unified_nba_scraper.py:356-416, nba_props_scraper.py:877-945,
Cleaning_Glass_Multi.py:716-739) and its literal output trees
(Cleaning_Glass_#1.py:461-495, nba_props_scraper.py:824-872)."""

from __future__ import annotations

import json
import os

import pytest

from nba_data_pipeline_spark.cli import (
    TEAM_PAGES,
    TEAMS,
    main,
    parse_teams,
    resolve_team_list,
)
from nba_data_pipeline_spark.sinks_ref import sanitize_component


# ---------------------------------------------------------------------------
# F6 team-list parse/validate + mode resolution
# ---------------------------------------------------------------------------


def test_parse_teams_all_and_dedupe_and_invalid():
    valid, invalid = parse_teams("ALL")
    assert valid == list(TEAMS) and len(valid) == 30 and invalid == []
    valid, invalid = parse_teams(" det, BKN ,det , xxx,, NOP ")
    assert valid == ["DET", "BKN", "NOP"]
    assert invalid == ["XXX"]


def test_resolve_team_list_modes():
    assert resolve_team_list("all", None, None) == list(TEAMS)
    # retry validates and warn-skips; falls back to the reference default set
    assert resolve_team_list("retry", None, "DET,zzz,BKN") == ["DET", "BKN"]
    assert resolve_team_list("retry", None, None) == [
        "BKN", "CHA", "DEN", "DET", "PHX",
    ]
    # single: --team wins; non-interactive default is DET (the reference's)
    assert resolve_team_list("single", "lal", None) == ["LAL"]
    assert resolve_team_list("single", None, None) == ["DET"]
    # interactive prompt path, injected input
    assert resolve_team_list(
        "single", None, None, interactive=True, input_fn=lambda _: "BOS,MIA"
    ) == ["BOS", "MIA"]
    assert resolve_team_list(
        "single", None, None, interactive=True, input_fn=lambda _: ""
    ) == ["DET"]


def test_resolve_team_list_rejects_unknown_single():
    with pytest.raises(SystemExit):
        resolve_team_list("single", "ZZZ", None)


# ---------------------------------------------------------------------------
# X13 python twin stays in lockstep with the Column fn
# ---------------------------------------------------------------------------


def test_sanitize_component_matches_column_fn(spark):
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.functions.extract import sanitize_filename

    samples = [
        "Pistons at Nets",
        'a<b>c:d"e/f\\g|h?i*j',
        "__lead__and__trail__",
        "x" * 200,
        "plain",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [
        r["c"]
        for r in df.select(sanitize_filename(F.col("s")).alias("c")).collect()
    ]
    assert got == [sanitize_component(s) for s in samples]


# ---------------------------------------------------------------------------
# end-to-end golden runs (in-process main(); the shared session is reused)
# ---------------------------------------------------------------------------


def _relpaths(root: str) -> set[str]:
    out = set()
    for r, _d, files in os.walk(root):
        for f in files:
            out.add(os.path.relpath(os.path.join(r, f), root))
    return out


def test_scrape_teams_golden_tree(spark, tmp_path):
    out = str(tmp_path / "teams")
    rc = main(
        [
            "scrape-teams", "--mode", "retry", "--teams", "DET,BKN",
            "--season", "2026", "--date", "2026-02-01", "--output", out,
        ]
    )
    assert rc == 0
    expect = {
        os.path.join(t, "CLEANINGdaGLASS", f"{stem}_2026-02-01.json")
        for t in ("DET", "BKN")
        for stem in ("LINEUPS", "ONOFF", "PLAYERS")
    }
    assert _relpaths(out) == expect  # staging removed, nothing extra
    doc = json.load(
        open(os.path.join(out, "DET", "CLEANINGdaGLASS", "PLAYERS_2026-02-01.json"))
    )
    assert [r["row_idx"] for r in doc["rows"]] == list(range(8))
    assert doc["rows"][0]["Player"] == "DET Player 1"
    assert set(doc["rows"][0]) == {"row_idx", "Player", "PTS", "REB", "AST"}

    # rerun replaces in place (the reference's 🔄 Replaced path)
    rc = main(
        [
            "scrape-teams", "--mode", "retry", "--teams", "DET,BKN",
            "--season", "2026", "--date", "2026-02-01", "--output", out,
        ]
    )
    assert rc == 0 and _relpaths(out) == expect


def test_props_golden_tree(spark, tmp_path):
    out = str(tmp_path / "props")
    rc = main(
        [
            "props", "--date", "2026-02-01", "--prop-type", "both",
            "--output", out, "--run-ts", "20260201_120000",
        ]
    )
    assert rc == 0
    rels = _relpaths(out)
    # 30 deterministic matchups × {player, game}
    assert len(rels) == 60
    sample = os.path.join("2026-02-01_BKN at DET", "player_20260201_120000.json")
    assert sample in rels
    doc = json.load(open(os.path.join(out, sample)))
    assert doc["type"] == "player" and doc["match"] == "BKN at DET"
    assert doc["metadata"]["date"] == "2026-02-01"
    assert doc["metadata"]["source"] == "Hard Rock Bet"
    r0 = doc["rows"][0]
    assert r0["sportsbook"] == "fanduel" and r0["prop_line"] == 1.5
    game = json.load(
        open(os.path.join(out, "2026-02-01_BKN at DET", "game_20260201_120000.json"))
    )
    g0 = game["rows"][0]
    assert g0["spread_team"] == "BKN" and g0["total"] == 201.5


def test_props_player_only_writes_half_the_tree(spark, tmp_path):
    out = str(tmp_path / "props_p")
    rc = main(
        [
            "props", "--date", "2026-02-01", "--prop-type", "player",
            "--output", out, "--run-ts", "20260201_120000",
        ]
    )
    assert rc == 0
    rels = _relpaths(out)
    assert len(rels) == 30
    assert all(os.path.basename(p).startswith("player_") for p in rels)


def test_pages_constant_matches_reference_page_map():
    from nba_data_pipeline_spark.sinks_ref import PAGE_FILENAME

    assert set(TEAM_PAGES) == set(PAGE_FILENAME)
