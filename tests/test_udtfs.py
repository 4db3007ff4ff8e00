"""UDTF tests: the stateful line-cursor prop parse (SURVEY §7.3.1 — the
order-dependent semantic that must survive distribution)."""

from __future__ import annotations

from nba_data_pipeline_spark.functions.udtfs import register_udtfs

BLOB = """LeBron James
POINTS
O 25.5 -110
U 25.5 +105
REBOUNDS
O 7.5
Luka Doncic
POINTS
O 30.5 -115
not a value line
ASSISTS
U 8.5 -120
"""


def test_line_cursor_attaches_to_latest_player_and_type(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM prop_line_walker(?)", args=[BLOB]
    ).collect()
    got = [(r.player, r.prop_type, r.prop_line, r.odds) for r in rows]
    assert got == [
        ("LeBron James", "POINTS", 25.5, -110),
        ("LeBron James", "POINTS", 25.5, 105),
        ("LeBron James", "REBOUNDS", 7.5, None),
        ("Luka Doncic", "POINTS", 30.5, -115),
        ("Luka Doncic", "ASSISTS", 8.5, -120),
    ]
    # line_idx preserves source order within the blob
    assert [r.line_idx for r in rows] == sorted(r.line_idx for r in rows)


def test_lateral_udtf_over_blob_table(spark):
    """Each blob is one eval() call, so per-blob cursor state is preserved
    however blobs are partitioned."""
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "Solo Star\nPOINTS\nO 11.5 -105"), (2, "No Props Here\njunk")],
        "blob_id int, blob string",
    )
    df.createOrReplaceTempView("blobs")
    out = spark.sql(
        "SELECT b.blob_id, p.player, p.prop_line "
        "FROM blobs b, LATERAL prop_line_walker(b.blob) p"
    ).collect()
    assert [(r.blob_id, r.player, r.prop_line) for r in out] == [
        (1, "Solo Star", 11.5)
    ]


# The reference's own game-table shape (lineup_scraper.py:31-114): header
# with matchup/time/betting, a |-led team row with the away marker, and
# position rows whose player cells carry status-indicator whitespace.
LINEUP_BLOB = """CLE @ NYK
7:30 PM ET
NYK by 3.5, o/u 224.5
| CLE | @ NYK
PG|Darius  Garland|Jalen Brunson
SG|Donovan Mitchell|Mikal  Bridges
SF|Max Strus|OG Anunoby
PF|Evan Mobley|Karl-Anthony Towns
C|Jarrett Allen|Mitchell Robinson
"""


def test_lineup_walker_reference_table_shape(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM lineup_table_walker(?) ORDER BY pos_idx, side",
        args=[LINEUP_BLOB],
    ).collect()
    assert len(rows) == 10  # 2 teams x 5 positions
    head = rows[0]
    assert head.game == "CLE @ NYK"
    assert head.game_time == "7:30 PM ET"
    # betting regexes (lineup_scraper.py:69-77)
    assert head.favorite == "NYK" and head.spread == 3.5
    assert head.over_under == 224.5
    # team row cleanup strips the away marker (:85)
    assert {r.team for r in rows} == {"CLE", "NYK"}
    assert [r.side for r in rows][:2] == ["away", "home"]
    # whitespace collapse on player cells (:104-106)
    players = {r.player for r in rows}
    assert "Darius Garland" in players and "Mikal Bridges" in players
    assert not any("  " in r.player for r in rows)
    # position gating (:108): all five, in row order
    assert [r.pos for r in rows if r.side == "away"] == [
        "PG", "SG", "SF", "PF", "C"
    ]


def test_lineup_walker_skip_rules(spark):
    """No matchup, <2 teams, or no accepted position rows -> game dropped
    (lineup_scraper.py:63, :91, :112-113)."""
    register_udtfs(spark)
    cases = [
        # no '@' matchup line at all
        "7:30 PM ET\n| CLE | NYK\nPG|A B|C D",
        # team row with a single team
        "CLE @ NYK\n| CLE\nPG|A B|C D",
        # position token not in PG/SG/SF/PF/C
        "CLE @ NYK\n| CLE | @ NYK\nG|A B|C D",
    ]
    for blob in cases:
        out = spark.sql(
            "SELECT * FROM lineup_table_walker(?)", args=[blob]
        ).collect()
        assert out == [], blob


def test_lineup_walker_tolerates_trailing_extra_cells(spark):
    """The reference accepts position rows with >=3 cells and uses the
    first three (lineup_scraper.py:99 'if len(cols) < 3: continue') — a
    game table carrying a trailing extra cell per row must still parse."""
    register_udtfs(spark)
    blob = (
        "CLE @ NYK\n7:30 PM ET\n| CLE | @ NYK\n"
        "PG|Darius Garland|Jalen Brunson|GTD\n"
        "SG|Donovan Mitchell|Mikal Bridges|\n"
    )
    rows = spark.sql(
        "SELECT * FROM lineup_table_walker(?) ORDER BY pos_idx, side",
        args=[blob],
    ).collect()
    assert len(rows) == 4  # 2 teams x 2 accepted position rows
    assert [r.player for r in rows] == [
        "Darius Garland", "Jalen Brunson",
        "Donovan Mitchell", "Mikal Bridges",
    ]


def test_lineup_walker_missing_betting_defaults(spark):
    """Absent/garbled betting line -> the reference's N/A + 0.0 defaults
    (lineup_scraper.py:72-77)."""
    register_udtfs(spark)
    blob = "CLE @ NYK\n7:30 PM ET\n| CLE | @ NYK\nPG|A B|C D"
    rows = spark.sql(
        "SELECT * FROM lineup_table_walker(?)", args=[blob]
    ).collect()
    assert rows and rows[0].favorite == "N/A"
    assert rows[0].spread == 0.0 and rows[0].over_under == 0.0
