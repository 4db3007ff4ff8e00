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
