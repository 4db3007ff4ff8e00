"""Python UDTFs (Spark 4 ``@udtf``): the reference's one-blob-in /
many-rows-out parsers as SQL-callable table functions.

``PropLineWalker`` is the stateful line-cursor parse of
nba_props_scraper.py:645-702 — walk a DOM-text blob line by line carrying
``current_player`` / ``current_prop_type`` cursors, emitting one typed row
per value line attached to the most recent cursor state. The cursor is
order-dependent INSIDE one blob only (SURVEY §7.3.1): each eval() call owns
a whole blob, so distributing blobs across executors preserves reference
semantics without any global ordering.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

NAME_RE = re.compile(r"^([A-Z][A-Za-z.'-]+ ){1,3}[A-Z][A-Za-z.'-]+$")
PROP_TYPES = frozenset(
    {"POINTS", "REBOUNDS", "ASSISTS", "THREES", "STEALS", "BLOCKS", "PRA"}
)
VALUE_RE = re.compile(r"^[OU]\s*(\d+\.?\d*)\s*([+-]\d{3,4})?$")


@udtf(returnType="line_idx int, player string, prop_type string, prop_line double, odds int")
class PropLineWalker:
    """One DOM-text blob → typed prop rows via the stateful line cursor."""

    def eval(self, blob: str):  # noqa: D102 - contract documented above
        current_player: str | None = None
        current_type: str | None = None
        for idx, raw in enumerate((blob or "").splitlines()):
            line = raw.strip()
            if not line:
                continue
            if NAME_RE.match(line):
                current_player = line
                continue
            if line.upper() in PROP_TYPES:
                current_type = line.upper()
                continue
            m = VALUE_RE.match(line)
            if m and current_player and current_type:
                yield (
                    idx,
                    current_player,
                    current_type,
                    float(m.group(1)),
                    int(m.group(2)) if m.group(2) else None,
                )


FAV_RE = re.compile(r"([A-Z]{3}) by (\d+\.?\d*)")
OU_RE = re.compile(r"o/u (\d+\.?\d*)")
POSITIONS = ("PG", "SG", "SF", "PF", "C")


@udtf(
    returnType=(
        "game string, game_time string, favorite string, spread double, "
        "over_under double, side string, team string, pos string, "
        "pos_idx int, player string"
    )
)
class LineupTableWalker:
    """UD3: one game-table text blob → game header + 2 teams × 5 position
    rows (lineup_scraper.py:31-114). The blob is the table's text
    serialization (cells joined by ``|``, the reference's
    ``get_text(separator="|")`` form):

    * header lines — matchup (has ``@``, no ``by``), tip-off time (has
      ``PM``/``AM``), betting line (``XXX by <spread>, o/u <total>``,
      parsed with the reference's exact regexes, :69-77);
    * the team row — starts with ``|``, th cells with the away marker
      ``@ `` stripped (:80-90);
    * five position rows — ``POS|<player A>|<player B>`` with whitespace
      collapsed per cell (:96-109), accepted only for PG/SG/SF/PF/C;
      trailing extra cells are tolerated and the first three used,
      matching ``if len(cols) < 3: continue`` (:99).

    Mirrors the reference's skip rules: no matchup, fewer than two teams,
    or zero accepted position rows → the whole game is dropped (:63, :91,
    :112-113). Emission order is row order, team A then team B — the
    insertion order of the reference's ``lineups`` dict."""

    def eval(self, blob: str):  # noqa: D102 - contract documented above
        matchup = ""
        game_time = ""
        betting = ""
        teams: list[str] = []
        lineup_rows: list[tuple[str, str, str]] = []
        for raw in (blob or "").splitlines():
            line = raw.strip()
            if not line:
                continue
            if line.startswith("|"):
                cells = [
                    c.strip().replace("@ ", "").replace("@", "")
                    for c in line.split("|")
                ]
                teams = [c for c in cells if c]
                continue
            cells = [c for c in line.split("|")]
            # the reference accepts rows with 3 OR MORE cells and uses the
            # first three (lineup_scraper.py:99 'if len(cols) < 3: continue')
            # — a trailing extra cell must not drop the row
            if len(cells) >= 3 and cells[0].strip() in POSITIONS:
                cells = cells[:3]
                lineup_rows.append(
                    (
                        cells[0].strip(),
                        " ".join(cells[1].split()),
                        " ".join(cells[2].split()),
                    )
                )
                continue
            if "@" in line and "by" not in line:
                matchup = line.replace("|", "").strip()
            elif "PM" in line or "AM" in line:
                game_time = line.replace("|", "").strip()
            elif "by" in line and "o/u" in line:
                betting = line.replace("|", "").strip()
        if not matchup or len(teams) < 2 or not lineup_rows:
            return
        fav = FAV_RE.search(betting)
        ou = OU_RE.search(betting)
        favorite = fav.group(1) if fav else "N/A"
        spread = float(fav.group(2)) if fav else 0.0
        over_under = float(ou.group(1)) if ou else 0.0
        team_a, team_b = teams[0], teams[1]
        for idx, (pos, player_a, player_b) in enumerate(lineup_rows):
            yield (
                matchup, game_time, favorite, spread, over_under,
                "away", team_a, pos, idx, player_a,
            )
            yield (
                matchup, game_time, favorite, spread, over_under,
                "home", team_b, pos, idx, player_b,
            )


def register_udtfs(spark) -> None:
    """Make the UDTFs SQL-callable: ``SELECT * FROM prop_line_walker(blob)``
    or laterally against a table of blobs."""
    spark.udtf.register("prop_line_walker", PropLineWalker)
    spark.udtf.register("lineup_table_walker", LineupTableWalker)
