"""Defense-vs-Position (DvP) matrix composition — the reference's strictest
pipeline (DEFENSEVSPOSTION.PY) as engine-native pieces the ``dvp`` CLI and
the ``snk14_dvp_matrix_tree`` catalog entry share:

* the 5 positions × 4 timeframes matrix dimensions (:64-66) and the
  required table headers (:71);
* the canonical team list and the public alias → canonical map (:76-116),
  served as a broadcast dim for :func:`operators.enrich.canonicalize_teams`
  (X11 + the W1 ordinal LA rule);
* :func:`dvp_matrix_walk` — the per-cell scrape loop with bounded retry +
  linear backoff + reload (:633-661, ≤4 attempts at the call site :683),
  all-or-nothing per cell;
* :func:`validate_dvp_rows` — the 30-team / no-unrecognized-names gate
  (:524-541, "never trust partial data" :41-43).

The heavy stages (scan, canonicalize, gate aggregates) stay distributed;
only the walk itself is sequential per cell, exactly like the reference's
single browser tab.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from nba_data_pipeline_spark.adapters.browser_ingest import (
    BrowserSession,
    TableNotReady,
    wait_for_table_ready,
)
from nba_data_pipeline_spark.operators.gates import (
    CompletenessError,
    check_cell_presence,
    check_group_completeness,
)

#: DEFENSEVSPOSTION.PY:64-66
DVP_POSITIONS = ("PG", "SG", "SF", "PF", "C")
DVP_TIMEFRAMES = ("2025-26", "Last 7", "Last 15", "Last 30")
#: :71 — the header labels the readiness wait requires, case-insensitive
DVP_REQUIRED_HEADERS = ("Team", "PTS", "REB", "AST", "3PM", "STL", "BLK", "TO")

#: Canonical city/brand folder names (:76-82). Order is the engine's
#: team-index ring with LA Lakers BEFORE LA Clippers — the reference's
#: ordinal rule assigns the FIRST 'Los Angeles' row to the Lakers
#: (:177-184), so keeping that order makes index -> canonical a straight
#: lookup for fixtures and oracles.
DVP_CANONICAL_TEAMS = (
    "Atlanta", "Boston", "Brooklyn", "Charlotte", "Chicago", "Cleveland",
    "Dallas", "Denver", "Detroit", "Golden State", "Houston", "Indiana",
    "LA Lakers", "LA Clippers", "Memphis", "Miami", "Milwaukee",
    "Minnesota", "New Orleans", "New York", "Oklahoma City", "Orlando",
    "Philadelphia", "Phoenix", "Portland", "Sacramento", "San Antonio",
    "Toronto", "Utah", "Washington",
)

#: 3-letter abbreviations aligned with :data:`DVP_CANONICAL_TEAMS`.
DVP_ABBREVS = (
    "ATL", "BOS", "BKN", "CHA", "CHI", "CLE", "DAL", "DEN", "DET", "GSW",
    "HOU", "IND", "LAL", "LAC", "MEM", "MIA", "MIL", "MIN", "NOP", "NYK",
    "OKC", "ORL", "PHI", "PHX", "POR", "SAC", "SAS", "TOR", "UTA", "WAS",
)

#: Full franchise names (upper), aligned — the mascot-bearing alias forms.
DVP_FULL_NAMES = (
    "ATLANTA HAWKS", "BOSTON CELTICS", "BROOKLYN NETS", "CHARLOTTE HORNETS",
    "CHICAGO BULLS", "CLEVELAND CAVALIERS", "DALLAS MAVERICKS",
    "DENVER NUGGETS", "DETROIT PISTONS", "GOLDEN STATE WARRIORS",
    "HOUSTON ROCKETS", "INDIANA PACERS", "LOS ANGELES LAKERS",
    "LOS ANGELES CLIPPERS", "MEMPHIS GRIZZLIES", "MIAMI HEAT",
    "MILWAUKEE BUCKS", "MINNESOTA TIMBERWOLVES", "NEW ORLEANS PELICANS",
    "NEW YORK KNICKS", "OKLAHOMA CITY THUNDER", "ORLANDO MAGIC",
    "PHILADELPHIA 76ERS", "PHOENIX SUNS", "PORTLAND TRAIL BLAZERS",
    "SACRAMENTO KINGS", "SAN ANTONIO SPURS", "TORONTO RAPTORS",
    "UTAH JAZZ", "WASHINGTON WIZARDS",
)

#: The reference's oddball alias forms that don't derive from the three
#: aligned rings above (:83-116).
_EXTRA_ALIASES = {
    "NY": "New York", "GS": "Golden State", "NO": "New Orleans",
    "NOLA": "New Orleans", "PHILA": "Philadelphia",
    "SIXERS": "Philadelphia", "SA SPURS": "San Antonio",
    "LAKERS": "LA Lakers", "CLIPPERS": "LA Clippers",
    "LA LAKERS": "LA Lakers", "LA CLIPPERS": "LA Clippers",
}


def dvp_alias_pairs() -> list[tuple[str, str]]:
    """(alias, canonical) rows for the broadcast dim: city form, 3-letter
    abbreviation, full franchise name, plus the reference's extras."""
    pairs: dict[str, str] = {}
    for i, canon in enumerate(DVP_CANONICAL_TEAMS):
        pairs[canon.upper()] = canon
        pairs[DVP_ABBREVS[i]] = canon
        pairs[DVP_FULL_NAMES[i]] = canon
    pairs.update(_EXTRA_ALIASES)
    return sorted(pairs.items())


def dvp_alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(dvp_alias_pairs(), "alias string, canonical string")


def dvp_matrix_walk(
    session: BrowserSession,
    base_url: str,
    *,
    positions: Sequence[str] = DVP_POSITIONS,
    timeframes: Sequence[str] = DVP_TIMEFRAMES,
    max_retries: int = 4,
    timeout_s: float = 15.0,
    poll_s: float = 0.2,
    stable_s: float = 0.6,
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[tuple[str, str, str]]:
    """Walk every (position, timeframe) cell, yielding
    ``(position, timeframe, rendered_html)``.

    Per cell, the reference's loop (DEFENSEVSPOSTION.PY:633-661): select
    the cell (here: navigate to the cell's fragment — the scripted double
    and a real driver both re-render the table), wait for a ready table
    with the required headers; on failure back off ``0.6s × attempt``,
    reload, and retry, at most ``max_retries`` attempts (the call site
    passes 4, :683). A cell that never readies raises RuntimeError with
    the last error — all-or-nothing, never partial data."""
    for pos in positions:
        for tf in timeframes:
            cell_url = f"{base_url}#{pos}-{tf.replace(' ', '_')}"
            last_err = ""
            for attempt in range(1, max_retries + 1):
                session.get(cell_url)
                session.click(f"#select-{pos}")
                session.click(f"#select-{tf.replace(' ', '_')}")
                try:
                    wait_for_table_ready(
                        session,
                        DVP_REQUIRED_HEADERS,
                        timeout_s=timeout_s,
                        poll_s=poll_s,
                        stable_s=stable_s,
                        clock=clock,
                        sleep=sleep,
                    )
                    yield pos, tf, session.page_source()
                    break
                except TableNotReady as e:
                    last_err = str(e)
                    # :652-655 — backoff grows with the attempt, then reload
                    sleep(0.6 * attempt)
            else:
                raise RuntimeError(
                    f"Failed to scrape {pos} - {tf} after {max_retries} "
                    f"attempts. Last error: {last_err}"
                )


def validate_dvp_rows(
    df: DataFrame,
    *,
    position_col: str = "position",
    timeframe_col: str = "timeframe",
    team_col: str = "team",
    positions: Sequence[str] = DVP_POSITIONS,
    timeframes: Sequence[str] = DVP_TIMEFRAMES,
) -> None:
    """The all-or-nothing gate (:524-541 + :575-598): every (position,
    timeframe) cell holds exactly 30 distinct canonical teams, every team
    name resolved to a canonical one, and all cells are present. Raises
    :class:`CompletenessError`; the caller writes nothing on failure."""
    from pyspark.sql import functions as F

    g = check_group_completeness(
        df, [position_col, timeframe_col], team_col, len(DVP_CANONICAL_TEAMS)
    )
    if not g.ok:
        raise CompletenessError(
            f"expected {len(DVP_CANONICAL_TEAMS)} teams per cell: "
            f"{g.failures[:5]}"
        )
    cells = [(p, t) for p in positions for t in timeframes]
    c = check_cell_presence(df, [position_col, timeframe_col], cells)
    if not c.ok:
        raise CompletenessError(f"missing cells: {c.failures[:5]}")
    bad = (
        df.select(team_col)
        .distinct()
        .filter(~F.col(team_col).isin(list(DVP_CANONICAL_TEAMS)))
        .collect()
    )
    if bad:
        raise CompletenessError(
            "unrecognized team names (update aliases?): "
            f"{sorted(r[0] for r in bad)[:10]}"
        )
