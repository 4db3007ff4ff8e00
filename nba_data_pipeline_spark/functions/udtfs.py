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


def register_udtfs(spark) -> None:
    """Make the UDTFs SQL-callable: ``SELECT * FROM prop_line_walker(blob)``
    or laterally against a table of blobs."""
    spark.udtf.register("prop_line_walker", PropLineWalker)
