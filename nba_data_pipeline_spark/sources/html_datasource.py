"""Custom Python data source (Spark 4 DataSource API): read a directory of
landed HTML pages as a table of parsed <table> rows —
``spark.read.format("htmltable").load(dir)``.

This gives SRC1-SRC3 a first-class reader instead of a driver-side seam:
partition planning happens on the driver (one input partition per file, so
a 100k-page corpus fans out across executors), while parsing runs
executor-side per partition. Comment-embedded tables (SRC2) are included
by the shared parser. Ingestion (fetching) stays outside the engine
(SURVEY §7.4); input is landed .html files.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = (
    "path string, table_idx int, row_idx int, headers string, cells string, "
    "table_id string"
)


class _HtmlFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class HtmlTableReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._root = options.get("path")
        if not self._root:
            raise ValueError("htmltable source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isfile(self._root):
            return [_HtmlFilePartition(self._root)]
        files = sorted(
            os.path.join(self._root, f)
            for f in os.listdir(self._root)
            if f.endswith((".html", ".htm"))
        )
        return [_HtmlFilePartition(f) for f in files]

    def read(self, partition: _HtmlFilePartition) -> Iterator[tuple]:
        # Import inside read(): this body executes on executors, where the
        # engine package is importable but driver-scope globals are not.
        from nba_data_pipeline_spark.sources.html_table import (
            parse_html_tables_with_attrs,
        )

        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            html = fh.read()
        for t_idx, (attrs, headers, rows) in enumerate(
            parse_html_tables_with_attrs(html)
        ):
            hdr = json.dumps(headers)
            # table_id carries the tag's id attribute (None when absent) so
            # SRC3 find-table-by-id (get_basketball_stats_all_teams_
            # Version6.py:193-198) is a relational filter on the scan.
            tid = attrs.get("id") or None
            for r_idx, row in enumerate(rows):
                yield (partition.path, t_idx, r_idx, hdr, json.dumps(row), tid)


class HtmlTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "htmltable"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> HtmlTableReader:
        return HtmlTableReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HtmlTableDataSource)
