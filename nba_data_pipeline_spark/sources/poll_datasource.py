"""Custom Python STREAMING data source (Spark 4 DataSource API,
``SimpleDataSourceStreamReader``): poll a landing directory for new
JSON-lines files and emit their records as micro-batches —
``spark.readStream.format("polldir").option("path", dir).load()``.

This is the reference's polling ingestion loop (run_scraper.py sleep-poll,
SURVEY §2 SRC8/S1) promoted to a FIRST-CLASS source: offsets are the set
of files already consumed, so restart/replay semantics come from the
engine's checkpoint instead of hand-rolled seen-lists; the batch-half
sibling is ``html_datasource`` (same API, batch reader).

Scale note: the simple reader hands records to Spark from the driver —
right for control-plane-sized polling feeds (scoreboards, odds pages). A
fact-sized stream should land files and use the file source (streaming
plans S1); the DataSource API's partitioned ``streamReader`` is the
upgrade path if the polled feed itself ever becomes fact-sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

POLL_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class PollDirStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"files": [consumed file names]}. Each ``read`` consumes
    every not-yet-seen ``*.jsonl`` file in name order; ``readBetweenOffsets``
    replays a committed range deterministically from the same files (the
    exactly-once replay contract — file contents are immutable once
    landed).

    Landing contract: writers must LAND-THEN-RENAME — write to a temp name
    (e.g. ``*.jsonl.tmp``, which the ``*.jsonl`` filter ignores) and
    ``os.rename`` into place, so a file is never visible half-written
    (``_land_jsonl`` in the catalog does exactly this). As a defensive
    backstop for writers that append in place, ``read`` re-stats each file
    after consuming it and EXCLUDES still-growing files from the committed
    offset: their partial rows are dropped and the whole file is re-read on
    the next poll, instead of the name entering the offset and the
    later-appended lines being skipped forever."""

    def __init__(self, options: dict) -> None:
        self.dir = options["path"]

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows(self, names: list[str]):
        # Materialized list, not a generator: the engine's prefetch cache
        # copy.copy()'s the iterator when planning partitions, and
        # generators aren't copyable (list iterators are).
        out = []
        for n in names:
            path = os.path.join(self.dir, n)
            try:
                # Vectorized JSONL parse (pyarrow C++, explicit schema so
                # types never drift from POLL_SCHEMA); ~4x the pure-Python
                # line loop on fixture-scale polls (guide §4.2 — native
                # code inside the Python seam). Doubles round-trip exactly:
                # the writer serializes via repr and Arrow parses full
                # precision.
                import pyarrow as pa
                import pyarrow.json as pj

                tbl = pj.read_json(
                    path,
                    parse_options=pj.ParseOptions(
                        explicit_schema=pa.schema(
                            [
                                ("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("event_type", pa.string()),
                                ("value", pa.float64()),
                            ]
                        )
                    ),
                )
                out.extend(
                    zip(
                        tbl.column("event_id").to_pylist(),
                        tbl.column("user_id").to_pylist(),
                        tbl.column("event_type").to_pylist(),
                        tbl.column("value").to_pylist(),
                    )
                )
            except Exception:  # noqa: BLE001 — malformed feed: line loop
                with open(path) as f:
                    for line in f:
                        if not line.strip():
                            continue
                        d = json.loads(line)
                        out.append(
                            (
                                int(d["event_id"]),
                                int(d["user_id"]),
                                d["event_type"],
                                float(d["value"]),
                            )
                        )
        return out

    def read(self, start: dict):
        seen = set(start["files"])
        names = sorted(
            n for n in os.listdir(self.dir) if n.endswith(".jsonl")
        )
        rows: list = []
        consumed: list[str] = []
        for n in names:
            if n in seen:
                continue
            path = os.path.join(self.dir, n)
            try:
                size_before = os.path.getsize(path)
                file_rows = self._rows([n])
                if os.path.getsize(path) != size_before:
                    continue  # mid-write: re-read in full next poll
            except OSError:
                continue  # vanished between listing and open
            rows.extend(file_rows)
            consumed.append(n)
        return iter(rows), {"files": sorted(seen | set(consumed))}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start["files"])
        return iter(self._rows([n for n in end["files"] if n not in seen]))


class PollDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "polldir"

    def schema(self) -> str:
        return POLL_SCHEMA

    def simpleStreamReader(self, schema) -> PollDirStreamReader:
        return PollDirStreamReader(self.options)
