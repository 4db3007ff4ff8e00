"""Custom Python STREAMING data source (Spark 4 DataSource API): poll a
landing directory for new JSON-lines files and emit their records as
micro-batches — ``spark.readStream.format("polldir").option("path", d).load()``.

This is the reference's polling ingestion loop (run_scraper.py sleep-poll,
SURVEY §2 SRC8/S1) promoted to a FIRST-CLASS source: offsets are the set
of files already consumed, so restart/replay semantics come from the
engine's checkpoint instead of hand-rolled seen-lists; the batch-half
sibling is ``html_datasource`` (same API, batch reader).

Scale shape (r11): a PARTITIONED ``DataSourceStreamReader`` — the driver
only lists and stats the landing dir (``latestOffset``); each new file is
an input partition whose bytes are parsed on an EXECUTOR with pyarrow's
C++ JSON reader and handed to Spark as Arrow RecordBatches, so no row ever
materializes as a Python object and ingest parallelism grows with the
number of landed polls. (The first cut was a ``SimpleDataSourceStreamReader``
that parsed every file in the driver and shipped pickled tuples — fine for
control-plane-sized feeds, guide-§5 driver data work at fact scale.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

POLL_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )


def _parse_jsonl(path: str):
    """Parse one landed JSONL file to an Arrow table in POLL_SCHEMA column
    order. Vectorized parse (pyarrow C++, explicit schema so types never
    drift); ~4x the pure-Python line loop on fixture-scale polls (guide
    §4.2 — native code inside the Python seam). Doubles round-trip exactly:
    the writer serializes via repr and Arrow parses full precision. Falls
    back to a line loop for malformed feeds (pyarrow rejects the file)."""
    import pyarrow as pa
    import pyarrow.json as pj

    try:
        tbl = pj.read_json(
            path, parse_options=pj.ParseOptions(explicit_schema=_arrow_schema())
        )
        return tbl.select(["event_id", "user_id", "event_type", "value"])
    except Exception:  # noqa: BLE001 — malformed feed: line loop
        rows = ([], [], [], [])
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                rows[0].append(int(d["event_id"]))
                rows[1].append(int(d["user_id"]))
                rows[2].append(d["event_type"])
                rows[3].append(float(d["value"]))
        return pa.table(dict(zip(("event_id", "user_id", "event_type", "value"), rows)))


class PollFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class PollDirStreamReader(DataSourceStreamReader):
    """Offset = {"files": [consumed file names]}. ``latestOffset`` admits
    every not-yet-seen ``*.jsonl`` file in name order; ``partitions`` maps
    a committed (start, end] range to one partition per new file, which
    executors re-read deterministically on replay (the exactly-once replay
    contract — file contents are immutable once landed).

    Landing contract: writers must LAND-THEN-RENAME — write to a temp name
    (e.g. ``*.jsonl.tmp``, which the ``*.jsonl`` filter ignores) and
    ``os.rename`` into place, so a file is never visible half-written
    (``_land_jsonl`` in the catalog does exactly this). As a defensive
    backstop for writers that append in place, ``latestOffset`` stats each
    candidate twice and EXCLUDES still-growing files from the offset: the
    file stays out of the batch and is admitted whole by a later poll,
    instead of the name entering the offset and the later-appended lines
    being skipped forever."""

    def __init__(self, options: dict) -> None:
        self.dir = options["path"]
        #: files already admitted to an offset this reader produced (the
        #: engine tracks the committed set in the checkpoint; this mirrors
        #: it so repeated polls don't re-stat consumed files).
        self._known: set[str] = set()

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        names = sorted(
            n for n in os.listdir(self.dir) if n.endswith(".jsonl")
        )
        for n in names:
            if n in self._known:
                continue
            path = os.path.join(self.dir, n)
            try:
                size_before = os.path.getsize(path)
                if os.path.getsize(path) != size_before:
                    continue  # mid-write: admit whole on a later poll
            except OSError:
                continue  # vanished between listing and stat
            self._known.add(n)
        return {"files": sorted(self._known)}

    def partitions(self, start: dict, end: dict) -> list[PollFilePartition]:
        seen = set(start["files"])
        return [
            PollFilePartition(os.path.join(self.dir, n))
            for n in end["files"]
            if n not in seen
        ]

    def read(self, partition: PollFilePartition):
        # Executor-side: yield Arrow batches straight from the C++ parser —
        # rows never exist as Python objects (guide §4.1/§4.2).
        yield from _parse_jsonl(partition.path).to_batches()

    def commit(self, end: dict) -> None:
        pass  # landed files are immutable; nothing to clean up


class PollDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "polldir"

    def schema(self) -> str:
        return POLL_SCHEMA

    def streamReader(self, schema) -> PollDirStreamReader:
        return PollDirStreamReader(self.options)
