"""SRC4: raw HTTP GET ingestion (lineup_scraper.py:14-27 — the reference's
``requests.get(url)`` + parse adapter), Spark-first: a DataFrame of URLs
becomes a DataFrame of fetched bodies via ``mapInPandas``, so the fetch
fan-out IS the partition fan-out — each executor pulls its partition's
URLs with a stdlib ``urllib`` opener (no extra deps), and every downstream
parse/extract operator composes on the ``body`` column.

Scale posture: fetching is IO-bound, so parallelism = URL partitions
(repartition the URL list to the desired concurrency; at cluster scale
that's thousands of concurrent fetchers with per-task politeness).
Failures become rows (status = -1 + error text), never task aborts — a
dead URL must not kill a 100k-URL batch. ``file://`` URLs work through
the same opener, which is what the offline catalog round-trip uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_SCHEMA = "url string, status int, body string, error string"

_MAX_BYTES = 8 * 1024 * 1024  # refuse to buffer bodies beyond 8 MiB


def _fetch_one(url: str, timeout: float) -> dict:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            body = resp.read(_MAX_BYTES + 1)
            if len(body) > _MAX_BYTES:
                return {
                    "url": url, "status": -1, "body": "",
                    "error": f"body exceeds {_MAX_BYTES} bytes",
                }
            status = getattr(resp, "status", None) or 200
            return {
                "url": url,
                "status": int(status),
                "body": body.decode("utf-8", errors="replace"),
                "error": "",
            }
    except urllib.error.HTTPError as e:  # server answered with an error code
        return {"url": url, "status": int(e.code), "body": "", "error": str(e.reason)}
    except Exception as e:  # noqa: BLE001 — DNS/timeout/refused/bad scheme
        return {"url": url, "status": -1, "body": "", "error": str(e)}


def http_get_corpus(urls: DataFrame, timeout: float = 10.0) -> DataFrame:
    """Fetch every row of ``urls`` (column ``url``) and return
    (url, status, body, error) rows. Arrow-batched ``mapInPandas``: one
    Python pass per partition, sequential GETs within a task (politeness
    unit), partitions fetch concurrently."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [_fetch_one(u, timeout) for u in pdf["url"]],
                columns=["url", "status", "body", "error"],
            )

    return urls.select("url").mapInPandas(run, schema=FETCH_SCHEMA)
