"""Query catalog: every implemented operator from SURVEY.md §2 registers a
named query (Spark builder) and, when SQL-expressible, its DuckDB oracle SQL
twin. ``__spark_entry__.py`` re-exports this catalog to the driver.

Determinism rules (so the oracle value-hash matches):
  * every computed column is aliased identically on both sides;
  * every window/rank order includes a unique tiebreaker;
  * floating aggregates are rounded (ROUND_DIGITS) on both sides so the
    engines' different summation orders can't leak into the hash;
  * "keep one row per key" is always expressed as row_number()==1 over a
    total order, never nondeterministic dropDuplicates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

ROUND_DIGITS = 4


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def pinned_sort(df: DataFrame, *cols) -> DataFrame:
    """Final presentation sort with the Python lane run ONCE.

    ``orderBy`` plans an ``Exchange rangepartitioning`` whose bounds come
    from a separate sampling pass over the child; when the child stage
    contains a Python node (mapInPandas / applyInPandas / Arrow UDF /
    UDTF), that sampling pass re-executes the whole lane, doubling the
    entry's dominant cost. Pinning with a lazy ``localCheckpoint`` lets
    the sampling job materialize the lane once and the sort read the
    pinned blocks (measured on ud5: 2.1 s → 1.4 s warm at sf0.1). The
    ``bounded_plan_cache`` scope releases the blocks after the query.
    Use ONLY above Python/opaque lanes — a codegen child re-samples for
    pennies and the pin would just cost a materialization barrier."""
    return df.localCheckpoint(eager=False).orderBy(*cols)


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The round driver evaluates the FIRST 50 catalog entries against the DuckDB
# oracle (round 1 checked exactly queries()[0:50] in registration order and
# recorded nothing else). This list pins the front 50. Round-3 rotation
# policy (VERDICT r2 item 1): the union of CORRECTNESS_r01+r02 already covers
# 90 of the 111 r2-era entries, so the 21 never-driver-checked queries all
# move into the prefix now, followed by queries whose implementation CHANGED
# this round (they need re-verification) and the new round-3 additions.
# Everything else — driver-green in r1/r2 and semantically unchanged — sits
# after the prefix and stays covered by tools/check.py locally.
_FRONT: tuple[str, ...] = (
    # ROUND-11 ROTATION. Standing policy: head = entries whose
    # implementation changed or that are new this round (they need
    # (re-)verification on the driver signal), then the prefix fills with
    # the entries whose last driver check is OLDEST (the r3 cohort — 39
    # entries, 35 fit this round, the alphabetical tail rolls to r12), so
    # verification debt ages out instead of accumulating.
    #
    # --- changed r11: size-adaptive cc edge miner (persisted shingle
    # equi-join below the scratch probe, spill-bounded r-generalized
    # prefix-filter slices past it — operators/dedup.prefix_jaccard_pairs) ---
    "d5_cc_clusters",
    "d5_cc_clusters_multipart",
    # --- changed r11: phase-wise bucketed-layout build (join-key-range
    # chunks, overwrite-then-append past the scratch probe); j10 shares
    # bucketed_layout ---
    "flagship_hitrate_bucketed",
    "j10_bucketed_join",
    # --- changed r11: g7 small-layout/lazy-pin discipline on the edge list ---
    "g8_hits_hubs_authorities",
    # --- changed r11: recency-anchor job removed (NTILE rides last_order
    # ASC — identical tiles, one fewer full pass) ---
    "a43_rfm_segmentation",
    # --- changed r11: spill-bounded pair mining past the scratch probe
    # (bucketed fitems staging + sequential p1-hash pair-agg slices) ---
    "mb1_frequent_pairs",
    # --- changed r11: batch-UDF spread + scoped small-shuffle drain +
    # landing-schema cache (s11); schema cache touches every
    # _stream_events consumer ---
    "s11_stream_incremental_minhash",
    "s1_stream_ingest_counts",
    "s2_stream_arrival_dedupe",
    "s3_stability_tracker",
    "s7_stream_static_join",
    "s8_stream_stream_join",
    "s10_dedupe_within_watermark",
    "s13_stream_outer_join",
    # --- oldest driver checks (r3 cohort; 35 of 39, alphabetical) ---
    "a18_bitmap_distinct",
    "a19_windowed_mode",
    "corpus_curation_pipeline",
    "f4_multi_dim_selection",
    "j11_salted_skew_join",
    "j12_bloom_runtime_filter",
    "mm_decode_features",
    "mm_real_codec_roundtrip",
    "nba_fixture_normalize",
    "s6_session_windows",
    "s6_sliding_windows",
    "sim_ivf_batch_topk",
    "sim_pq_codebook",
    "sim_pq_topk",
    "snk7_xlsx_roundtrip",
    "src_http_get",
    "src_xml_roundtrip",
    "ta_bloom_url_dedup",
    "ta_bpe_merge_round",
    "ta_domain_quota_sample",
    "ta_dup_line_prefix",
    "ta_entropy_quality",
    "ta_global_shuffle_shard",
    "ta_perplexity_score",
    "ta_quality_percentiles",
    "ta_repetition_ratio",
    "ta_stratified_sample",
    "ta_utf8_sanitize",
    "ta_winnow_fingerprint",
    "w4_latest_per_key",
    "w7_funnel_sequence",
    "x12_team_mentions",
    "x18_event_mining",
    "x21_odds_math",
    "x22_fuzzy_match",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so its @query decorators run, then order the
    catalog so the driver-checked 50-entry prefix spans every §2 family."""
    from nba_data_pipeline_spark.plans import (  # noqa: F401
        analytics,
        curation_plans,
        dedup,
        filters,
        geo_plans,
        graph_plans,
        joins,
        layout_plans,
        mining_plans,
        multimodal_plans,
        normalize_plans,
        search_plans,
        similarity,
        sinks,
        sources_plans,
        streaming_plans,
        text_plans,
        timeseries_plans,
        windows,
    )

    # A _FRONT name missing from REGISTRY is a promised-but-unimplemented
    # entry; silently dropping it once cost a driver rotation slot (the r5
    # src_html_by_id ghost), so it is a hard error now.
    ghosts = [n for n in _FRONT if n not in REGISTRY]
    if ghosts:
        import difflib

        hints = {
            g: difflib.get_close_matches(g, REGISTRY, n=3) for g in ghosts
        }
        raise KeyError(
            f"_FRONT names not in REGISTRY (unimplemented?): {ghosts}; "
            f"closest registered names: {hints}"
        )
    rest = [n for n in REGISTRY if n not in _FRONT]
    return {n: REGISTRY[n] for n in (*_FRONT, *rest)}
