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
    # ROUND-10 ROTATION. Standing policy: head = entries whose
    # implementation changed or that are new this round (they need
    # (re-)verification on the driver signal), then the prefix fills with
    # the entries whose last driver check is OLDEST (the r2 cohort, now
    # the stalest), so verification debt ages out instead of accumulating.
    #
    # --- new r10: the flagship over a maintained suppkey-bucketed layout
    # (bucketed_layout; per-supplier window exchange-free) ---
    "flagship_hitrate_bucketed",
    # --- changed r10: three chained total_order ranks -> multi_ntile_exact
    # boundary selection (sf300 engine-only 514.5 s -> 255.5 s) ---
    "a43_rfm_segmentation",
    # --- changed r10: corpus-wide shingle-array persist removed; verify
    # re-shingles only the LSH candidates (sf300: box-bound -> sampled
    # oracle green, 530.5 s) ---
    "d5_minhash_lsh_pairs",
    # --- changed r10: hashed_shingle_sets + footer-probe-adaptive persist
    # (16-byte cache rows; deep decades stream instead of caching) ---
    "d5_cc_clusters",
    "d5_cc_clusters_multipart",
    "d11_survivor_selection",
    "d5_ngram_jaccard_topk",
    # --- changed r10: fact-grain persists dropped for exchange reuse;
    # only the part-grain frequent-item table is cached ---
    "mb1_frequent_pairs",
    # --- changed r10: foreachBatch state transitions factored into
    # plan-testable functions (s9_batch_state / s11_batch_decisions);
    # s11 also keys its landing cache by source mtime and ran the full
    # sf300 oracle unattended at the derived 16-worker cap (1424.4 s) ---
    "s9_foreach_batch_upsert",
    "s11_stream_incremental_minhash",
    # --- changed r10: sentinel/stability landings key on source mtime ---
    "s13_stream_outer_join",
    "s3_stability_tracker",
    # --- changed r10: lineup rows tolerate >=3 cells (ADVICE r9) ---
    "ud3_lineup_parse",
    # --- oldest driver checks (r2 cohort) ---
    "j10_bucketed_join",
    "s1_stream_ingest_counts",
    "s2_stream_arrival_dedupe",
    "s6_tumbling_windows",
    "s7_stream_static_join",
    "sim_ivf_probe1",
    "sim_kmeans_train",
    "sim_quantize_int8",
    "sim_recall_eval",
    "skew_salted_agg",
    "snk3_sink_modes",
    "src_csv_roundtrip",
    "src_html_roundtrip",
    "src_json_props",
    "ta_chunk_overlap",
    "ta_decontaminate",
    "ta_fingerprint_groups",
    "ta_gopher_rules",
    "ta_language_id",
    "ta_mixture_weights",
    "ta_pii_scrub",
    "ta_quality_scores",
    "ta_tfidf_top_terms",
    "ta_token_budget_pack",
    "ta_token_counts",
    "ta_train_test_split",
    "ta_vocab_topk",
    "ud13_prop_line_walker",
    "udaf_median_price",
    "w1_ordinal_disambiguation",
    "w2_rank_within_group",
    "w3_longest_streak",
    "w5_calendar_range_frame",
    "w6_sessionize",
    "x_prop_extraction",
    # --- oldest r3 (fills the 50-slot prefix) ---
    "a16_hll_sketch_rollup",
    "a17_incremental_merge",
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
