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
    # --- the 21 entries never driver-checked in r1/r2 ---
    "a16_hll_sketch_rollup",
    "a17_incremental_merge",
    "sim_ivf_batch_topk",
    "snk7_xlsx_roundtrip",
    "s6_sliding_windows",
    "s6_session_windows",
    "s3_stability_tracker",
    "ta_stratified_sample",
    "ta_quality_percentiles",
    "x21_odds_math",
    "x_matchup_cleanup",
    "x18_event_mining",
    "x4_game_time",
    "x56_insight_parse",
    "x12_team_mentions",
    "corpus_curation_pipeline",
    "ta_repetition_ratio",
    "ta_global_shuffle_shard",
    "ta_perplexity_score",
    "w4_latest_per_key",
    "w7_funnel_sequence",
    # --- changed this round; re-verify ---
    "d5_minhash_lsh_pairs",
    "mm_decode_features",
    "d5_cc_clusters",
    # --- new in round 3 ---
    "d5_cc_clusters_multipart",
    "ta_entropy_quality",
    "ta_domain_quota_sample",
    "ta_bloom_url_dedup",
    "ta_utf8_sanitize",
    "ta_dup_line_prefix",
    "sim_pq_codebook",
    "sim_pq_topk",
    "a18_bitmap_distinct",
    "a19_windowed_mode",
    "s8_stream_stream_join",
    "s9_foreach_batch_upsert",
    "src_http_get",
    "ta_winnow_fingerprint",
    "j11_salted_skew_join",
    "x22_fuzzy_match",
    "ta_bpe_merge_round",
    "a20_cms_heavy_hitters",
    "w8_curriculum_deciles",
    "mm_real_codec_roundtrip",
    # --- new in round 3 (session 2): the two with the most novel oracle
    # machinery take these slots (the replanned d5_ngram_jaccard_topk /
    # sim_lsh_neardup_pairs keep their r2-green rows — same semantics,
    # same oracle, re-verified locally); the other five r3-session-2
    # additions (w9_scd2_intervals, lo1/lo2 layout, ta_quality_classifier,
    # d5_simhash_hamming_pairs) are local-green via tools/check.py and
    # rotate into the r4 prefix once this round frees 48 proven slots ---
    "j12_bloom_runtime_filter",
    "g1_pagerank_trade",
    # R4 ROTATION QUEUE (write once, rotate next round): entries never
    # driver-checked after r3 — all r3-session-2/3 overflow — in priority
    # order for the r4 prefix: a21_bitmap_rollup_reuse,
    # ta_contamination_overlap, w9_scd2_intervals, cdc_merge_apply,
    # lo1_zorder_layout, lo2_compaction_bins, ta_quality_classifier,
    # d5_simhash_hamming_neighbors, j13_incremental_join_maintenance,
    # a22_grouping_sets, a23_equiwidth_histogram, a24_cohort_retention,
    # ts1_locf_gapfill, ts2_ohlc_bars, x23_deletion_neighborhood_join,
    # dq1_constraint_audit, snk8_partitioned_parquet_roundtrip,
    # src_json_variant, a25_kmv_set_ops, ta_weighted_sample,
    # sim_random_projection, j14_asof_tolerance_union, g2_triangle_count,
    # dq2_zscore_outliers, ts3_ewma_smooth, a26_histogram_quantile_rollup,
    # a27_unpivot_roundtrip, g3_bfs_levels, d10_lsh_recall_eval,
    # w11_distribution_ranks, x24_suffixed_number_parse,
    # sql_q3_shipping_priority, src_csv_corrupt_records, src_orc_roundtrip,
    # src_schema_evolution, ta_url_canonicalize, w10_interval_coalesce,
    # a28_running_distinct, ta_bpe_encode, s10_dedupe_within_watermark,
    # j15_dynamic_partition_pruning, s11_stream_incremental_minhash,
    # sim_matryoshka_prefix_eval, j16_point_in_time_join,
    # ts4_backtest_seasonal_naive, dq4_benford_digit_audit,
    # w12_rolling_regression_slope — 47 entries ≈ one full 50-slot round
    # (plus d5_minhash_lsh_pairs re-verified post-seed-fix, already in
    # this round's prefix).
    # --- new in round 3 (session 3): the two with the most novel machinery
    # (prefix-filtered similarity join plan; the native-XML IO path) take
    # two slots — displacing a21_bitmap_rollup_reuse and
    # ta_contamination_overlap, whose machinery is family-covered by
    # a18_bitmap_distinct / ta_decontaminate (driver-green r2); they stay
    # local-green and rotate into the r4 prefix with the other session-2/3
    # overflow (src_json_variant, a25_kmv_set_ops, ta_weighted_sample,
    # sim_random_projection, j14_asof_tolerance_union, w9, lo1/lo2, …). ---
    "d9_prefix_filter_join",
    "src_xml_roundtrip",
    # --- proven representatives (driver-green r1/r2, unchanged) keeping
    # the filters/normalize families in this round's gate
    # (flagship stays smoke-checked every round via entry()) ---
    "nba_fixture_normalize",
    "f4_multi_dim_selection",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so its @query decorators run, then order the
    catalog so the driver-checked 50-entry prefix spans every §2 family."""
    from nba_data_pipeline_spark.plans import (  # noqa: F401
        analytics,
        curation_plans,
        dedup,
        filters,
        graph_plans,
        joins,
        layout_plans,
        multimodal_plans,
        normalize_plans,
        similarity,
        sinks,
        sources_plans,
        streaming_plans,
        text_plans,
        timeseries_plans,
        windows,
    )

    front = [n for n in _FRONT if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in _FRONT]
    return {n: REGISTRY[n] for n in (*front, *rest)}
