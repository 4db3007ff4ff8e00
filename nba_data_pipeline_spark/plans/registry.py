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
    # ROUND-4 ROTATION (executes the queue pre-committed in r3 / VERDICT r3
    # item 1): 48 of the 59 entries never driver-checked after r1∪r2∪r3,
    # plus the two mm queries whose implementation CHANGES this round
    # (routed through use_real_codecs=True — VERDICT r3 item 6), so they
    # need driver re-verification. Everything driver-green r1–r3 and
    # semantically unchanged sits after the prefix, covered by
    # tools/check.py locally.
    # --- analytics (a2x) never driver-checked ---
    "a22_grouping_sets",
    "a23_equiwidth_histogram",
    "a24_cohort_retention",
    "a25_kmv_set_ops",
    "a27_unpivot_roundtrip",
    "a32_weighted_median",
    # --- data quality ---
    "dq1_constraint_audit",
    "dq2_zscore_outliers",
    "dq4_benford_digit_audit",
    "dq5_column_profile",  # also changed r4: lazy in-plan row count
    "dq6_migration_reconciliation",
    # --- text analysis ---
    "ta_weighted_sample",
    "ta_bpe_encode",
    "ta_url_canonicalize",
    "ta_quality_classifier",
    # --- dedup / graph ---
    "d5_simhash_hamming_neighbors",
    "d10_lsh_recall_eval",
    "d11_survivor_selection",
    "g2_triangle_count",
    "g3_bfs_levels",
    # --- joins / CDC ---
    "cdc_merge_apply",
    "j13_incremental_join_maintenance",
    "j14_asof_tolerance_union",
    "j15_dynamic_partition_pruning",
    "j16_point_in_time_join",
    "j17_null_safe_join",
    # --- data layout ---
    "lo1_zorder_layout",
    "lo2_compaction_bins",
    "lo3_skipping_effectiveness",
    # --- SQL / sources / sinks ---
    "sql_q3_shipping_priority",
    "snk8_partitioned_parquet_roundtrip",
    "src_json_variant",
    "src_orc_roundtrip",
    "src_schema_evolution",
    "src_csv_corrupt_records",
    # --- streaming (s11 also changed r4: bounded assert collect; s12's
    # polldir reader gained the mid-write backstop) ---
    "s10_dedupe_within_watermark",
    "s11_stream_incremental_minhash",
    "s12_custom_pystream_source",
    # --- extraction / time series / windows ---
    "x23_deletion_neighborhood_join",
    "x24_suffixed_number_parse",
    "ts1_locf_gapfill",
    "ts2_ohlc_bars",
    "ts3_ewma_smooth",
    "ts4_backtest_seasonal_naive",
    "w9_scd2_intervals",
    "w10_interval_coalesce",
    "w11_distribution_ranks",
    "w12_rolling_regression_slope",
    # --- changed this round: real PNG/NVID codecs become the default
    # decode path for the resize and frame-sample plans ---
    "mm_resize_plan",
    "mm_frame_sample",
    # R4 DEFERRED (11 entries, never driver-checked; each family already
    # has driver-green relatives, and every one carries a structural
    # plan-fingerprint assertion in tests/test_plan_shapes.py per VERDICT
    # r3 item 7): a21_bitmap_rollup_reuse (a18 driver-r3),
    # ta_contamination_overlap (ta_decontaminate driver-r2),
    # sim_random_projection / sim_matryoshka_prefix_eval /
    # sim_centroid_classifier_eval / sim_pq_recall_eval (5 sim_* entries
    # driver-green r1–r3), a26_histogram_quantile_rollup,
    # a28_running_distinct, a29_gini_concentration, a30_markov_transitions,
    # a31_ab_proportion_ztest (a1–a25 driver-green across r1–r4). These
    # lead the r5 prefix, followed by the 12 new r4-session additions
    # (never driver-checked, all local-green + plan-fingerprinted):
    # mb1_frequent_pairs, sky1_pareto_frontier, mi1_mutual_information,
    # ta_sparse_cosine_pairs, ta_phrase_search, ta_dsir_importance,
    # j18_interval_overlap_join, lo4_skew_profiler, sim_hard_negatives,
    # s13_stream_outer_join, d12_dupspan_rewrite, mm_audio_energy,
    # ta_bm25_search, ts5_time_weighted_avg, g4_weighted_sssp,
    # w13_sequence_pattern, dq7_join_cardinality_estimate,
    # sim_ivf_hard_negatives, ta_kneser_ney_bigram, snk9_stream_file_sink,
    # mm_video_scene_cut, a33_share_of_parent, ta_greedy_set_cover,
    # ta_quantile_normalize, w14_theil_sen_slope,
    # dq9_functional_dependencies, a34_sliding_distinct, ta_langid_confusion,
    # ta_ngram_novelty, ts6_linear_interp, x28_log_template_mining,
    # dq10_mad_outliers, a35_topn_plus_others, a36_abc_classification,
    # u5_snapshot_diff_report, a37_mann_whitney_u, ta_nb_train_classify,
    # snk10_dynamic_partition_overwrite, g5_kcore_peel, a38_runs_test,
    # ts7_autocorrelation, ts8_cusum_changepoint,
    # a39_chi_square_independence, g6_degree_assortativity,
    # geo1_grid_distance_join, mb2_sequential_patterns, w15_rolling_median,
    # ta_keyword_extract, mm_image_phash, src_binaryfile_roundtrip,
    # sim_alignment_uniformity, ta_readability_forcast, a40_welch_ttest,
    # mm_audio_silence, ta_zipf_fit, a41_ks_test, g7_clustering_coefficient,
    # ts9_seasonal_strength, a42_qq_deciles, geo2_density_smooth.
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

    front = [n for n in _FRONT if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in _FRONT]
    return {n: REGISTRY[n] for n in (*front, *rest)}
