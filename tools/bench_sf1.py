"""Run the heavy catalog families at a scaled SF (default the 10x tiling
from tools/make_sf_scaled.py) and compare wall-times to the committed sf0.1
snapshot (bench_full.json) — the measurement VERDICT r3 item 4 asked for:
linear-ish scaling evidence for the 100 TB design claims, no OOM/spill
pathology.

Usage: python tools/bench_sf1.py [sf_dir] [query ...] [> report]
       (query names restrict the run to a subset of HEAVY)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_data_pipeline_spark.plans.registry import load_all
from nba_data_pipeline_spark.session import get_spark

HEAVY = [
    # near-dup / dedup family
    "d5_minhash_lsh_pairs",
    "d5_simhash_hamming_neighbors",
    "d5_ngram_jaccard_topk",
    "d5_embedding_cosine_neardup",
    "d5_cc_clusters",
    "d5_cc_clusters_multipart",
    "d9_prefix_filter_join",
    "d10_lsh_recall_eval",
    "d11_survivor_selection",
    # graph family
    "g1_pagerank_trade",
    "g2_triangle_count",
    "g3_bfs_levels",
    # similarity / ANN family
    "sim_lsh_neardup_pairs",
    "sim_ivf_batch_topk",
    "sim_pq_codebook",
    "sim_pq_topk",
    # streaming incremental near-dup
    "s11_stream_incremental_minhash",
    # r4-session additions with a data-dependent join/shuffle mass
    "ta_sparse_cosine_pairs",
    "d12_dupspan_rewrite",
    "j18_interval_overlap_join",
    "mb1_frequent_pairs",
    "ta_dsir_importance",
    # late r4-session additions
    "ta_greedy_set_cover",
    "ta_kneser_ney_bigram",
    "w13_sequence_pattern",
    "g4_weighted_sssp",
    "ts5_time_weighted_avg",
    "dq7_join_cardinality_estimate",
    "mm_video_scene_cut",
    "ta_ngram_novelty",
    "ta_quantile_normalize",
    "a34_sliding_distinct",
    "w14_theil_sen_slope",
    "dq9_functional_dependencies",
    "ta_langid_confusion",
    "a33_share_of_parent",
    "snk9_stream_file_sink",
    "sim_ivf_hard_negatives",
    "ta_bm25_search",
    "s13_stream_outer_join",
    "sky1_pareto_frontier",
    "mi1_mutual_information",
    "lo4_skew_profiler",
    "sim_hard_negatives",
    "ta_phrase_search",
    "w13_sequence_pattern",
    "mm_audio_energy",
    "ta_greedy_set_cover",
    # tail of the r4 session (added after the last 30x sweep)
    "x28_log_template_mining",
    "dq10_mad_outliers",
    "a35_topn_plus_others",
    "a36_abc_classification",
    "u5_snapshot_diff_report",
    "a37_mann_whitney_u",
    "ta_nb_train_classify",
    "snk10_dynamic_partition_overwrite",
    "g5_kcore_peel",
    "a38_runs_test",
    "ts6_linear_interp",
    # continuation-session additions (catalog 234 -> 254)
    "ts7_autocorrelation",
    "ts8_cusum_changepoint",
    "a39_chi_square_independence",
    "g6_degree_assortativity",
    "geo1_grid_distance_join",
    "mb2_sequential_patterns",
    "w15_rolling_median",
    "ta_keyword_extract",
    "mm_image_phash",
    "src_binaryfile_roundtrip",
    "sim_alignment_uniformity",
    "ta_readability_forcast",
    "a40_welch_ttest",
    "mm_audio_silence",
    "ta_zipf_fit",
    "a41_ks_test",
    "g7_clustering_coefficient",
    "ts9_seasonal_strength",
    "a42_qq_deciles",
    "geo2_density_smooth",
    # r5/r6: the distributed total-order family (sampled-cut two-pass
    # rank/ntile/prefix-sum) and the r6-changed plans — the rank rewires
    # are exactly the queries whose scale posture changed, so they need
    # an above-sf0.1 point
    "w8_curriculum_deciles",
    "ta_weighted_sample",
    "a29_gini_concentration",
    "a43_rfm_segmentation",
    "flagship_hitrate_last10",
    "a20_cms_heavy_hitters",
    "a25_kmv_set_ops",
    "ts10_kaplan_meier",
    "x_sanitize_dates",
    "a26_histogram_quantile_rollup",
    "a28_running_distinct",
    "a30_markov_transitions",
    "a31_ab_proportion_ztest",
    # r6 coverage-closing sweep: the last catalog entries with no
    # above-sf0.1 measurement
    "g9_adamic_adar_links",
    "ts11_lttb_downsample",
    "sql_q5_local_supplier_volume",
    "sql_q18_large_volume_customer",
    "src_html_by_id",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sf_scaled",
        "sf1",
    )
    subset = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("bench_sf1", cpus=cpus)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    specs = load_all()
    ref = {}
    ref_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_full.json")
    if os.path.exists(ref_path):
        ref = json.load(open(ref_path)).get("queries", {})
    out = {}
    for name in HEAVY:
        if subset and name not in subset:
            continue
        if name not in specs:
            print(f"skip {name}: not in catalog", file=sys.stderr)
            continue
        # min of 2, matching bench.py's protocol so the sf0.1 comparison
        # column (also min-of-2) is apples-to-apples
        dt = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                it = round(time.time() - t0, 2)
                dt = it if dt < 0 else min(dt, it)
        except Exception as e:  # noqa: BLE001
            dt = -1.0
            print(f"{name} FAILED: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        base = ref.get(name)
        ratio = round(dt / base, 1) if base and dt > 0 else None
        out[name] = {"sf1_sec": dt, "sf01_sec": base, "ratio": ratio}
        print(f"{name}: sf1={dt}s sf0.1={base}s ratio={ratio}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
