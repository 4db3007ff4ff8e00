"""Plan-shape regression gate (see tools/planaudit.py for the full-catalog
run): representative queries must stay free of row-at-a-time Python UDFs
and non-broadcast cartesian products, and keep their scans column-pruned."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from planaudit import SF_DIR, audit_one, plan_string  # noqa: E402

from nba_data_pipeline_spark.plans.registry import load_all

REPRESENTATIVE = [
    "flagship_hitrate_last10",   # joins + windows composite
    "j6_customer_revenue_topk",  # fact-fact join + top-k
    "d5_minhash_lsh_pairs",      # banded LSH self-join
    "d5_embedding_cosine_neardup",  # distributed BLAS miner
    "sim_ivf_batch_topk",        # cell-probed ANN
    "ta_language_id",            # Arrow pandas_udf lane
    "mm_decode_features",        # mapInPandas lane
    "w6_sessionize",             # stacked windows
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_plan_is_clean(spark, name):
    df = load_all()[name].fn(spark, SF_DIR)
    assert audit_one(name, df) == []


# The 11 catalog entries deferred from the r4 driver-rotation prefix
# (plans/registry.py R4 DEFERRED note): each family has driver-green
# relatives, and until their r5 rotation slot comes up every one must hold
# a structural assertion beyond the local oracle — plan-clean under
# planaudit's three rules (no row UDFs, no cartesian products, pruned
# scans) PLUS a physical-plan fingerprint naming the operator that carries
# its semantics.
DEFERRED_FINGERPRINTS = {
    "a21_bitmap_rollup_reuse": "HashAggregate",     # bitmap merge rollup
    "ta_contamination_overlap": "Join",             # eval-shingle overlap join
    # the sim_* lanes are fully JVM-native (HOF dot products — no Arrow
    # lane at all); the negative half of that claim is asserted for all
    # entries below.
    "sim_random_projection": "Project",             # native JL projection
    "sim_matryoshka_prefix_eval": "WindowGroupLimit",  # top-k pushdown
    "sim_centroid_classifier_eval": "HashAggregate",   # centroid argmax agg
    "sim_pq_recall_eval": "WindowGroupLimit",       # ADC top-k pushdown
    "a26_histogram_quantile_rollup": "HashAggregate",  # mergeable bins
    "a28_running_distinct": "Window",               # running distinct window
    "a29_gini_concentration": "Window",             # rank-weighted sum
    "a30_markov_transitions": "Window",             # lead/lag transition pairs
    "a31_ab_proportion_ztest": "HashAggregate",     # variant aggregation
}


@pytest.mark.parametrize("name", sorted(DEFERRED_FINGERPRINTS))
def test_deferred_entry_plan_fingerprint(spark, name):
    df = load_all()[name].fn(spark, SF_DIR)
    assert audit_one(name, df) == []
    phys = plan_string(df).split("== Physical Plan ==")[-1]
    assert DEFERRED_FINGERPRINTS[name] in phys, phys[:2000]
    if name.startswith("sim_"):
        # the similarity lanes' scale claim: scoring stays inside
        # whole-stage codegen, no Python evaluation anywhere
        assert "ArrowEvalPython" not in phys and "BatchEvalPython" not in phys


def test_broadcast_hints_survive_to_plan(spark):
    """j1's dim lookup must compile to a broadcast join, not a shuffle
    join — the 100 TB claim in its docstring depends on it."""
    df = load_all()["j1_dim_enrichment"].fn(spark, SF_DIR)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bucketed_join_has_no_shuffle_below_join(spark):
    """j10's contract: the bucket layout makes the join itself shuffle-free
    — every Exchange in the plan must sit ABOVE the SortMergeJoin."""
    df = load_all()["j10_bucketed_join"].fn(spark, SF_DIR)
    plan = plan_string(df)
    phys = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" in phys
    join_pos = phys.index("SortMergeJoin")
    below = phys[join_pos:]
    # tree prints top-down: text after the join node is its input subtree
    assert "Exchange" not in below


# The 12 r4-session additions (plans/registry.py r5-queue note): never
# driver-checked until their r5 rotation slot, so each holds the same
# structural contract — plan-clean + a fingerprint naming the node that
# carries its scale story. s13_stream_outer_join executes a streaming
# drain at build (planaudit SKIP) and is covered by tools/check.py plus
# the sentinel semantics the query itself verifies.
R4_SESSION_FINGERPRINTS = {
    "mb1_frequent_pairs": "BroadcastHashJoin",      # apriori prune broadcast
    "sky1_pareto_frontier": "Window",               # running-max sweep
    "mi1_mutual_information": "HashAggregate",      # contingency contraction
    "ta_sparse_cosine_pairs": "HashAggregate",      # pair partial dot-sums
    "ta_phrase_search": "Filter",                   # in-plan array scan
    "ta_dsir_importance": "BroadcastHashJoin",      # 256-row ratio broadcast
    "j18_interval_overlap_join": "Generate",        # week-cell explosion
    "lo4_skew_profiler": "HashAggregate",           # per-key count contraction
    "sim_hard_negatives": "BroadcastNestedLoopJoin",  # broadcast anchors
    "d12_dupspan_rewrite": "LeftAnti",              # covered-position excision
    "mm_audio_energy": "MapInPandas",               # Arrow codec/DSP lane
    "ta_bm25_search": "BroadcastHashJoin",          # 3-row df broadcast
    "ts5_time_weighted_avg": "Window",              # LOCF lead chain
    # g4's relaxation rounds are checkpointed away from the final plan
    # (lineage truncation is the point); fingerprint the presentation join
    "g4_weighted_sssp": "BroadcastHashJoin",
    "w13_sequence_pattern": "ObjectHashAggregate",  # collect_list reduce
    "dq7_join_cardinality_estimate": "HashAggregate",  # histogram contraction
    "sim_ivf_hard_negatives": "WindowGroupLimit",   # per-anchor argmax pushdown
    "ta_kneser_ney_bigram": "HashAggregate",        # mergeable count tables
    "mm_video_scene_cut": "MapInPandas",            # Arrow codec/diff lane
    "a33_share_of_parent": "Window",                # grain-contracted shares
    # ta_greedy_set_cover checkpoints each round; fingerprint the in-plan
    # coverage-total join of the final assembled output
    "ta_greedy_set_cover": "BroadcastNestedLoopJoin",
    "ta_quantile_normalize": "BroadcastHashJoin",   # 101-row grid broadcast
    "w14_theil_sen_slope": "Window",                # bounded pair ranking
    "dq9_functional_dependencies": "HashAggregate", # per-pair group contraction
    "a34_sliding_distinct": "HashAggregate",        # grid-contracted distinct
    "ta_langid_confusion": "HashAggregate",         # langs^2 matrix contraction
    "ta_ngram_novelty": "HashAggregate",            # first-seen MIN contraction
    "ts6_linear_interp": "Window",                  # four ignore-null passes
    # MIN(line) over strings forces a sort-based aggregate
    "x28_log_template_mining": "SortAggregate",
    "dq10_mad_outliers": "BroadcastHashJoin",       # groups-row median broadcast
    "a35_topn_plus_others": "Window",               # rank + regroup
    "a36_abc_classification": "Window",             # decimal cumulative share
    "u5_snapshot_diff_report": "FullOuter",         # keyed snapshot diff
    "a37_mann_whitney_u": "Window",                 # pooled exact ranks
    "ta_nb_train_classify": "BroadcastHashJoin",    # broadcast model serving
    # g5 checkpoints each peel; fingerprint the final summary join
    "g5_kcore_peel": "BroadcastNestedLoopJoin",
    "a38_runs_test": "Window",                      # single ordered lag pass
    "ts7_autocorrelation": "HashAggregate",         # mergeable moment sums
    "ts8_cusum_changepoint": "Window",              # prefix-sum/running-min
    "a39_chi_square_independence": "HashAggregate", # contingency contraction
    "g6_degree_assortativity": "HashAggregate",     # mergeable moment sums
    "geo1_grid_distance_join": "Generate",          # 3x3 cell replication
    "mb2_sequential_patterns": "HashAggregate",     # alphabet-bounded pairs
    "w15_rolling_median": "Window",                 # bounded-frame buffer
    "ta_keyword_extract": "WindowGroupLimit",       # per-doc top-3 pushdown
    "mm_image_phash": "MapInPandas",                # Arrow codec+hash lane
    "src_binaryfile_roundtrip": "Project",          # codegen verify map
    "sim_alignment_uniformity": "BroadcastHashJoin",  # label-blocked pairs
    "ta_readability_forcast": "HashAggregate",      # token-grain contraction
    "a40_welch_ttest": "HashAggregate",             # mergeable moments
    "mm_audio_silence": "MapInPandas",              # Arrow codec+RLE lane
    "ta_zipf_fit": "HashAggregate",                 # vocab-grain contraction
    "a41_ks_test": "Window",                        # distinct-value ECDF walk
    "g7_clustering_coefficient": "HashAggregate",   # node-grain contraction
    "ts9_seasonal_strength": "HashAggregate",       # (type,hour) contraction
    "a42_qq_deciles": "Window",                     # exact rank selection
    "geo2_density_smooth": "Generate",              # 9-offset scatter
}


@pytest.mark.parametrize("name", sorted(R4_SESSION_FINGERPRINTS))
def test_r4_session_entry_plan_fingerprint(spark, name):
    df = load_all()[name].fn(spark, SF_DIR)
    assert audit_one(name, df) == []
    phys = plan_string(df).split("== Physical Plan ==")[-1]
    assert R4_SESSION_FINGERPRINTS[name] in phys, phys[:2000]


def test_phrase_search_is_join_free(spark):
    """ta_phrase_search's scale claim: occurrences are located by an array
    scan in one pass — the plan must contain NO join at all."""
    df = load_all()["ta_phrase_search"].fn(spark, SF_DIR)
    phys = plan_string(df).split("== Physical Plan ==")[-1]
    assert "Join" not in phys


# ---------------------------------------------------------------------------
# R5: trivially-true join predicate gate (tools/planaudit.py StderrTap)
# ---------------------------------------------------------------------------


def test_stderr_tap_captures_child_process_fd2():
    """The R5 artifact is a JVM (child-process) log4j WARN on fd 2. The
    subtle property the tap relies on is that a child spawned AFTER the
    tap inherits the redirected fd — verified here with a python child
    standing in for the JVM. (A child spawned BEFORE keeps the old fd,
    which is why planaudit installs the tap before get_spark.)"""
    import subprocess
    import sys as _sys

    from tools.planaudit import R5_MARKER, StderrTap

    tap = StderrTap()
    try:
        tap.drain()
        subprocess.run(
            [_sys.executable, "-c", f"import sys; sys.stderr.write({R5_MARKER!r})"],
            check=True,
        )
        captured = tap.drain()
    finally:
        tap.close()
    assert R5_MARKER in captured


def test_ts6_join_condition_uses_distinct_attributes(spark):
    """ts6's spine⋈daily was the one trivially-true-predicate site (the
    r6 bench-tail WARN): spine derives from daily, so an equality between
    the two frames' user_id columns shared lineage. The fixed shape joins
    on renamed observation-side keys; regression = the join condition in
    the analyzed plan carries obs_user/obs_day, not a dropped predicate."""
    spec = load_all()["ts6_linear_interp"]
    df = spec.fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "obs_user" in plan and "obs_day" in plan
