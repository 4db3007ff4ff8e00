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
