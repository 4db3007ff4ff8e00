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
    # ROUND-9 ROTATION. Standing policy: head = entries whose
    # implementation changed or that are new this round (they need
    # (re-)verification on the driver signal), then the prefix fills with
    # the entries whose last driver check is OLDEST (here: r1/r2-only),
    # so verification debt ages out instead of accumulating. Everything
    # else is driver-green in a later round and semantically unchanged —
    # covered locally by tools/check.py full sweeps at sf0.01 and sf1.
    #
    # --- new r9: the dvp CLI's combined nested-document pipeline
    # (X11 + W1 LA rule + S5 gate + the SNK4 envelope, end to end) ---
    "snk14_dvp_matrix_tree",
    # --- new r9: the lineup-table UDTF walk (UD3, lineup_scraper.py:31-114) ---
    "ud3_lineup_parse",
    # --- changed r9: running_extreme gained the size-adaptive single-task
    # cutover (sky1 is its one catalog consumer) ---
    "sky1_pareto_frontier",
    # --- changed r9: geo1's partition pin is now derived from a footer-
    # stats probe instead of a static value ---
    "geo1_grid_distance_join",
    # --- changed r9: write_team_stats_tree streams per-(team, table)
    # partials instead of accumulating every envelope in driver memory ---
    "snk13_bref_stats_tree",
    # --- r9: the prompts CLI reuses this operator for its distributed
    # prompt generation — re-pin it with the new consumer ---
    "ud4_llm_prompt",
    # --- oldest driver checks (r1) ---
    "a11_onoff_split",
    "a12_pricing_summary",
    "a13_cube_order_mix",
    "a13_rollup_revenue",
    "a1_group_collect",
    "a2_group_fanout_manifest",
    "a3_count_metadata",
    "a5_completeness_counts",
    "a6_market_buckets",
    "a7_argmax_order",
    "a9_rolling_averages",
    "a_pivot_matrix",
    "d1_first_wins_dedup",
    "d2_prefix_dedup",
    "d3_full_row_distinct",
    "d4_content_hash_dedup",
    "d5_simhash_signatures",
    "f2_keyword_length",
    "f3_pattern_exclusion",
    "f5_name_shape",
    "f6_token_list_validate",
    "f7_min_content",
    "f8_skip_if_exists",
    "j1_dim_enrichment",
    "j3_anti_join_missing",
    "j4_containment_match",
    "j6_customer_revenue_topk",
    "j7_asof_latest_event",
    "j8_semi_join_selection",
    "j9_time_range_join",
    "n_normalize_pipeline",
    "sim_topk_bruteforce",
    "u1_union_dedupe",
    "u2_multistrategy_union",
    "u3_except_missing",
    "u4_intersect_common",
    "ud5_grouped_normalize",
    # --- oldest driver checks (r2) ---
    "a14_approx_distinct",
    "a15_approx_percentile_bounded",
    "a4_sum_group_sizes",
    "d5_embedding_cosine_neardup",
    "d5_ngram_jaccard_topk",
    "d6_semdedup_prune",
    "d8_crossdoc_ngram_coverage",
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
