"""Round-3 operator tests: multi-partition CC label cardinality (regression
for the duplicate-pointer-row bug), Bloom probe semantics, UTF-8 sanitize
counts, HTTP-source fetch plumbing already covered in test_http_source."""

from __future__ import annotations

import os

SF_DIR = "/root/testdata/sf0.001"


def test_connected_components_one_label_row_per_node(spark):
    """Regression: a node whose edges hash into several partitions used to
    emit one label row per partition, which downstream per-component counts
    silently multiplied. Star graphs maximize cross-partition fan-out."""
    from nba_data_pipeline_spark.operators.graph import connected_components

    # hub 0 touches 30 spokes; spoke-keyed partitioning scatters the edges
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 31)], "src long, dst long"
    )
    rows = connected_components(edges, num_partitions=4).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)) == 31  # exactly one row per node
    assert {r.component_id for r in rows} == {0}


def test_connected_components_cutover_on_final_round_still_finishes(spark):
    """Regression (ADVICE r3): if the conflict graph drops below
    finish_threshold on the LAST sharded round, the single-partition
    finishing round must still run (outside the max_rounds budget) instead
    of raising 'did not converge'. A path graph across partitions needs at
    least one contraction round; max_rounds=1 + a huge threshold forces the
    cutover to fire exactly on that final budgeted round."""
    from nba_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40)], "src long, dst long"
    )
    rows = connected_components(
        edges, num_partitions=4, max_rounds=1, finish_threshold=2_000_000
    ).collect()
    assert len(rows) == 41
    assert {r.component_id for r in rows} == {0}


def test_connected_components_two_level_matches_general_loop(spark):
    """r12: the node_bound two-level path (sharded local DSU → single-task
    DSU over pointer rows as edges) must reach the exact fixpoint of the
    general contraction loop — same label rows on graphs that stress
    cross-partition merging: a long chain (diameter ≫ 1 round), a star
    (maximal pointer fan-out), and a multi-component mix. Also pins that
    the hint is only a fast path: past the bound the general loop runs."""
    import random

    from nba_data_pipeline_spark.operators.graph import connected_components

    rng = random.Random(12)
    cases = [
        [(i, i + 1) for i in range(60)],  # chain
        [(i, 0) for i in range(1, 31)],  # star
        [(i, i + 1) for i in range(20)]
        + [(100 + i, 100 + rng.randrange(i + 1)) for i in range(1, 25)]
        + [(500, 501)],  # mixed components, random attachment
    ]
    for rows in cases:
        edges = spark.createDataFrame(rows, "src long, dst long")
        general = {
            (r.doc_id, r.component_id)
            for r in connected_components(edges, num_partitions=4).collect()
        }
        two_level = {
            (r.doc_id, r.component_id)
            for r in connected_components(
                edges, num_partitions=4, node_bound=1000
            ).collect()
        }
        assert two_level == general
        # a bound past the threshold must route to the general loop and
        # still produce the same labels
        routed = {
            (r.doc_id, r.component_id)
            for r in connected_components(
                edges, num_partitions=4, node_bound=10**9
            ).collect()
        }
        assert routed == general


def test_bloom_url_dedup_flags_superset_of_blocklist(spark):
    """Bloom probes can false-positive but never false-negative: every truly
    blocked doc must be flagged, and flagged-but-not-blocked rows must carry
    false_positive=True."""
    from nba_data_pipeline_spark.plans.registry import load_all

    q = load_all()["ta_bloom_url_dedup"]
    rows = q.fn(spark, SF_DIR).collect()
    flagged = {r.doc_id: r for r in rows}
    # no false negatives: every %7 doc appears and is exact-blocked
    n_docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    for doc_id in range(0, n_docs, 7):
        assert doc_id in flagged
        assert flagged[doc_id].is_blocked
    for r in rows:
        assert r.bloom_hit
        assert r.false_positive == (not r.is_blocked)


def test_utf8_sanitize_counts(spark):
    from nba_data_pipeline_spark.plans.registry import load_all

    q = load_all()["ta_utf8_sanitize"]
    rows = {r.doc_id: r for r in q.fn(spark, SF_DIR).collect()}
    assert rows[0].n_ctrl == 3 and rows[0].n_replacement == 0
    assert rows[1].n_ctrl == 0 and rows[1].n_replacement == 2
    assert rows[2].n_ctrl == 3 and rows[2].n_replacement == 2
    assert rows[3].n_ctrl == 0 and rows[3].n_replacement == 0
    assert not rows[3].had_mojibake and rows[1].had_mojibake
    # cleaning is idempotent on already-clean docs
    assert rows[3].raw_len == rows[3].clean_len


def test_session_tmpdir_single_root_and_nested(tmp_path, monkeypatch):
    import nba_data_pipeline_spark.io as io_mod

    monkeypatch.setattr(io_mod, "_TMP_ROOT", None)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        a = io_mod.session_tmpdir("x_")
        b = io_mod.session_tmpdir("y_")
        assert os.path.dirname(a) == os.path.dirname(b)
        assert os.path.dirname(a).startswith(str(tmp_path))
        assert os.path.isdir(a) and os.path.isdir(b)
    finally:
        tempfile.tempdir = None


def test_winnowing_shared_run_guarantee(spark):
    """The winnowing guarantee (Schleimer et al. §3): two documents sharing
    a token run of length >= w + k - 1 share at least one fingerprint.
    Construct two docs overlapping in an 8-token run (w=4, k=3 → any
    shared 6-token run suffices) with distinct surroundings."""
    from nba_data_pipeline_spark.operators.textops import winnow_minima_fast
    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight nine {shared} ten eleven twelve"),
            (3, "completely different words everywhere nothing matches here at all"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: set(r.fp)
        for r in docs.select(
            "doc_id", winnow_minima_fast(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2], "docs sharing an 8-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnowing_too_short_doc_yields_no_fingerprints(spark):
    from nba_data_pipeline_spark.operators.textops import winnow_minima_fast
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "only five little words here"), (2, "a b")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", winnow_minima_fast(F.col("text")).alias("fp")
        ).collect()
    }
    # 5 tokens -> 3 kgrams < w=4 windows -> none; 2 tokens -> no kgrams
    assert out[1] == [] and out[2] == []


def test_salted_join_plan_has_no_shuffle_on_dim(spark):
    """j11's dim side must reach the join through a broadcast (replicated
    per salt), never an Exchange — the whole point of salting."""
    from nba_data_pipeline_spark.plans.registry import load_all

    df = load_all()["j11_salted_skew_join"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_entropy_quality_invariants(spark):
    """Shannon-entropy bounds: 0 <= H <= ln(n_tokens) (+5e-5 slack for the
    4-digit output rounding); TTR in (0, 1]; types never exceed tokens."""
    import math

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ta_entropy_quality"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.token_entropy <= math.log(r.n_tokens) + 5e-5
        assert 0 < r.ttr <= 1
        assert r.n_types <= r.n_tokens


def test_dup_chunk_ratio_invariants(spark):
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ta_dup_line_prefix"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert 0.0 <= r.dup_chunk_ratio <= 1.0


def test_cms_one_sided_error(spark):
    """CMS estimates can only overcount — never undercount."""
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["a20_cms_heavy_hitters"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.exact_count
        assert r.overcount == r.cms_estimate - r.exact_count


def test_domain_quota_caps_and_is_dense(spark):
    """Every source is capped at 10 and ranks are the dense prefix 1..k."""
    from collections import defaultdict

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ta_domain_quota_sample"].fn(spark, SF_DIR).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r.quota_rank)
    assert by_src
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10


def test_bloom_prefilter_no_false_negatives_and_reduces(spark):
    """Every build key survives the bloom gate; non-members are mostly cut."""
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )

    keys = spark.range(0, 200).select((F.col("id") * 7 + 3).alias("k"))
    probes = spark.range(0, 20000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", words=256)
    kept = bloom_prefilter(probes, "k", bloom, words=256)
    kept_set = {r.k for r in kept.collect()}
    member_set = {r.k for r in keys.collect() if r.k < 20000}
    # no false negatives: every true member in probe range survives
    assert member_set <= kept_set
    # the gate actually filters: survivors are a small superset of members
    # (256 words = 16384 bits over 200 keys -> FP rate well under 5%)
    assert len(kept_set) < len(member_set) + 0.05 * 20000


def test_bloom_probe_plan_is_broadcast_only(spark):
    """The probe side is never shuffled: all k word-joins broadcast."""
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    probes = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = bloom_prefilter(probes, "k", bloom_build(keys, "k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_single_hash_exchange(spark):
    """Both window passes of w9 share one shuffle on user_id; the only
    other exchange is the presentation orderBy's range partitioning."""
    from nba_data_pipeline_spark.plans.registry import load_all

    df = load_all()["w9_scd2_intervals"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_intervals_chain(spark):
    """Per user: versions are 1..n, intervals chain (valid_to == next
    valid_from), only the last interval is open-ended, and adjacent
    versions change state."""
    from collections import defaultdict

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["w9_scd2_intervals"].fn(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for vs in by_user.values():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state
        assert vs[-1].valid_to is None


def test_zorder_bounds_both_dimension_spans(spark):
    """The z-property: every file's span is <= 16 of 256 in BOTH
    dimensions (top 4+4 interleaved bits fix a 16x16 tile), so point
    predicates on either dimension prune >= 15/16 of files."""
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["lo1_zorder_layout"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.span_part <= 16
        assert 1 <= r.span_supp <= 16


def test_quality_classifier_buckets_nonempty_and_consistent(spark):
    """All three buckets appear across the corpus and per-bucket mean
    logits order as discard < review < keep."""
    from collections import defaultdict

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ta_quality_classifier"].fn(spark, SF_DIR).collect()
    agg = defaultdict(lambda: [0, 0.0])
    for r in rows:
        agg[r.bucket][0] += r.n_docs
        agg[r.bucket][1] += r.sum_logit
    assert set(agg) == {"keep", "review", "discard"}
    means = {b: s / n for b, (n, s) in agg.items()}
    assert means["discard"] < means["review"] < means["keep"]


def test_simhash_hamming_neighbor_index_exact(spark):
    """Brute-force signature-level Hamming-1 neighborhoods equal the
    flip-indexed result (flip indexing is exact for d=1, not heuristic)."""
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["d5_simhash_hamming_neighbors"].fn(spark, SF_DIR).collect()
    sigs = {r.simhash16: r for r in rows}
    assert sigs
    for sh, r in sigs.items():
        nb = [
            o
            for o in sigs
            if sum(a != b for a, b in zip(sh, o)) == 1
        ]
        assert r.n_neighbor_sigs == len(nb)
        assert r.n_neighbor_docs == sum(sigs[o].n_docs for o in nb)


def test_scd2_single_hash_exchange(spark):
    """Both window passes of w9 share one shuffle on user_id; the only
    other exchange is the presentation orderBy's range partitioning."""
    from nba_data_pipeline_spark.plans.registry import load_all

    df = load_all()["w9_scd2_intervals"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_intervals_chain(spark):
    """Per user: versions are 1..n, intervals chain (valid_to == next
    valid_from), only the last interval is open-ended, and adjacent
    versions change state."""
    from collections import defaultdict

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["w9_scd2_intervals"].fn(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for vs in by_user.values():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state
        assert vs[-1].valid_to is None


def test_zorder_bounds_both_dimension_spans(spark):
    """The z-property: every file's span is <= 16 of 256 in BOTH
    dimensions (top 4+4 interleaved bits fix a 16x16 tile), so point
    predicates on either dimension prune >= 15/16 of files."""
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["lo1_zorder_layout"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.span_part <= 16
        assert 1 <= r.span_supp <= 16


def test_quality_classifier_buckets_nonempty_and_consistent(spark):
    """All three buckets appear across the corpus and per-bucket mean
    logits order as discard < review < keep."""
    from collections import defaultdict

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ta_quality_classifier"].fn(spark, SF_DIR).collect()
    agg = defaultdict(lambda: [0, 0.0])
    for r in rows:
        agg[r.bucket][0] += r.n_docs
        agg[r.bucket][1] += r.sum_logit
    assert set(agg) == {"keep", "review", "discard"}
    means = {b: s / n for b, (n, s) in agg.items()}
    assert means["discard"] < means["review"] < means["keep"]


def test_compaction_bins_contiguous_and_sized(spark):
    """Within each partition: bins cover contiguous non-overlapping key
    ranges in order, and every bin but the last holds >= the 400-row
    target (the split rule can only overshoot, never undershoot)."""
    from collections import defaultdict

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["lo2_compaction_bins"].fn(spark, SF_DIR).collect()
    by_part = defaultdict(list)
    for r in rows:
        by_part[r.part].append(r)
    assert by_part
    for bins in by_part.values():
        bins.sort(key=lambda r: r.bin_id)
        assert [b.bin_id for b in bins] == list(range(len(bins)))
        for a, b in zip(bins, bins[1:]):
            assert a.last_file < b.first_file
        for b in bins[:-1]:
            assert b.total_rows >= 400


def test_pagerank_mass_and_ranks(spark):
    """Total PR mass stays within floor-loss of SCALE (each of 3 rounds
    drops < 1 unit per edge + per node), ranks are the dense 1..N."""
    from nba_data_pipeline_spark.plans.graph_plans import _SCALE
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["g1_pagerank_trade"].fn(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 1
    assert sorted(r.pr_rank for r in rows) == list(range(1, n + 1))
    total = sum(r.pr_scaled for r in rows)
    # floor losses: <= (edges + nodes + 1) units per iteration; bound loosely
    assert _SCALE * 0.98 <= total <= _SCALE
    # scores all positive and above the bare teleport floor
    base = (15 * _SCALE) // (100 * n)
    assert all(r.pr_scaled >= base for r in rows)


def test_cdc_merge_action_semantics(spark):
    """Updates never insert, deletes remove, upserts insert; every change
    key below the snapshot bound resolves to exactly one outcome."""
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["cdc_merge_apply"].fn(spark, SF_DIR).collect()
    by_key = {r.custkey: r for r in rows}
    assert len(by_key) == len(rows)  # merge never duplicates a key
    assert {r.action for r in rows} <= {"kept", "updated", "inserted"}
    # inserted rows exist only for keys absent from the snapshot (custkey
    # range [1, 150] is the snapshot domain; user_id 0 is outside it)
    for r in rows:
        if r.action == "inserted":
            assert r.mktsegment == "STREAM"


def test_incremental_join_terms_partition_the_join(spark):
    """The four delta-join terms are disjoint and their union is the full
    join (checked on counts per priority against a monolithic join)."""
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.registry import load_all

    inc = {
        (r.o_orderpriority): r.n_items
        for r in load_all()["j13_incremental_join_maintenance"]
        .fn(spark, SF_DIR)
        .collect()
    }
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    l = read_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    mono = {
        r.o_orderpriority: r.n
        for r in o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert inc == mono


def test_locf_gapfill_dense_and_carried(spark):
    """Each series is a dense daily grid; filled days carry the most
    recent observed value backward-contiguously."""
    from collections import defaultdict
    from datetime import timedelta

    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ts1_locf_gapfill"].fn(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        for a, b in zip(series, series[1:]):
            assert b.day - a.day == timedelta(days=1)  # dense grid
            if b.is_filled:
                assert b.value == a.value  # carried forward
        assert not series[0].is_filled  # grid starts at an observation


def test_ohlc_bars_order_and_bounds(spark):
    """low <= open/close <= high, and single-tick bars collapse."""
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["ts2_ohlc_bars"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        if r.n_ticks == 1:
            assert r.open == r.close == r.high == r.low


def test_histogram_partitions_all_orders(spark):
    """Bucket counts per priority sum to the priority's order count and
    buckets stay in [0, 19]."""
    from collections import Counter

    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["a23_equiwidth_histogram"].fn(spark, SF_DIR).collect()
    got = Counter()
    for r in rows:
        assert 0 <= r.bucket <= 19
        assert r.bucket_lo == 30000 * r.bucket
        got[r.o_orderpriority] += r.n_orders
    want = Counter(
        {
            r.o_orderpriority: r["count"]
            for r in read_table(spark, SF_DIR, "orders")
            .groupBy("o_orderpriority")
            .count()
            .collect()
        }
    )
    assert got == want


def test_cohort_retention_week_zero_counts_every_user(spark):
    """Offset-0 cells across cohorts sum to the distinct-user total (every
    user is active in their own signup week) and offsets are nonnegative."""
    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["a24_cohort_retention"].fn(spark, SF_DIR).collect()
    assert all(r.week_offset >= 0 for r in rows)
    week0 = sum(r.n_active_users for r in rows if r.week_offset == 0)
    n_users = (
        read_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert week0 == n_users


def test_deletion_neighborhood_matches_brute_force(spark):
    """The deletion-neighborhood index finds exactly the brute-force
    edit-distance-1 neighbor sets (the SymSpell candidate rule is exact
    for d<=1, not approximate)."""
    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.registry import load_all

    rows = load_all()["x23_deletion_neighborhood_join"].fn(spark, SF_DIR).collect()
    names = [r.c_name for r in read_table(spark, SF_DIR, "customer").collect()]

    def lev1(a, b):
        if a == b:
            return False
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    for r in rows:
        brute = sorted(b for b in names if lev1(r.name, b))
        assert r.n_neighbors == len(brute)
        assert r.closest == (brute[0] if brute else None)


def test_partitioned_parquet_scan_prunes_partitions(spark):
    """The snk8 read-back plan carries a PartitionFilters entry on the
    priority directory column — the filter never touches data files."""
    from nba_data_pipeline_spark.plans.registry import load_all

    df = load_all()["snk8_partitioned_parquet_roundtrip"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters:")[1][:200]
