"""Pathology tests for the round-2 training-pipeline operators: chunking
boundary shapes, quantization invariants, sessionization gap edges, and
split determinism/stability."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from nba_data_pipeline_spark.plans.registry import load_all

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    return load_all()[name]


# --- ta_chunk_overlap ------------------------------------------------------

def test_chunk_overlap_short_doc_single_chunk(spark):
    """A doc with <= 32 tokens yields exactly one chunk holding all tokens."""
    out = _q("ta_chunk_overlap").fn(spark, SF_DIR)
    short = out.filter((F.col("chunk_id") == 0) & (F.col("n_chunk_tokens") <= 32))
    assert short.count() > 0
    # every doc has a chunk 0
    docs = out.select("doc_id").distinct().count()
    zeros = out.filter(F.col("chunk_id") == 0).count()
    assert docs == zeros


def test_chunk_overlap_stride_and_coverage(spark):
    """Chunks start every 24 tokens and jointly cover every token index:
    with width 32 > stride 24, consecutive chunks overlap by 8 tokens and
    the last chunk always reaches the final token."""
    rows = (
        _q("ta_chunk_overlap")
        .fn(spark, SF_DIR)
        .groupBy("doc_id")
        .agg(
            F.max("chunk_id").alias("last_chunk"),
            F.sum("n_chunk_tokens").alias("sum_tokens"),
            F.max(
                F.lit(24) * F.col("chunk_id") + F.col("n_chunk_tokens")
            ).alias("max_end"),
        )
        .collect()
    )
    for r in rows:
        n = r.max_end  # the last chunk always ends at the final token
        # starts enumerate 0, 24, 48, ... — the last start must lie in [0, n)
        assert 0 <= 24 * r.last_chunk < n
        # chunk i covers [24i, min(24i+32, n)); recompute the exact total
        expected = sum(
            min(24 * i + 32, n) - 24 * i for i in range(r.last_chunk + 1)
        )
        assert r.sum_tokens == expected


def test_chunk_text_rejoins_to_window(spark):
    """chunk 0's text is the first min(32, n) whitespace tokens verbatim."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5).collect()
    out = (
        _q("ta_chunk_overlap")
        .fn(spark, SF_DIR)
        .filter(F.col("chunk_id") == 0)
        .collect()
    )
    by_id = {r.doc_id: r for r in out}
    for d in docs:
        toks = d.text.strip().split()
        assert by_id[d.doc_id].chunk_text == " ".join(toks[:32])


# --- sim_quantize_int8 -----------------------------------------------------

def test_quantize_codes_in_int8_range_and_err_bound(spark):
    out = _q("sim_quantize_int8").fn(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        codes = [int(c) for c in r.codes_csv.split(",")]
        assert len(codes) == 64
        assert all(-127 <= c <= 127 for c in codes)
        # symmetric quantization max error is scale/254 per dim; scales are
        # max |x| <= ~some bound; just assert the half-step property loosely
        assert r.max_abs_err >= 0


def test_quantize_error_halfstep(spark):
    """Reconstruction error never exceeds half a quantization step of the
    per-dimension scale (s/127/2 per dim, so <= max_s/254 overall)."""
    v = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "val")
    )
    max_s = v.groupBy("d").agg(F.max(F.abs("val")).alias("s")).agg(
        F.max("s")
    ).collect()[0][0]
    worst = (
        _q("sim_quantize_int8").fn(spark, SF_DIR).agg(F.max("max_abs_err")).collect()[0][0]
    )
    assert worst <= max_s / 127 / 2 + 1e-12


# --- w6_sessionize ---------------------------------------------------------

def test_sessionize_sessions_are_gap_separated(spark):
    """Within a user, consecutive sessions are separated by > 30 min, and
    session ids are dense starting at 1."""
    out = (
        _q("w6_sessionize")
        .fn(spark, SF_DIR)
        .orderBy("user_id", "session_id")
        .collect()
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in out:
        by_user[r.user_id].append(r)
    for user, sess in by_user.items():
        ids = [s.session_id for s in sess]
        assert ids == list(range(1, len(ids) + 1))
        for a, b in zip(sess, sess[1:]):
            gap_us = (b.session_start - a.session_start).total_seconds() * 1e6 - a.duration_us
            assert gap_us > 1800 * 1e6


def test_sessionize_event_count_conserved(spark):
    total = (
        _q("w6_sessionize").fn(spark, SF_DIR).agg(F.sum("n_events")).collect()[0][0]
    )
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total == raw


# --- ta_train_test_split ---------------------------------------------------

def test_split_deterministic_and_stable_under_growth(spark):
    """The same doc_id gets the same split at every scale factor — the
    defining property of hash-based splits (random sampling lacks it)."""
    a = {
        r.doc_id: r.split
        for r in _q("ta_train_test_split").fn(spark, SF_DIR).collect()
    }
    b = {
        r.doc_id: r.split
        for r in _q("ta_train_test_split")
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    }
    common = set(a) & set(b)
    assert common
    assert all(a[k] == b[k] for k in common)


def test_split_fractions_roughly_80_10_10(spark):
    rows = (
        _q("ta_train_test_split")
        .fn(spark, "/root/testdata/sf0.01")
        .groupBy("split")
        .count()
        .collect()
    )
    frac = {r["split"]: r["count"] for r in rows}
    n = sum(frac.values())
    assert 0.6 < frac["train"] / n < 0.95
    assert 0.02 < frac.get("val", 0) / n < 0.25
    assert 0.02 < frac.get("test", 0) / n < 0.25


# --- d6_semdedup_prune -----------------------------------------------------

def test_semdedup_one_rep_per_cluster_and_reps_never_dup(spark):
    rows = _q("d6_semdedup_prune").fn(spark, SF_DIR).collect()
    assert rows
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r.cid, []).append(r)
        # a representative is never a duplicate of itself
        if r.is_rep:
            assert not r.is_dup
    for cid, members in by_cid.items():
        assert sum(1 for m in members if m.is_rep) == 1
    # every vector appears exactly once (partition property of the dedup)
    assert len({r.vec_id for r in rows}) == len(rows)


# --- ta_global_shuffle_shard ----------------------------------------------

def test_shuffle_shard_is_permutation_with_dense_positions(spark):
    rows = _q("ta_global_shuffle_shard").fn(spark, SF_DIR).collect()
    assert rows
    # partition: every doc exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    # dense 1..n positions inside each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic across reruns
    again = {r.doc_id: (r.shard, r.pos) for r in _q("ta_global_shuffle_shard").fn(spark, SF_DIR).collect()}
    assert {r.doc_id: (r.shard, r.pos) for r in rows} == again


# --- w7_funnel_sequence ----------------------------------------------------

def test_funnel_conversions_bounded_by_purchases(spark):
    rows = _q("w7_funnel_sequence").fn(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.n_converted <= r.n_purchases for r in rows)


def test_funnel_detects_exact_chain(spark):
    """A hand-built chain converts; a broken chain (click before view,
    or step gap over the bound) does not."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, typ, hours):
        return Row(
            user_id=uid, event_id=i, ts=t0 + dt.timedelta(hours=hours), event_type=typ
        )

    rows = [
        # user 1: view → click(+1h) → purchase(+2h): converts
        ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "purchase", 2),
        # user 2: click → view → purchase: no view-before-click, no conversion
        ev(4, 2, "click", 0), ev(5, 2, "view", 1), ev(6, 2, "purchase", 2),
        # user 3: view → click(+30h, over bound) → purchase: no conversion
        ev(7, 3, "view", 0), ev(8, 3, "click", 30), ev(9, 3, "purchase", 31),
    ]
    df = spark.createDataFrame(rows)
    import nba_data_pipeline_spark.plans.windows as wmod
    import nba_data_pipeline_spark.io as iomod

    orig = iomod.read_table
    try:
        iomod.read_table = lambda s, d, n: df
        wmod.read_table = lambda s, d, n: df
        out = {r.user_id: r for r in _q("w7_funnel_sequence").fn(spark, SF_DIR).collect()}
    finally:
        iomod.read_table = orig
        wmod.read_table = orig
    assert out[1].n_converted == 1
    assert out[2].n_converted == 0
    assert out[3].n_converted == 0
