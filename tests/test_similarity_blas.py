"""cosine_pairs_blas must agree exactly with the expression-fold pair miner
(the DuckDB-parity reference path) — including at thresholds engineered to
land inside the borderline re-score band."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.similarity import cosine, cosine_pairs_blas


def _fold_pairs(df, threshold):
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("e_a"), F.col("e_b")) >= threshold)
        .select("id_a", "id_b")
    )


def _mk_vectors(spark, n, dim, seed):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_blas_pairs_match_fold_pairs(spark):
    df = _mk_vectors(spark, 60, 16, seed=7)
    for threshold in (0.2, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b) for r in cosine_pairs_blas(df, threshold).collect()
        }
        want = {(r.id_a, r.id_b) for r in _fold_pairs(df, threshold).collect()}
        assert got == want


def test_blas_pairs_exact_threshold_boundary(spark):
    # Orthogonal / identical / opposite vectors: cosines exactly 0, 1, -1.
    # A threshold of exactly 1.0 must keep the identical pair (>= semantics)
    # and drop everything else; 0.0 must keep the orthogonal pair too.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [2.0, 0.0]),  # same direction as 0 -> cosine 1.0
        (3, [-1.0, 0.0]),  # opposite of 0 -> cosine -1.0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    at_one = {
        (r.id_a, r.id_b) for r in cosine_pairs_blas(df, 1.0).collect()
    }
    assert at_one == {(0, 2)}
    at_zero = {
        (r.id_a, r.id_b) for r in cosine_pairs_blas(df, 0.0).collect()
    }
    # id 3 is opposite to 0/2 (cosine -1, dropped) but orthogonal to 1.
    assert at_zero == {(0, 1), (0, 2), (1, 2), (1, 3)}


def test_blas_pairs_empty_when_nothing_similar(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert cosine_pairs_blas(df, 0.9).count() == 0


def test_blas_pairs_guard_rejects_fact_sized_frames(spark):
    """The driver-side materialization is capped MECHANICALLY: a frame past
    max_rows raises (naming the scale paths) instead of collecting — the
    VERDICT-r5 caveat that nothing stopped a fact-sized call."""
    import pytest

    df = _mk_vectors(spark, 12, 4, seed=5)
    with pytest.raises(ValueError, match="cosine_pairs_blocked"):
        cosine_pairs_blas(df, 0.5, max_rows=10)
    # at or under the cap the miner is untouched
    assert cosine_pairs_blas(df, 1.1, max_rows=12).count() == 0


def test_blocked_pairs_match_fold_pairs(spark):
    from nba_data_pipeline_spark.operators.similarity import cosine_pairs_blocked

    df = _mk_vectors(spark, 60, 16, seed=11)
    for threshold in (0.2, 0.5):
        got = {
            (r.id_a, r.id_b)
            for r in cosine_pairs_blocked(df, threshold, min_blocks=4).collect()
        }
        want = {(r.id_a, r.id_b) for r in _fold_pairs(df, threshold).collect()}
        assert got == want


def test_blocked_pairs_no_duplicates_across_tasks(spark):
    from nba_data_pipeline_spark.operators.similarity import cosine_pairs_blocked

    df = _mk_vectors(spark, 40, 8, seed=3)
    rows = cosine_pairs_blocked(df, 0.1, min_blocks=5).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)


def test_blocked_pairs_chunked_and_adaptive(spark, monkeypatch):
    """The sf10 OOM regression pin: with the sub-block target and matmul
    chunk forced far below the corpus size, B adapts past min_blocks and
    every similarity slab is a sliver — results must still equal the exact
    fold. (The fixed-B form put an (N/8)^2 float64 slab in every worker.)"""
    from nba_data_pipeline_spark.operators import similarity as simmod

    monkeypatch.setattr(simmod, "BLOCK_TARGET_ROWS", 10)
    monkeypatch.setattr(simmod, "MATMUL_CHUNK_ROWS", 3)
    df = _mk_vectors(spark, 64, 8, seed=7)
    got = {
        (r.id_a, r.id_b)
        for r in simmod.cosine_pairs_blocked(df, 0.3, min_blocks=2).collect()
    }
    want = {(r.id_a, r.id_b) for r in _fold_pairs(df, 0.3).collect()}
    assert got == want


def test_blocked_pairs_known_count_skips_sizing_scan(spark):
    """known_count sizes the grid without the count() job — and a wrong-ish
    count only changes balance, never pairs (bucket membership is decided
    by the hash, the grid by B)."""
    from nba_data_pipeline_spark.operators.similarity import cosine_pairs_blocked

    df = _mk_vectors(spark, 50, 8, seed=11)
    want = {(r.id_a, r.id_b) for r in _fold_pairs(df, 0.3).collect()}
    for kc in (50, 200):  # exact and stale-high snapshots
        got = {
            (r.id_a, r.id_b)
            for r in cosine_pairs_blocked(
                df, 0.3, min_blocks=3, known_count=kc
            ).collect()
        }
        assert got == want


def test_blocked_pairs_guard_rejects_corpus_sized_frames(spark):
    """Past MAX_COSINE_BLOCKS the O(N*B) replicate shuffle is the wrong
    tool; the miner must raise with bucket-first guidance instead of
    launching it (mirrors MAX_BLAS_BROADCAST_ROWS)."""
    import pytest

    from nba_data_pipeline_spark.operators import similarity as simmod

    df = _mk_vectors(spark, 10, 4, seed=1)
    n_too_big = (simmod.MAX_COSINE_BLOCKS + 1) * simmod.BLOCK_TARGET_ROWS
    with pytest.raises(ValueError, match="bucket candidates first"):
        simmod.cosine_pairs_blocked(df, 0.5, known_count=n_too_big)


def test_bucket_miner_chunked_matches_fold(spark, monkeypatch):
    """Same pin for the in-bucket gram miner: a chunk size far below the
    bucket size must not change the emitted pairs or their exact cosines."""
    from nba_data_pipeline_spark.operators import similarity as simmod

    monkeypatch.setattr(simmod, "MATMUL_CHUNK_ROWS", 5)
    df = _mk_vectors(spark, 48, 8, seed=13).withColumn(
        "bucket", (F.col("vec_id") % 3).cast("string")
    )
    got = {
        (r.id_a, r.id_b, r.bucket, round(r.cosine_sim, 12))
        for r in simmod.cosine_pairs_in_buckets(df, 0.2).collect()
    }
    fold = {
        (r.id_a, r.id_b, r.bucket, round(r.cosine_sim, 12))
        for r in (
            df.alias("a")
            .join(df.alias("b"), F.col("a.bucket") == F.col("b.bucket"))
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                F.col("a.bucket").alias("bucket"),
                simmod.cosine(
                    F.col("a.embedding"), F.col("b.embedding")
                ).alias("cosine_sim"),
            )
            .filter(F.col("cosine_sim") >= 0.2)
        ).collect()
    }
    assert got == fold


def test_num_planes_for_targets_bucket_cardinality():
    from nba_data_pipeline_spark.operators.similarity import num_planes_for

    assert num_planes_for(100) == 1          # tiny corpus: no real blocking
    assert num_planes_for(2000) == 4         # the sf0.1 fixture -> 16 buckets
    assert num_planes_for(1_000_000) == 13
    assert num_planes_for(1_000_000_000) == 23
    # contract: expected bucket size stays at or under the target
    for n in (2000, 10**6, 10**9):
        p = num_planes_for(n)
        assert n / (2**p) <= 125


def test_lsh_bucket_fanout_bounded(spark):
    """With planes sized by num_planes_for, no bucket should collect a
    disproportionate share of a (seeded, roughly isotropic) corpus — the
    guard that the in-bucket join can't go quadratic-in-corpus."""
    from nba_data_pipeline_spark.operators.similarity import (
        lsh_bucket,
        num_planes_for,
    )

    n, dim = 512, 16
    df = _mk_vectors(spark, n, dim, seed=23)
    p = num_planes_for(n, target_rows_per_bucket=64)
    counts = (
        df.select(lsh_bucket(F.col("embedding"), p, dim).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    biggest = max(r["count"] for r in counts)
    # expected 64 per bucket; allow generous skew headroom but forbid collapse
    assert biggest <= 4 * 64, f"bucket fan-out collapsed: max={biggest}"


def test_bucket_miner_guard_rejects_oversized_buckets(spark):
    # a bucket past MAX_LSH_BUCKET_ROWS means the plane count is mis-sized
    # for the corpus (in-bucket work is |bucket|^2 even though the chunked
    # gram bounds memory) — the miner must raise the actionable error, not
    # grind through ~10^10 decisions in one task (the sf100 failure mode)
    import pytest

    from nba_data_pipeline_spark.operators import similarity as sim
    from nba_data_pipeline_spark.operators.similarity import (
        cosine_pairs_in_buckets,
    )

    df = _mk_vectors(spark, 50, 4, seed=11).withColumn(
        "bucket", F.lit("b0")
    )
    # shrink the cap instead of building 100k+ rows: the guard compares
    # the per-group frame length against the module constant
    orig = sim.MAX_LSH_BUCKET_ROWS
    sim.MAX_LSH_BUCKET_ROWS = 10
    try:
        with pytest.raises(Exception, match="hyperplane count"):
            cosine_pairs_in_buckets(df, 0.25).collect()
    finally:
        sim.MAX_LSH_BUCKET_ROWS = orig
