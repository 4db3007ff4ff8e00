"""Unit tests: dedup operators + text ops on tiny controlled docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    keep_first,
    shingle_sets,
)
from nba_data_pipeline_spark.operators.textops import (
    doc_fingerprint,
    predict_lang,
    token_count_bpe,
    token_count_ws,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, "ab"),  # fewer than 3 tokens -> no shingles
        ],
        ["doc_id", "text"],
    )


def test_word_shingles_edges(docs):
    out = {r.doc_id: r.sh for r in docs.select(
        "doc_id", word_shingles(F.col("text")).alias("sh")).collect()}
    assert out[1][0] == "the quick brown"
    assert len(out[1]) == 7
    assert out[4] == []


def test_jaccard_pairs(docs):
    sh = shingle_sets(docs)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(sh).collect()}
    # docs 1,2 share 6 of 7 shingles each -> jaccard 6/8
    assert abs(pairs[(1, 2)] - 6 / 8) < 1e-12
    assert (1, 3) not in pairs


def test_jaccard_pairs_hashed_sz_fast_path(docs):
    """r11: hashed_shingle_sets carries the per-doc distinct-shingle count
    map-side, and jaccard_pairs folds |A|/|B| into the intersection groupBy
    (no size aggregate, no join-backs). The fast path must agree with the
    string-relation fallback exactly, and the plan must evaluate the
    shingling UDF once (the size+explode duplication regression)."""
    from nba_data_pipeline_spark.operators.dedup import hashed_shingle_sets

    sh_h = hashed_shingle_sets(docs)
    assert set(sh_h.columns) == {"doc_id", "sz", "sh_h"}
    # one ArrowEvalPython: size() beside explode() must not clone the UDF
    plan = sh_h._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    # sz == the doc's distinct shingle count on every exploded row
    sizes = {
        (r.doc_id, r.sz) for r in sh_h.select("doc_id", "sz").distinct().collect()
    }
    assert sizes == {(1, 7), (2, 7), (3, 4)}  # doc 4 has no shingles
    fast = {
        (r.id_a, r.id_b): (r.inter, r.sz_a, r.sz_b, r.jaccard)
        for r in jaccard_pairs(sh_h).collect()
    }
    slow = {
        (r.id_a, r.id_b): (r.inter, r.sz_a, r.sz_b, r.jaccard)
        for r in jaccard_pairs(shingle_sets(docs)).collect()
    }
    assert fast == slow and (1, 2) in fast


def test_prefix_jaccard_pairs_matches_plain(spark):
    """The prefix-filtered miner must reproduce jaccard_pairs-at-threshold
    exactly for every slice count and r — the r-prefix filter is lossless
    and the slice partition is exact (near-dup cluster of 3, one pair,
    vocabulary-overlap decoys, an empty-shingle doc)."""
    from nba_data_pipeline_spark.operators.dedup import (
        hashed_shingle_sets,
        prefix_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox jumps over a lazy cat"),
            (4, "completely different words entirely here now"),
            (5, "completely different words entirely here too"),
            (6, "ab"),
            # decoy: shares vocabulary shingles with 1-3 but far below t
            (7, "the quick brown tortoise naps under a shady oak tree"),
        ],
        ["doc_id", "text"],
    )
    for t_num, t_den in ((1, 2), (1, 4)):
        want = {
            (r.id_a, r.id_b): (r.inter, r.jaccard)
            for r in jaccard_pairs(
                hashed_shingle_sets(docs), min_jaccard=t_num / t_den
            ).collect()
        }
        assert want, (t_num, t_den)  # fixture must actually produce pairs
        for n_slices in (1, 3):
            for r_ in (1, 2, 3):
                got = {
                    (row.id_a, row.id_b): (row.inter, row.jaccard)
                    for row in prefix_jaccard_pairs(
                        docs, t_num, t_den, n_slices=n_slices, r=r_
                    ).collect()
                }
                assert got == pytest.approx(want), (t_num, t_den, n_slices, r_)


def test_cc_slice_count_scales_with_corpus():
    from nba_data_pipeline_spark.plans.dedup import _cc_slice_count

    small = _cc_slice_count(10_000)
    big = _cc_slice_count(500_000_000)
    assert small >= 1
    assert big == 32  # capped
    assert _cc_slice_count(15_000_000) >= small


def test_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("j", 9, "z")],
        ["key", "ord", "val"],
    )
    out = {r.key: r.val for r in keep_first(df, ["key"], ["ord"]).collect()}
    assert out == {"k": "a", "j": "z"}


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta alpha")], ["doc_id", "text"]
    )
    fps = [r.fp for r in df.select(doc_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_token_counts(docs):
    row = docs.filter(F.col("doc_id") == 1).select(
        token_count_ws(F.col("text")).alias("ws"),
        token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert row.ws == 9
    assert row.bpe == 9


def test_predict_lang_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "der hund und die katze ist"),
         (3, "el perro y la casa es que")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang for r in df.select(
        "doc_id", predict_lang(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"


def test_connected_components_spans_partitions(spark):
    """A 40-node chain hash-sharded over 4 partitions must still collapse
    to one component (labels = min id), proving the contraction rounds
    merge across partition boundaries — the 100 TB path of the operator."""
    from nba_data_pipeline_spark.operators.graph import connected_components

    rows = [(i, i + 1) for i in range(39)] + [(100, 101), (101, 102)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    # finish_threshold=0 forbids the hybrid single-task finishing round, so
    # this exercises the pure sharded-contraction loop to its own fixpoint
    got = {
        r.doc_id: r.component_id
        for r in connected_components(
            edges, num_partitions=4, finish_threshold=0
        ).collect()
    }
    assert all(got[i] == 0 for i in range(40))
    assert got[100] == got[101] == got[102] == 100
    # the default hybrid cutover must reach the same fixpoint
    got2 = {
        r.doc_id: r.component_id
        for r in connected_components(edges, num_partitions=4).collect()
    }
    assert got2 == got


def test_connected_components_undirected_and_empty(spark):
    from nba_data_pipeline_spark.operators.graph import connected_components

    # reversed edge direction must not matter
    edges = spark.createDataFrame([(5, 2), (2, 9)], "src long, dst long")
    got = {
        r.doc_id: r.component_id
        for r in connected_components(edges, num_partitions=1).collect()
    }
    assert got == {2: 2, 5: 2, 9: 2}
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0
