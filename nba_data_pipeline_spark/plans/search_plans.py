"""Sparse-retrieval catalog queries (TA search family): inverted-index
TF-IDF cosine pairs, positional phrase search, and DSIR-style importance
weighting for target-distribution data selection.

These are the token-space complements of the embedding-space ``sim_*``
suite: candidate generation is always a posting-list equi-join (or an
in-situ array scan), never an all-pairs product, and every similarity /
importance value is rounded on both engines per the catalog's float
discipline.

Reference parity: the reference greps page text row-at-a-time for matchup
strings (nba_props_scraper.py:733-822 class of loops); this module is the
set-oriented form a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.operators.textops import ws_tokens
from nba_data_pipeline_spark.operators.totalorder import bounded_window
from nba_data_pipeline_spark.plans.registry import ROUND_DIGITS, query

#: Trigram shingles as retrieval terms: the documents corpus draws from a
#: ~50-word vocabulary, so unigrams/bigrams are near-ubiquitous (df ≈ n/2)
#: and their posting lists quadratic; trigram df is ~1.6 here, which is
#: the regime inverted-index joins are built for.
_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"

# tok and tf are MATERIALIZED: every consumer of this block uses tf at
# least twice (df + the weight join), and without materialization DuckDB
# re-inlines the tokenize + three-way positional self-join per consumer —
# at the 100x tiling that re-expansion spilled >68 GB of temp and died
# (same oracle-side defect class as the r6 ta_greedy_set_cover fix).
# Materialization mirrors the engine's own tf persist; values unchanged.
_SQL_TRI_TF = f"""
tok AS MATERIALIZED (
  SELECT doc_id, t.token, t.pos FROM (
    SELECT doc_id, unnest({_SQL_TOKS}) AS token,
           generate_subscripts({_SQL_TOKS}, 1) AS pos
    FROM documents) t(doc_id, token, pos)
),
tri AS (
  SELECT a.doc_id, a.token || ' ' || b.token || ' ' || c.token AS term
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
tf AS MATERIALIZED (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tri GROUP BY 1, 2)
"""

#: Posting lists longer than this fraction of the corpus are dropped from
#: pair generation — the standard "stop-shingle" guard that keeps the
#: inverted-index join linear when a term goes ubiquitous.
_DF_CAP_FRAC = 0.1
_COS_THRESHOLD = 0.1


def _trigrams(toks: str = "toks") -> F.Column:
    """Trigram shingle array from a token-array column, built in-plan with
    ``transform`` over an index sequence — no self-join, no Python."""
    return F.when(
        F.expr(f"size({toks})") >= 3,
        F.expr(
            f"transform(sequence(1, size({toks}) - 2), "
            f"i -> concat({toks}[i-1], ' ', {toks}[i], ' ', {toks}[i+1]))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


@query(
    "ta_sparse_cosine_pairs",
    oracle=f"""
WITH {_SQL_TRI_TF},
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
w AS MATERIALIZED (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE df.df <= {_DF_CAP_FRAC} * n.n_docs
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
dots AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         SUM(a.w * b.w) AS dot, CAST(COUNT(*) AS BIGINT) AS shared_terms
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.d1, d.d2, d.shared_terms,
       ROUND(d.dot / (na.nrm * nb.nrm), {ROUND_DIGITS}) AS cosine
FROM dots d
JOIN nrm na ON na.doc_id = d.d1
JOIN nrm nb ON nb.doc_id = d.d2
WHERE d.dot / (na.nrm * nb.nrm) >= {_COS_THRESHOLD}
ORDER BY d1, d2
""",
)
def ta_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs via an inverted-index join —
    the lexical-vector complement of d5_ngram_jaccard_topk (set overlap)
    and d5_embedding_cosine_neardup (dense vectors): cosine over trigram
    TF-IDF weights, candidates generated ONLY for documents sharing a
    posting list.

    Scale shape: tf and df are map-side-combined aggregates; the pair
    candidate mass is Σ df² over terms — bounded here by the df cap
    (posting lists above 10% of the corpus are dropped, the classic
    stop-shingle guard, zero-loss for any pair that also shares a rarer
    term); partial dot products combine per (d1, d2) before the final
    pair shuffle. Nothing is quadratic in the corpus."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # Terms travel as 64-bit hashes from birth (8-byte shuffle/join keys
    # instead of ~25-byte trigram strings — no output column carries the
    # term text, and tf/df are per-doc-distinct counts, so values are
    # unchanged under the same collision budget jaccard_pairs documents).
    tri = d.select("doc_id", F.explode(_trigrams()).alias("t0")).select(
        "doc_id", F.xxhash64("t0").alias("term")
    )
    # persist the contracted tf: it feeds BOTH the df re-aggregate and the
    # weight join, and column pruning makes the two subtrees non-identical
    # so ReuseExchange cannot share them — without this the tokenize +
    # explode pass runs twice. At 100 TB this is an explicit staging write.
    tf = tri.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = read_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") <= F.lit(_DF_CAP_FRAC) * F.col("n_docs"))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("w"),
        )
        # w feeds THREE consumers (norms + both inverted-index sides);
        # persist so the weight join builds once, not three times
        .persist()
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col("doc_id").alias("d1"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("d2"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    na = nrm.select(F.col("doc_id").alias("d1"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("d2"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(na, "d1")
        .join(nb, "d2")
        .filter(cos >= _COS_THRESHOLD)
        .select(
            "d1",
            "d2",
            "shared_terms",
            F.round(cos, ROUND_DIGITS).alias("cosine"),
        )
        .orderBy("d1", "d2")
    )


_PHRASE = ("a", "slow", "query")


@query(
    "ta_phrase_search",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, t.token, t.pos FROM (
    SELECT doc_id, unnest({_SQL_TOKS}) AS token,
           generate_subscripts({_SQL_TOKS}, 1) AS pos
    FROM documents) t(doc_id, token, pos)
),
hits AS (
  SELECT a.doc_id, a.pos
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
  WHERE a.token = '{_PHRASE[0]}' AND b.token = '{_PHRASE[1]}'
        AND c.token = '{_PHRASE[2]}'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(MIN(pos) AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id
ORDER BY doc_id
""",
)
def ta_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: every document containing the exact
    3-token phrase, with occurrence count and first (1-based) token
    position — the "exact quote" retrieval primitive (and the span-locator
    dedup/decontamination needs when a match must be excised, not just
    flagged).

    Scale shape: cheap-prefilter + exact-verify. The whitespace-normalized
    text equals the token array rejoined with single spaces, so a
    ``contains`` substring test is a guaranteed SUPERSET of token-adjacency
    matches (it can only over-match across token boundaries) — that one
    vectorized scan predicate discards ~99% of documents before any
    tokenization. Survivors get the exact in-plan position scan: a
    ``filter`` over an index sequence on the token array (no join, no
    Python). Measured 5.1 s → 0.2 s at sf0.1 vs running the per-position
    lambda on every document (the per-element lambda also must NOT contain
    a ``size(toks)`` guard — higher-order-function subexpressions are
    re-evaluated per element, which alone doubled the cost; the guard
    lives in a row-level filter instead). The DuckDB oracle cross-checks
    with the classic positional-index self-join formulation — same
    semantics, so the scan+verify path is verified against the index
    form."""
    w0, w1, w2 = _PHRASE
    phrase = f"{w0} {w1} {w2}"
    cand = (
        read_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("norm", F.regexp_replace(F.trim("text"), r"\s+", " "))
        .filter(F.col("norm").contains(phrase))
        .select("doc_id", ws_tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    positions = F.expr(
        "filter(sequence(1, size(toks) - 2), "
        f"i -> toks[i-1] = '{w0}' AND toks[i] = '{w1}' "
        f"AND toks[i+1] = '{w2}')"
    )
    return (
        cand.select("doc_id", positions.alias("pos"))
        .filter(F.size("pos") > 0)
        .select(
            "doc_id",
            F.size("pos").cast("long").alias("n_hits"),
            F.array_min("pos").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


#: DSIR hashed-feature space: 256 buckets addressed by the first hex
#: byte-pair of md5(bigram) — portable across Spark and DuckDB.
_DSIR_TOPK = 50


@query(
    "ta_dsir_importance",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, t.token, t.pos FROM (
    SELECT doc_id, lang, unnest({_SQL_TOKS}) AS token,
           generate_subscripts({_SQL_TOKS}, 1) AS pos
    FROM documents) t(doc_id, lang, token, pos)
),
big AS (
  SELECT a.doc_id, a.lang, substr(md5(a.token || ' ' || b.token), 1, 2) AS bucket
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_raw FROM big GROUP BY 1),
tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tgt FROM big
        WHERE lang = 'en' GROUP BY 1),
tot AS (
  SELECT (SELECT SUM(n_raw) FROM raw) AS raw_total,
         (SELECT COALESCE(SUM(n_tgt), 0) FROM tgt) AS tgt_total
),
lr AS (
  SELECT r.bucket,
         ln((COALESCE(t.n_tgt, 0) + 1.0) / (tot.tgt_total + 256.0))
           - ln((r.n_raw + 1.0) / (tot.raw_total + 256.0)) AS logratio
  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
),
scored AS (
  SELECT b.doc_id, b.lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         SUM(lr.logratio) / COUNT(*) AS imp
  FROM big b JOIN lr USING (bucket)
  GROUP BY 1, 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(imp, {ROUND_DIGITS}) DESC, doc_id)
            AS INT) AS rank,
       doc_id, lang, n_bigrams, ROUND(imp, {ROUND_DIGITS}) AS importance
FROM scored
ORDER BY rank
LIMIT {_DSIR_TOPK}
""",
)
def ta_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the mean hashed-bigram log-likelihood ratio between a target
    distribution (here the lang='en' slice) and the raw corpus, then keep
    the top-k — the principled form of "select data that looks like the
    target domain".

    Scale shape: the feature space is hashed to 256 buckets, so both
    distribution estimates are map-side-combined 256-row aggregates and
    the per-document scoring join is a broadcast of the 256-row log-ratio
    table — the corpus is scanned twice (estimate, score) and never
    shuffled on anything wider than the bucket id. Laplace smoothing
    (+1 / +256) keeps unseen buckets finite, exactly as the paper's
    hashed n-gram estimator prescribes. English documents scoring
    highest is the built-in sanity check the oracle hashes."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bigrams = F.when(
        F.expr("size(toks)") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> concat(toks[i-1], ' ', toks[i]))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    big = d.select("doc_id", "lang", F.explode(bigrams).alias("bg")).select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("bg").cast("binary")), 1, 2).alias("bucket"),
    )
    # Both distribution estimates come from ONE corpus aggregate (raw count
    # + conditional target count per bucket): the bigram explode + md5
    # pipeline has no common-subexpression reuse across separate
    # aggregates, so splitting raw/tgt into two groupBys re-ran it — this
    # single pass measured 19.5 s → 4.4 s at the 30× tiling (and the
    # 10×→30× step went superlinear → sublinear: 2.8 s → 4.4 s).
    bstats = big.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_tgt"),
    )
    totals = bstats.agg(
        F.sum("n_raw").alias("raw_total"),
        F.sum("n_tgt").alias("tgt_total"),
    )
    lr = (
        bstats.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("n_tgt") + F.lit(1.0))
                    / (F.col("tgt_total") + F.lit(256.0))
                )
                - F.log(
                    (F.col("n_raw") + F.lit(1.0))
                    / (F.col("raw_total") + F.lit(256.0))
                )
            ).alias("logratio"),
        )
    )
    scored = (
        big.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("logratio") / F.count(F.lit(1))).alias("imp"),
        )
    )
    # fixed-k top-k: orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition top-k + tiny driver merge — no global sort); the rank
    # label is then a bounded_window over the k surviving rows only.
    key = [F.desc(F.round(F.col("imp"), ROUND_DIGITS)), F.asc("doc_id")]
    topk = scored.orderBy(*key).limit(_DSIR_TOPK)
    wr = bounded_window(*key, anchor="doc_id")
    return topk.select(
        F.row_number().over(wr).cast("int").alias("rank"),
        "doc_id",
        "lang",
        "n_bigrams",
        F.round("imp", ROUND_DIGITS).alias("importance"),
    ).orderBy("rank")


#: BM25 query terms: bigram concepts with moderate df (the corpus's
#: unigrams are near-ubiquitous; bigram df ≈ 6% of docs gives positive,
#: discriminative IDF). Constants are the textbook k1/b.
_BM25_TERMS = ("slow query", "hash join", "fast scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@query(
    "ta_bm25_search",
    oracle=f"""
WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS term,
         len(toks) AS dl
  FROM d WHERE len(toks) >= 2
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, ANY_VALUE(dl) AS dl
  FROM big WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM big
  WHERE term IN {_BM25_TERMS!r} GROUP BY term
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(len(toks)) AS avgdl FROM d
),
scored AS (
  SELECT tf.doc_id,
         SUM(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                      + {_BM25_B} * tf.dl / s.avgdl)))
             AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(score, {ROUND_DIGITS}) DESC,
                               doc_id) AS INT) AS rank,
       doc_id, n_terms_hit, ROUND(score, {ROUND_DIGITS}) AS score
FROM scored
ORDER BY rank
LIMIT {_BM25_TOPK}
""",
)
def ta_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked keyword retrieval (Robertson-Spärck Jones; the Lucene
    default scorer's +1-smoothed IDF) for a 3-concept query over bigram
    terms — the ranked-list complement of ta_phrase_search's exact match:
    per-term saturation (k1) and document-length normalization (b) over
    posting-list hits only.

    Scale shape: the query-term filter lands BEFORE any aggregation, so
    tf touches only matching postings (at index-serving scale, an
    inverted-index table would make this a 3-key point lookup); df is a
    3-row aggregate, corpus stats a broadcast scalar, and the final top-k
    an ordered limit over docs that hit ≥1 term. The one full-corpus pass
    is the bigram generation — precisely what a materialized posting
    table eliminates."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bigrams = F.when(
        F.expr("size(toks)") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> concat(toks[i-1], ' ', toks[i]))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    big = (
        d.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode(bigrams).alias("term"),
        )
        .filter(F.col("term").isin(*_BM25_TERMS))
    )
    # persist the matching postings (3 query terms' worth — tiny) and
    # derive df from them: tf has exactly one row per (doc, term), so the
    # per-term row count IS the document frequency. Without this the
    # corpus bigram explode ran twice (once per aggregate — no
    # ReusedExchange across differently-pruned subtrees).
    tf = (
        big.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .persist()
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * F.col("tf") * F.lit(_BM25_K1 + 1.0) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (
            F.lit(1.0 - _BM25_B)
            + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(term_score).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    # fixed-k top-k via TakeOrderedAndProject; rank over the k-row sliver
    key = [F.desc(F.round(F.col("score"), ROUND_DIGITS)), F.asc("doc_id")]
    topk = scored.orderBy(*key).limit(_BM25_TOPK)
    wr = bounded_window(*key, anchor="doc_id")
    return topk.select(
        F.row_number().over(wr).cast("int").alias("rank"),
        "doc_id",
        "n_terms_hit",
        F.round("score", ROUND_DIGITS).alias("score"),
    ).orderBy("rank")


_KN_TOPK = 30


@query(
    "ta_kneser_ney_bigram",
    oracle=f"""
WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
big AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM d
        WHERE len(toks) >= 2)
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY 1, 2),
uc AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
              CAST(COUNT(*) AS BIGINT) AS n_follow
       FROM bc GROUP BY 1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_prec FROM bc GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM bc),
scored AS (
  SELECT bc.w1, bc.w2, bc.c, uc.cw1,
         (GREATEST(4 * bc.c - 3, 0) * 1.0 / (4 * uc.cw1))
           + (3.0 * uc.n_follow / (4 * uc.cw1))
             * (cont.n_prec * 1.0 / tot.n_types) AS p_kn
  FROM bc JOIN uc USING (w1) JOIN cont USING (w2) CROSS JOIN tot
)
SELECT w1, w2, c, cw1, ROUND(p_kn, 6) AS p_kn,
       CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w1, w2) AS INT) AS rank
FROM scored
ORDER BY c DESC, w1, w2
LIMIT {_KN_TOPK}
""",
)
def ta_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram language model (Kneser & Ney 1995; the
    standard n-gram smoothing) over the corpus, reported for the top-30
    bigrams: absolute discount D=3/4 applied in exact quarters
    (max(4c−3,0)/4c(w1)), back-off mass D·N₁₊(w1·)/c(w1), and the
    CONTINUATION probability N₁₊(·w2)/|bigram types| — the part that makes
    KN better than plain discounting (how many contexts a word completes,
    not how often it occurs). Complements ta_perplexity_score's unigram
    scorer with the real bigram estimator a quality-filter LM needs.

    Scale shape: three map-side-combined aggregates over the bigram
    stream (pair counts, per-prefix sums, per-suffix type counts) + one
    broadcast scalar; the scoring join runs on the COUNT tables, never
    the corpus. All model terms derive from exact integers; the assembled
    probability is rounded. The model tables are mergeable across shards
    (counts add), so incremental corpus growth updates it without
    rescanning."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bigrams = F.when(
        F.expr("size(toks)") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    big = d.select(F.explode(bigrams).alias("bg")).select("bg.w1", "bg.w2")
    # persist the contracted bigram-count table: it feeds FOUR consumers
    # (prefix sums, continuation counts, the type total, and the scoring
    # join) — without it the corpus bigram explode runs once per consumer
    # (plan showed 4 Generate nodes). |bigram types| rows, count-shaped.
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).persist()
    uc = bc.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    tot = bc.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = (
        F.greatest(4 * F.col("c") - 3, F.lit(0)) * F.lit(1.0) / (4 * F.col("cw1"))
    ) + (F.lit(3.0) * F.col("n_follow") / (4 * F.col("cw1"))) * (
        F.col("n_prec") * F.lit(1.0) / F.col("n_types")
    )
    # fixed-k top-k via TakeOrderedAndProject; rank over the k-row sliver
    key = [F.desc("c"), F.asc("w1"), F.asc("w2")]
    topk = (
        bc.join(F.broadcast(uc), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c", "cw1", F.round(p_kn, 6).alias("p_kn"))
        .orderBy(*key)
        .limit(_KN_TOPK)
    )
    wr = bounded_window(*key, anchor="w1")
    return topk.select(
        "w1",
        "w2",
        "c",
        "cw1",
        "p_kn",
        F.row_number().over(wr).cast("int").alias("rank"),
    ).orderBy(F.desc("c"), "w1", "w2")


_SC_ROUNDS = 5

# cov{r}/pick{r} are MATERIALIZED: each round's CTEs are referenced more
# than once (the NOT IN probe, the union fold, the coverage count), and
# without materialization DuckDB re-inlines the whole prior-round chain at
# every reference — an exponential re-expansion that at sf1 ran 700+ s and
# spilled the temp dir dry. Materialization makes the oracle evaluate each
# round exactly once, same as the engine's checkpoint-per-round discipline;
# results are identical.
_SC_SQL_ROUND = """
score{r} AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
  FROM sh WHERE s NOT IN (SELECT s FROM cov{p})
  GROUP BY doc_id
),
pick{r} AS MATERIALIZED (
  SELECT {r} AS round, doc_id, gain FROM score{r}
  ORDER BY gain DESC, doc_id LIMIT 1
),
cov{r} AS MATERIALIZED (
  SELECT s FROM cov{p}
  UNION
  SELECT sh.s FROM sh JOIN pick{r} USING (doc_id)
),
out{r} AS (
  SELECT p.round, p.doc_id, p.gain,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cov{r}) AS covered_after
  FROM pick{r} p
)"""


@query(
    "ta_greedy_set_cover",
    oracle=f"""
WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS s
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
        FROM d)
),
cov0 AS (SELECT s FROM sh WHERE 1 = 0),
{",".join(_SC_SQL_ROUND.format(r=r, p=r - 1) for r in range(1, _SC_ROUNDS + 1))}
SELECT * FROM ({" UNION ALL ".join(f"SELECT * FROM out{r}" for r in range(1, _SC_ROUNDS + 1))})
ORDER BY round
""",
)
def ta_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage corpus selection (the classic (1−1/e)
    submodular greedy): pick 5 documents that together cover the most
    distinct trigram shingles — the coverage-maximizing subset-selection
    primitive behind "choose a small, diverse eval/seed set from a huge
    corpus". Each round scores every document by its count of
    still-uncovered shingles, picks the argmax (doc_id tiebreak), and
    folds the winner's shingles into the covered set; output is one row
    per round with the marginal gain and cumulative coverage.

    Scale shape — iterate on the CONTRACTED representation: the
    (doc, shingle) incidence table is built once and checkpointed; each
    round is one anti-join (uncovered shingles) + one map-side-combined
    count + a 1-row argmax. The covered set is never materialized: it is
    BY CONSTRUCTION the shingle set of the picked docs, so each round
    anti-joins against ``sh ⋉ picks`` computed from the checkpointed
    incidence table and the (≤5-row, broadcast) pick list — and
    ``covered_after`` is the RUNNING SUM OF GAINS (each round's gain IS
    the count of newly covered shingles, an exact identity of greedy
    set cover), a 5-row window instead of a per-round distinct-union
    checkpoint + count join (r11: was 2 eager checkpoints + 1 count job
    per round; now 1 checkpoint per round — measured ~3.5 s → ~1.9 s at
    sf0.1). No driver-side collect anywhere. The DuckDB oracle unrolls
    the same 5 rounds as CTEs (with the explicit covered-set count), so
    every greedy decision, marginal gain, and the running coverage are
    value-checked."""
    sh = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
        # carry each trigram as its 64-bit hash from birth: the scoring
        # only ever DISTINCTs / anti-joins / counts shingles, so the
        # string form is dead weight in every shuffle (8-byte keys vs
        # ~25-byte trigrams; collision budget as on jaccard_pairs)
        .select("doc_id", F.explode(_trigrams()).alias("s0"))
        .select("doc_id", F.xxhash64("s0").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    picks = None
    for r in range(1, _SC_ROUNDS + 1):
        if picks is None:
            uncovered = sh
        else:
            covered = sh.join(
                F.broadcast(picks.select("doc_id")), "doc_id"
            ).select("s")
            # broadcast the covered side: it is ≤ picked-docs' shingles
            # (bounded by rounds × shingles-per-doc), and the size
            # estimate coming out of the join is too opaque for the
            # planner to see that — without the hint the anti-join
            # shuffles the whole incidence table every round
            uncovered = sh.join(F.broadcast(covered), "s", "left_anti")
        score = uncovered.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        pick = (
            score.orderBy(F.desc("gain"), "doc_id")
            .limit(1)
            .select(F.lit(r).alias("round"), "doc_id", "gain")
            .localCheckpoint()
        )
        picks = pick if picks is None else picks.unionByName(pick)
    # audited bounded frame: exactly _SC_ROUNDS rows enter this window
    wr = bounded_window("round", anchor="round").rowsBetween(
        W.unboundedPreceding, 0
    )
    return picks.withColumn(
        "covered_after", F.sum("gain").over(wr)
    ).orderBy("round")


@query(
    "ta_quantile_normalize",
    oracle="""
WITH gq_list AS (
  SELECT quantile_cont(n_chars, [0.0, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.3, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.4, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.6, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.7, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.8, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99, 1.0]) AS gqs FROM documents
),
grid AS (
  SELECT CAST(g.i - 1 AS INT) AS p, g.gq
  FROM gq_list, (SELECT unnest(gqs) AS gq,
                        generate_subscripts(gqs, 1) AS i
                 FROM gq_list) g(gq, i)
),
ranked AS (
  SELECT doc_id, source, n_chars,
         PERCENT_RANK() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS pr
  FROM documents
)
SELECT r.doc_id, r.source, r.n_chars,
       ROUND(r.pr, 6) AS pr,
       ROUND(g.gq, 4) AS normalized
FROM ranked r
JOIN grid g ON g.p = CAST(ROUND(r.pr * 100) AS INT)
ORDER BY r.doc_id
""",
)
def ta_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization — the batch-effect correction
    of corpus curation: each document's score (here n_chars) is replaced
    by the GLOBAL distribution's value at the document's within-source
    percentile, so per-source scale drift (one crawl's scorer runs hot)
    can't bias source mixing. The mapping table is a 101-point global
    quantile grid; each row joins to its nearest grid percentile.

    Scale shape: the grid is a 101-row broadcast built from one global
    percentile aggregate; within-source ranks are one (source)-clustered
    window; the normalization itself is a broadcast equi-join on the grid
    index. Nothing beyond the one rank shuffle touches the corpus twice.
    percent_rank is the exact rational (rank−1)/(n−1) with a doc_id
    tiebreak, so grid-index assignment is engine-identical."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pcts = ", ".join(str(p / 100.0) for p in range(101))
    grid = (
        d.agg(F.expr(f"percentile(n_chars, array({pcts}))").alias("gqs"))
        .select(F.posexplode("gqs").alias("p", "gq"))
    )
    wr = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "doc_id", "source", "n_chars", F.percent_rank().over(wr).alias("pr")
    )
    return (
        ranked.join(
            F.broadcast(grid),
            F.col("p") == F.round(F.col("pr") * 100).cast("int"),
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("pr", 6).alias("pr"),
            F.round("gq", 4).alias("normalized"),
        )
        .orderBy("doc_id")
    )


@query(
    "ta_ngram_novelty",
    oracle=f"""
WITH {_SQL_TRI_TF},
first_seen AS (
  SELECT term, CAST(MIN(doc_id) AS BIGINT) AS first_doc
  FROM tf GROUP BY term
),
per_doc AS (
  SELECT tf.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(COUNT(*) FILTER (WHERE fs.first_doc = tf.doc_id) AS BIGINT)
             AS n_novel
  FROM tf JOIN first_seen fs USING (term)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_terms, n_novel,
       ROUND(n_novel * 1.0 / n_terms, {ROUND_DIGITS}) AS novelty
FROM per_doc
ORDER BY doc_id
""",
)
def ta_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in arrival order (doc_id = ingest
    order): the fraction of a document's distinct trigrams whose first
    corpus occurrence is the document itself — the marginal-information
    signal behind curriculum ordering and diminishing-returns stopping
    ("the crawl's new pages contribute nothing new"), and the streaming
    counterpart of d8's corpus-level duplication coverage.

    Scale shape: first-occurrence is one map-side-combined MIN per term;
    the per-doc share is an equi-join of the doc-term table against that
    term summary followed by one count aggregate — all linear in distinct
    (doc, term) pairs. Incrementally, the first_seen table is exactly the
    band-index pattern of s11: new batches join against it and append
    their novel terms."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # persist the contracted doc-term table: it feeds BOTH the first-seen
    # MIN and the per-doc join, and without it the tokenize+explode pass
    # runs twice (plan showed 2 Generate nodes, no ReusedExchange).
    tf = (
        d.select("doc_id", F.explode(_trigrams()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    first_seen = tf.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        tf.join(first_seen, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_terms",
        "n_novel",
        F.round(F.col("n_novel") * F.lit(1.0) / F.col("n_terms"), ROUND_DIGITS).alias(
            "novelty"
        ),
    ).orderBy("doc_id")


_NB_SCALE = 10**9


@query(
    "ta_nb_train_classify",
    oracle=f"""
WITH d AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
train AS (SELECT * FROM d WHERE doc_id % 2 = 0),
test AS (SELECT * FROM d WHERE doc_id % 2 = 1),
tok AS (SELECT lang, unnest(toks) AS w FROM train),
counts AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok),
totals AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM counts GROUP BY 1),
ntrain AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train),
langs AS (
  SELECT t.lang,
         CAST(ROUND(ln(p.nd * 1.0 / nt.n) * {_NB_SCALE}) AS BIGINT)
             AS prior_s,
         CAST(ROUND(ln(1.0 / (t.tot + vb.v)) * {_NB_SCALE}) AS BIGINT)
             AS default_s,
         t.tot
  FROM totals t
  JOIN (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd FROM train GROUP BY 1) p
    USING (lang)
  CROSS JOIN ntrain nt CROSS JOIN vocab vb
),
model AS (
  SELECT c.lang, c.w,
         CAST(ROUND(ln((c.c + 1.0) / (t.tot + vb.v)) * {_NB_SCALE}) AS BIGINT)
             AS logp_s
  FROM counts c JOIN totals t USING (lang) CROSS JOIN vocab vb
),
ttok AS (SELECT doc_id, lang AS labeled, unnest(toks) AS w FROM test),
scoredtok AS (
  SELECT tt.doc_id, tt.labeled, lg.lang,
         COALESCE(m.logp_s, lg.default_s) AS term_s
  FROM ttok tt
  CROSS JOIN langs lg
  LEFT JOIN model m ON m.lang = lg.lang AND m.w = tt.w
),
docscore AS (
  SELECT s.doc_id, s.labeled, s.lang,
         lg.prior_s + SUM(s.term_s) AS score_s
  FROM scoredtok s JOIN langs lg ON lg.lang = s.lang
  GROUP BY s.doc_id, s.labeled, s.lang, lg.prior_s
),
pred AS (
  SELECT doc_id, labeled, lang AS predicted FROM (
    SELECT doc_id, labeled, lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score_s DESC, lang) AS rn
    FROM docscore
  ) WHERE rn = 1
)
SELECT labeled, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
ORDER BY labeled, predicted
""",
)
def ta_nb_train_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes TRAINED AND SERVED in-engine: the train split
    (doc_id%2=0) fits a multinomial NB over word unigrams (Laplace
    smoothing, log-priors); the test split is classified by the fitted
    model and the confusion matrix comes back — the full sklearn
    fit/predict loop as pure relational ops, completing the inference-only
    ta_quality_classifier and the heuristic ta_langid_confusion. Every
    log-probability is quantized to a 1e-9-scaled BIGINT at model-build
    time (the g1 integer-fixpoint trick), so per-document score sums are
    EXACT integers and the argmax can never flip on summation order —
    the property that makes a float-scored classifier oracle-checkable.

    Scale shape: the model is three broadcast-sized tables (per-class
    token counts, totals, priors — |V|·|classes| rows); serving is one
    explode + a broadcast model join + a per-(doc, class) integer sum +
    a per-doc argmax window. Training is two map-side-combined
    aggregates. Corpus scanned once per phase."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", ws_tokens(F.col("text")).alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    tok = train.select("lang", F.explode("toks").alias("w"))
    # persist the contracted per-class counts (|V|·|classes| rows): they
    # feed totals, the model, AND the vocab size; without this the train
    # tokenize+explode re-runs once per consumer (plan showed 8 Generate
    # nodes). vocab is derived from counts — same distinct-w set — so the
    # raw token stream has exactly one consumer.
    counts = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c")).persist()
    # The model-side scalars (per-lang token totals, global vocab size,
    # n_train) are WINDOW functions over the contracted tables, not
    # separate aggregate + crossJoin legs: every independent broadcast
    # subtree is a sequential AQE stage-job, and this query's cost at any
    # SF is almost pure job scheduling (42 jobs measured at sf0.1 for a
    # 155-row model). The windows run over the cached |V|·|classes|-row
    # counts / |classes|-row langs frames — trivially small by the scale
    # contract ("the model is broadcast-sized").
    wl = W.partitionBy("lang")
    wg = bounded_window(anchor="lang")  # audited: |V|·|classes|-row frame
    cstat = counts.withColumn("tot", F.sum("c").over(wl)).withColumn(
        "v", F.size(F.collect_set("w").over(wg)).cast("long")
    )
    priors = train.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    scale = F.lit(float(_NB_SCALE))
    langs = (
        cstat.groupBy("lang")
        .agg(F.any_value("tot").alias("tot"), F.any_value("v").alias("v"))
        .join(priors, "lang")
        .withColumn("n", F.sum("nd").over(bounded_window(anchor="lang")))
        .select(
            "lang",
            F.round(F.log(F.col("nd") * 1.0 / F.col("n")) * scale)
            .cast("long")
            .alias("prior_s"),
            F.round(F.log(1.0 / (F.col("tot") + F.col("v"))) * scale)
            .cast("long")
            .alias("default_s"),
        )
    )
    model = cstat.select(
        "lang",
        "w",
        F.round(F.log((F.col("c") + 1.0) / (F.col("tot") + F.col("v"))) * scale)
        .cast("long")
        .alias("logp_s"),
    )
    ttok = test.select(
        "doc_id", F.col("lang").alias("labeled"), F.explode("toks").alias("w")
    )
    # ONE langs broadcast carries default_s AND prior_s: the prior rides
    # the token rows into the map-side partial aggregate (8 bytes per
    # partial group), which deletes the second langs build and the
    # post-aggregate prior join entirely.
    scoredtok = (
        ttok.crossJoin(F.broadcast(langs))
        .join(F.broadcast(model), ["lang", "w"], "left")
        .select(
            "doc_id",
            "labeled",
            "lang",
            "prior_s",
            F.coalesce(F.col("logp_s"), F.col("default_s")).alias("term_s"),
        )
    )
    docscore = scoredtok.groupBy("doc_id", "labeled", "lang").agg(
        (F.any_value("prior_s") + F.sum("term_s")).alias("score_s")
    )
    wr = W.partitionBy("doc_id").orderBy(F.desc("score_s"), "lang")
    pred = (
        docscore.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("doc_id", "labeled", F.col("lang").alias("predicted"))
    )
    return (
        pred.groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("labeled", "predicted")
    )


@query(
    "ta_keyword_extract",
    oracle=f"""
WITH {_SQL_TRI_TF},
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, df, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY w DESC, term) AS rk
  FROM w
)
SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, df,
       ROUND(w, {ROUND_DIGITS}) AS tfidf
FROM ranked WHERE rk <= 3
ORDER BY doc_id, rk
""",
)
def ta_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TA: per-document keyword extraction — the top-3 trigram terms by
    TF-IDF per document (Sparck Jones 1972), the tagging/faceting step a
    corpus browser or a topic-drift monitor runs over every crawl
    increment. Complements ta_sparse_cosine_pairs (which uses the same
    weights to compare documents) by answering the per-document question:
    what is this one about?

    Scale shape: term stats reuse the inverted-index contraction — tf is
    one groupBy over exploded trigrams (map-side combinable), df a
    re-aggregate of tf, idf joins back on the term key (df is |vocab|-
    sized: a regular shuffle join, broadcast only the 1-row corpus
    count). The per-doc top-3 is a row_number window inside each doc's
    term list — WindowGroupLimit pushes the rank filter below the sort at
    scale. Ranking happens on the 6-digit-rounded weight with a term-name
    tiebreak, so cross-engine ln() ulp differences cannot reorder the
    cut."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("toks"))
    # persist the contracted tf: it feeds BOTH the df re-aggregate and the
    # weight join, and column pruning makes the two subtrees non-identical
    # so ReuseExchange cannot share them — without this the tokenize +
    # explode pass runs twice (measured 21 s -> see BENCH_sf1.md at 30x).
    # At 100 TB this is an explicit staging write of the inverted index.
    tf = (
        toks.select("doc_id", F.explode(_trigrams()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .persist()
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("w"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("w"), "term")
    )
    return (
        w.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
            "term",
            "tf",
            "df",
            F.round("w", ROUND_DIGITS).alias("tfidf"),
        )
        .orderBy("doc_id", "rk")
    )
