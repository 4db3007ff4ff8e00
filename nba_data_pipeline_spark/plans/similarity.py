"""Similarity-search catalog queries over the ``embeddings`` table.

Brute-force cosine top-k (the correctness baseline), hyperplane-LSH
near-dup blocking, and IVF-style cell-probed search (the scale paths).
All dot products use the engine-stable double fold, so DuckDB verifies
every similarity value bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.operators.similarity import (
    cosine,
    dot,
    lsh_bucket,
    num_planes_for,
    sql_hyperplane_weights,
)
from nba_data_pipeline_spark.plans.registry import pinned_sort, query

DIM = 64
_SQL_COS = (
    "list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * "
    "sqrt(list_dot_product(b.e, b.e)))"
)


@query(
    "sim_topk_bruteforce",
    oracle=f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT e FROM v WHERE vec_id = 0)
SELECT a.vec_id, a.label,
       list_dot_product(a.e, b.e) /
           (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
           AS cosine_sim
FROM v a, q b
WHERE a.vec_id <> 0
ORDER BY cosine_sim DESC, a.vec_id
LIMIT 10
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for a query vector — the exact baseline
    every ANN variant is measured against. The query vector broadcasts; the
    scan side streams once; top-k is TakeOrdered (no global sort)."""
    v = read_table(spark, sf_dir, "embeddings")
    q = v.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("qvec")).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(10)
    )


# Plane count derived from the bucket-cardinality target: the largest
# fixture (sf0.1) holds 2k embedding rows, and num_planes_for(2000) = 4
# planes / 16 buckets keeps the expected bucket at ~125 rows. The oracle
# SQL bakes the same constant, so the knob resolves at import time; at
# real scale recompute from the corpus count (1e9 rows → ~23 planes) and
# band multiple tables for recall.
_NUM_PLANES = num_planes_for(2000)
_SQL_BUCKET_BITS = " || ".join(
    f"(CASE WHEN list_dot_product(e, {sql_hyperplane_weights(h)}) > 0 "
    "THEN '1' ELSE '0' END)"
    for h in range(_NUM_PLANES)
)


@query(
    "sim_lsh_neardup_pairs",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                  CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
b AS (SELECT vec_id, e, {_SQL_BUCKET_BITS} AS bucket FROM v)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
       {_SQL_COS} AS cosine_sim
FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_SQL_COS} >= 0.25
ORDER BY id_a, id_b
""",
)
def sim_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via hyperplane LSH: 4 deterministic ±1 hyperplanes
    → 16 buckets; candidate pairs share a bucket (never all-pairs); exact
    cosine ≥ 0.25 verifies. The 100 TB shape — bucket cardinality controls
    the fan-out.

    Verification runs as ``cosine_pairs_in_buckets``: one BLAS gram matrix
    per bucket group replaces the per-candidate-pair expression fold of the
    former bucket self-join (the measured hot spot — ~125k candidate folds
    at sf0.1, each allocating a 64-wide array); the sequential fold now
    runs only on emitted pairs, so output values remain bit-identical to
    the oracle's ``list_dot_product``."""
    from nba_data_pipeline_spark.operators.similarity import cosine_pairs_in_buckets

    v = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    b = v.withColumn("bucket", lsh_bucket(F.col("embedding"), _NUM_PLANES, DIM))
    # pinned: the range sampling would re-run the grouped-pandas mine lane
    return pinned_sort(cosine_pairs_in_buckets(b, 0.25), "id_a", "id_b")


_NUM_CENTROIDS = 8


@query(
    "sim_ivf_batch_topk",
    # Oracle plan note (r9, value-identical rewrite): the original CTE
    # carried the 64-dim DOUBLE[] payload THROUGH the per-vector assignment
    # window — at the 3000x tiling that is ~48M array-laden rows into one
    # window sort, which blew DuckDB past its memory cap into a 22 GB spill
    # cascade (the d9-defect-9 class, but oracle-side). The window now sorts
    # only skinny (vec_id, cid, s) rows; arrays join back AFTER assignment.
    # best is MATERIALIZED (referenced twice; the r8 G-family lesson).
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NUM_CENTROIDS}),
sims AS (
  SELECT a.vec_id, c.cid,
         list_dot_product(a.e, c.ce) /
         (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce))) AS s
  FROM v a, cent c
),
best AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
q AS (
  SELECT b.vec_id AS qid, b.cid AS qcid, v.e AS qe
  FROM best b JOIN v ON v.vec_id = b.vec_id
  WHERE b.vec_id < 100
),
scored AS (
  SELECT q.qid, m.vec_id AS neighbor_id,
         list_dot_product(q.qe, v.e) /
         (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(v.e, v.e)))
         AS cosine_sim
  FROM q
  JOIN best m ON m.cid = q.qcid AND m.vec_id <> q.qid
  JOIN v ON v.vec_id = m.vec_id
)
SELECT qid, neighbor_id, cosine_sim, rnk FROM (
  SELECT qid, neighbor_id, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rnk
  FROM scored
) WHERE rnk <= 5
ORDER BY qid, rnk
""",
)
def sim_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN — the realistic serving shape: the first 100 vectors act
    as a query batch; each probes only its own IVF cell (equi-join on cell
    id, never all-pairs) and keeps its 5 nearest neighbors by exact cosine.
    At 100 TB the cell id is the partitioning key, so the probe join
    co-locates each query batch with exactly the shards it scans, and the
    per-query top-k is a bounded window inside the cell."""
    from pyspark.sql import Window as W

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).withColumn("vnorm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    cent = v.filter(F.col("vec_id") < _NUM_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "sim",
        dot(F.col("embedding"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")),
    )
    aw = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "vnorm", "cid")
    )
    q = assigned.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        F.col("cid").alias("qcid"),
    )
    probed = (
        assigned.join(F.broadcast(q), (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("qid")))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qvec"), F.col("embedding")) / (F.col("qnorm") * F.col("vnorm"))).alias(
                "cosine_sim"
            ),
        )
    )
    kw = W.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        probed.withColumn("rnk", F.row_number().over(kw).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("qid", "neighbor_id", "cosine_sim", "rnk")
        .orderBy("qid", "rnk")
    )


_SQL_ASSIGN = """
  SELECT vec_id, cid FROM (
    SELECT a.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.e, c.ce) /
                      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce)))
                      DESC, c.cid) AS rn
    FROM v a, {cent} c
  ) WHERE rn = 1
"""


@query(
    "sim_kmeans_train",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NUM_CENTROIDS}),
a1 AS ({_SQL_ASSIGN.format(cent="c0")}),
x AS (SELECT vec_id, r.range AS d, e[CAST(r.range + 1 AS INT)] AS val
      FROM v, range({DIM}) r),
m AS (
  SELECT a1.cid, x.d,
         CAST(SUM(CAST(x.val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mval
  FROM x JOIN a1 USING (vec_id)
  GROUP BY a1.cid, x.d
),
c1 AS (SELECT cid, list(mval ORDER BY d) AS ce FROM m GROUP BY cid),
a2 AS ({_SQL_ASSIGN.format(cent="c1")})
SELECT a1.vec_id, a1.cid AS cid_r1, a2.cid AS cid_r2, a1.cid <> a2.cid AS moved
FROM a1 JOIN a2 USING (vec_id)
ORDER BY a1.vec_id
""",
)
def sim_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index TRAINING: one full Lloyd round of k-means (assign → exact
    centroid update → reassign), k = 8, deterministic init from the first k
    vectors. This is the operator that produces the centroids the
    ``sim_ivf_*`` queries consume; output is each vector's cluster before
    and after the update plus whether it moved (the convergence signal a
    training loop monitors).

    Spark-first shape per iteration: centroids BROADCAST to the assignment
    (one streaming pass, bounded per-vector window for the argmax), then
    the update explodes vectors to (vec_id, dim, val) and aggregates
    per (cluster, dim) — two map-side-combined shuffles, linear in
    corpus × dim, no pairwise work. Centroid means follow the
    ``plans/exact.py`` decimal-sum discipline (DECIMAL(38,12) sums,
    double division), so the updated centroids — and therefore every
    round-2 cosine and assignment — are bit-identical across engines
    regardless of summation order. At 100 TB: iterations are fixed-count
    jobs with the label frame checkpointed between rounds; the explode is
    the standard per-dimension agg shape and AQE coalesces the (k × dim)
    result.
    """
    from pyspark.sql import Window as W

    v = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("vnorm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    )

    def assign(vecs: DataFrame, cent: DataFrame) -> DataFrame:
        w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
        return (
            vecs.crossJoin(F.broadcast(cent))
            .withColumn(
                "sim",
                dot(F.col("embedding"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )

    c0 = v.filter(F.col("vec_id") < _NUM_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    a1 = assign(v, c0).persist()

    x = v.select("vec_id", F.posexplode("embedding").alias("d", "val"))
    m = (
        x.join(a1, "vec_id")
        .groupBy("cid", "d")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mval")
        )
    )
    c1 = (
        m.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "mval"))), lambda s: s.mval
            ).alias("cvec")
        )
        .withColumn("cnorm", F.sqrt(dot(F.col("cvec"), F.col("cvec"))))
    )
    a2 = assign(v, c1)
    return (
        a1.withColumnRenamed("cid", "cid_r1")
        .join(a2.withColumnRenamed("cid", "cid_r2"), "vec_id")
        .select(
            "vec_id", "cid_r1", "cid_r2",
            (F.col("cid_r1") != F.col("cid_r2")).alias("moved"),
        )
        .orderBy("vec_id")
    )


@query(
    "sim_ivf_probe1",
    oracle=f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NUM_CENTROIDS}),
assigned AS (
  SELECT vec_id, label, e, cid FROM (
    SELECT a.vec_id, a.label, a.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.e, c.ce) /
                      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce)))
                      DESC, c.cid
           ) AS rn
    FROM v a, cent c
  ) WHERE rn = 1
),
qcell AS (SELECT cid FROM assigned WHERE vec_id = 0),
q AS (SELECT e FROM v WHERE vec_id = 0)
SELECT a.vec_id, a.label, a.cid AS cell,
       {_SQL_COS} AS cosine_sim
FROM assigned a, q b
WHERE a.cid = (SELECT cid FROM qcell) AND a.vec_id <> 0
ORDER BY cosine_sim DESC, a.vec_id
LIMIT 5
""",
)
def sim_ivf_probe1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with nprobe=1: the first 8 vectors act as deterministic
    centroids; every vector is assigned to its max-cosine centroid; the
    search scans only the query's cell. At scale: centroids broadcast,
    assignment is one pass, cells are the partitioning key."""
    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).withColumn("vnorm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    cent = v.filter(F.col("vec_id") < _NUM_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    from pyspark.sql import Window as W

    # Norms precomputed per side: each (vector, centroid) pair costs one
    # dot-fold, not three (the naive cosine recomputes both self-dots per
    # pair — 2× 8 centroids of redundant folds per vector).
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "sim",
        dot(F.col("embedding"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "cid")
    )
    qcell = assigned.filter(F.col("vec_id") == 0).select(
        F.col("cid").alias("qcid"), F.col("embedding").alias("qvec")
    )
    return (
        assigned.crossJoin(F.broadcast(qcell))
        .filter((F.col("cid") == F.col("qcid")) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            "label",
            F.col("cid").alias("cell"),
            cosine(F.col("embedding"), F.col("qvec")).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(5)
    )


_SQL_ASSIGNED_FULL = f"""
  SELECT vec_id, e, cid FROM (
    SELECT a.vec_id, a.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.e, c.ce) /
                      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce)))
                      DESC, c.cid
           ) AS rn
    FROM v a, cent c
  ) WHERE rn = 1
"""


@query(
    "sim_recall_eval",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NUM_CENTROIDS}),
assigned AS ({_SQL_ASSIGNED_FULL}),
q AS (SELECT vec_id AS qid, e AS qe, cid AS qcid FROM assigned WHERE vec_id < 20),
gt AS (
  SELECT qid, nb FROM (
    SELECT q.qid, a.vec_id AS nb,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
             list_dot_product(q.qe, a.e) /
             (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(a.e, a.e)))
             DESC, a.vec_id) AS rnk
    FROM q, v a WHERE a.vec_id <> q.qid
  ) WHERE rnk <= 10
),
ann AS (
  SELECT qid, nb FROM (
    SELECT q.qid, a.vec_id AS nb,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
             list_dot_product(q.qe, a.e) /
             (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(a.e, a.e)))
             DESC, a.vec_id) AS rnk
    FROM q JOIN assigned a ON a.cid = q.qcid AND a.vec_id <> q.qid
  ) WHERE rnk <= 10
),
hits AS (
  SELECT gt.qid, COUNT(*) AS h
  FROM gt JOIN ann ON ann.qid = gt.qid AND ann.nb = gt.nb
  GROUP BY gt.qid
)
SELECT q.qid, CAST(COALESCE(hits.h, 0) AS INT) AS n_hits,
       CAST(COALESCE(hits.h, 0) AS DOUBLE) / 10.0 AS recall_at_10
FROM q LEFT JOIN hits ON hits.qid = q.qid
ORDER BY q.qid
""",
)
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate: recall@10 of the IVF probe-1 index against the
    exact brute-force ground truth, per query, over a 20-query eval batch.
    This is the operator a production vector pipeline runs after every
    index (re)build — if recall drifts below target, raise nprobe or
    retrain centroids (``sim_kmeans_train``).

    Scale shape: ground truth is computed only for the bounded eval batch
    (queries BROADCAST against one streaming pass of the corpus — at 100 TB
    recall eval is always sample-based, never all-pairs), the ANN side is
    the same cell-equi-join the serving path uses, and the hit count is a
    broadcast-able join of two ≤(batch×k) row sets."""
    from pyspark.sql import Window as W

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).withColumn("vnorm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    cent = v.filter(F.col("vec_id") < _NUM_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    aw = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    # persist the assignment table: it feeds the eval-batch slice, the ANN
    # candidate join, and (through q) the ground-truth pass — uncached,
    # the corpus×centroid assignment cross-join re-ran per consumer. At
    # index scale this IS the materialized IVF assignment table.
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .withColumn(
            "sim",
            dot(F.col("embedding"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")),
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "vnorm", "cid")
        .persist()
    )
    q = assigned.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        F.col("cid").alias("qcid"),
    )
    kw = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nb"))
    gt = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nb"),
            (dot(F.col("embedding"), F.col("qvec")) / (F.col("vnorm") * F.col("qnorm"))).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(kw))
        .filter(F.col("rnk") <= 10)
        .select("qid", "nb")
    )
    ann = (
        assigned.join(
            F.broadcast(q),
            (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            F.col("vec_id").alias("nb"),
            (dot(F.col("embedding"), F.col("qvec")) / (F.col("vnorm") * F.col("qnorm"))).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(kw))
        .filter(F.col("rnk") <= 10)
        .select("qid", "nb")
    )
    hits = gt.join(ann, ["qid", "nb"]).groupBy("qid").agg(F.count("*").alias("h"))
    return (
        q.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("h"), F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce(F.col("h"), F.lit(0)).cast("double") / F.lit(10.0)).alias(
                "recall_at_10"
            ),
        )
        .orderBy("qid")
    )


@query(
    "sim_quantize_int8",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
x AS (SELECT vec_id, r.range AS d, e[CAST(r.range + 1 AS INT)] AS val
      FROM v, range({DIM}) r),
sc AS (SELECT d, MAX(ABS(val)) AS s FROM x GROUP BY d),
c AS (
  SELECT x.vec_id, x.d, sc.s, x.val,
         CASE WHEN sc.s = 0 THEN 0
              ELSE CAST(ROUND(x.val / sc.s * 127) AS INT) END AS code
  FROM x JOIN sc USING (d)
)
SELECT vec_id,
       array_to_string(list(code ORDER BY d), ',') AS codes_csv,
       MAX(ABS(val - code * s / 127.0)) AS max_abs_err
FROM c GROUP BY vec_id ORDER BY vec_id
""",
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding table —
    the 4× memory/IO compression step a 100 TB vector corpus applies before
    ANN serving (scan int8 codes, rescale on the fly). Two passes, both
    linear: (1) a stats pass — posexplode to (dim, val) and a 64-group
    map-side-combined max(|x|) aggregate; (2) an encode pass — the 64
    scales collapse to one broadcast array row and each vector quantizes
    inside a single JVM ``transform`` projection, no shuffle. Output is the
    deterministic code string plus the exact max reconstruction error
    (identical IEEE op order on both engines — no rounding needed)."""
    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    x = v.select(F.posexplode("e").alias("d", "val"))
    sc = x.groupBy("d").agg(F.max(F.abs(F.col("val"))).alias("s"))
    sarr = sc.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "s"))), lambda t: t["s"]
        ).alias("sc")
    )
    coded = v.crossJoin(F.broadcast(sarr)).withColumn(
        "codes",
        F.transform(
            "e",
            lambda val, i: F.when(F.get("sc", i) == 0, F.lit(0)).otherwise(
                F.round(val / F.get("sc", i) * 127).cast("int")
            ),
        ),
    )
    return (
        coded.withColumn(
            "err",
            F.array_max(
                F.transform(
                    "e",
                    lambda val, i: F.abs(
                        val
                        - F.get("codes", i).cast("double") * F.get("sc", i) / F.lit(127.0)
                    ),
                )
            ),
        )
        .select(
            "vec_id",
            F.array_join(F.col("codes").cast("array<string>"), ",").alias("codes_csv"),
            F.col("err").alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# D6: SemDeDup-style semantic dedup — cluster, then prune against the
# cluster representative (Abbas et al. 2023, "SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication").
# ---------------------------------------------------------------------------

# Tuned to the synthetic fixture's cosine distribution (p90 ≈ 0.28,
# p97 ≈ 0.33 against the representative): marks ~7% of members as
# semantic dups. Production corpora recalibrate against their own
# similarity histogram (the paper uses 0.95+ on real embeddings).
_SEMDEDUP_THRESH = 0.3

_SQL_COS_VC = (
    "list_dot_product(v.e, c.ce) / "
    "(sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce)))"
)
_SQL_COS_AR = (
    "list_dot_product(av.e, rv.e) / "
    "(sqrt(list_dot_product(av.e, av.e)) * sqrt(list_dot_product(rv.e, rv.e)))"
)


@query(
    "d6_semdedup_prune",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NUM_CENTROIDS}),
s AS (
  SELECT v.vec_id, c.cid, {_SQL_COS_VC} AS sim,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {_SQL_COS_VC} DESC, c.cid) AS rn
  FROM v CROSS JOIN c
),
a AS (SELECT vec_id, cid, sim FROM s WHERE rn = 1),
r AS (
  SELECT cid, vec_id AS rep_id FROM (
    SELECT cid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY cid ORDER BY sim DESC, vec_id) AS rn
    FROM a
  ) WHERE rn = 1
)
SELECT a.vec_id, a.cid, a.vec_id = r.rep_id AS is_rep,
       {_SQL_COS_AR} AS sim_to_rep,
       (a.vec_id <> r.rep_id AND {_SQL_COS_AR} >= {_SEMDEDUP_THRESH}) AS is_dup
FROM a JOIN r ON a.cid = r.cid
JOIN v av ON av.vec_id = a.vec_id
JOIN v rv ON rv.vec_id = r.rep_id
ORDER BY a.vec_id
""",
)
def d6_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: SemDeDup semantic dedup, scalable variant — assign every
    embedding to its nearest centroid (deterministic init: first k vectors,
    same centroids the IVF index uses), elect one representative per
    cluster (max cosine-to-centroid, vec_id tiebreak), and mark any member
    whose cosine to its cluster REPRESENTATIVE clears the threshold as a
    semantic duplicate.

    Spark-first shape: centroids and the k-row representative frame both
    BROADCAST, so the whole query is two streaming passes over the corpus
    plus one k-sized shuffle for the election — corpus × k work, never
    pairwise. (The paper's exact form compares all pairs within a cluster;
    compare-to-representative keeps the recall that matters at a linear
    cost, the same reduction the exact miner's per-bucket BLAS path uses.)
    Every cosine uses the engine-stable double fold, so DuckDB verifies
    each similarity and the threshold decision bitwise."""
    from pyspark.sql import Window as W

    v = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("vnorm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    )
    cent = v.filter(F.col("vec_id") < _NUM_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    pick = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .withColumn(
            "sim", dot(F.col("embedding"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm"))
        )
        .withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "vnorm", "cid", "sim")
    )
    elect = W.partitionBy("cid").orderBy(F.desc("sim"), F.asc("vec_id"))
    reps = (
        assigned.withColumn("rrn", F.row_number().over(elect))
        .filter(F.col("rrn") == 1)
        .select(
            "cid",
            F.col("vec_id").alias("rep_id"),
            F.col("embedding").alias("rvec"),
            F.col("vnorm").alias("rnorm"),
        )
    )
    sim_to_rep = dot(F.col("embedding"), F.col("rvec")) / (
        F.col("vnorm") * F.col("rnorm")
    )
    return (
        assigned.join(F.broadcast(reps), "cid")
        .withColumn("sim_to_rep", sim_to_rep)
        .select(
            "vec_id",
            "cid",
            (F.col("vec_id") == F.col("rep_id")).alias("is_rep"),
            "sim_to_rep",
            (
                (F.col("vec_id") != F.col("rep_id"))
                & (F.col("sim_to_rep") >= F.lit(_SEMDEDUP_THRESH))
            ).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Product quantization: codebook training + ADC top-k serving
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_SUB = DIM // _PQ_M  # dims per subspace
_PQ_K = 4  # centroids per subspace
_PQ_NQ = 5  # serving queries in sim_pq_topk

# Shared SQL prelude: per-(vector, subspace) slices and the seed codebook
# (subvectors of the first K vectors — deterministic init, as in
# sim_kmeans_train). dist2 uses the identical double op order both engines
# execute: dp(x,x) - 2*dp(x,c) + dp(c,c).
_SQL_PQ_BASE = f"""
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
sub AS (
  SELECT vec_id, m.range AS m,
         list_slice(e, m.range * {_PQ_SUB} + 1, m.range * {_PQ_SUB} + {_PQ_SUB}) AS sv
  FROM v, range({_PQ_M}) m
),
c0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {_PQ_K}),
asg AS (
  SELECT m, vec_id, cid FROM (
    SELECT s.m, s.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY s.m, s.vec_id
             ORDER BY list_dot_product(s.sv, s.sv)
                      - 2 * list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv), c.cid
           ) AS rn
    FROM sub s JOIN c0 c USING (m)
  ) WHERE rn = 1
)"""


@query(
    "sim_pq_codebook",
    oracle=f"""
WITH {_SQL_PQ_BASE},
x AS (SELECT m, vec_id, r.range AS d, sv[CAST(r.range + 1 AS INT)] AS val
      FROM sub, range({_PQ_SUB}) r)
SELECT CAST(a.m AS INT) AS subspace, a.cid, CAST(x.d AS INT) AS d,
       CAST(SUM(CAST(x.val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mval,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM x JOIN asg a ON x.m = a.m AND x.vec_id = a.vec_id
GROUP BY a.m, a.cid, x.d
ORDER BY subspace, cid, d
""",
)
def sim_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook TRAINING: split the 64-dim space into
    M=8 subspaces of 8 dims, assign every subvector to its nearest of K=4
    seed centroids (L2, deterministic init = first K vectors' subvectors,
    ties to the lower cid), and run one exact Lloyd update — the per-
    (subspace, centroid, dim) means that become the trained codebook.
    PQ is how a 100 TB vector corpus compresses 256 B/vector to M bytes:
    this query is the training half, ``sim_pq_topk`` the serving half.

    Spark-first shape: the codebook (M×K subvectors) BROADCASTS into the
    assignment join — one streaming pass over (vector, subspace) rows with
    a bounded per-key window for the argmin; the update is a posexplode +
    one map-side-combined aggregate on (subspace, cid, dim) — k-means'
    canonical two-shuffle round, linear in corpus × dim. Centroid means
    are decimal-summed (exact.py discipline) so every mval is bit-identical
    across engines."""
    from pyspark.sql import Window as W

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sub = v.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("e", m * _PQ_SUB + 1, _PQ_SUB).alias("sv"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("ms"),
    ).select("vec_id", "ms.m", "ms.sv")
    c0 = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    dist2 = (
        dot(F.col("sv"), F.col("sv"))
        - 2 * dot(F.col("sv"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    w = W.partitionBy("m", "vec_id").orderBy("dist2", "cid")
    asg = (
        sub.join(F.broadcast(c0), "m")
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("m", "vec_id", "cid")
    )
    x = sub.select("m", "vec_id", F.posexplode("sv").alias("d", "val"))
    return (
        x.join(asg, ["m", "vec_id"])
        .groupBy(F.col("m").alias("subspace"), "cid", "d")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mval"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("subspace", "cid", "d")
    )


@query(
    "sim_pq_topk",
    oracle=f"""
WITH {_SQL_PQ_BASE},
q AS (SELECT m, vec_id AS qid, sv AS qv FROM sub WHERE vec_id < {_PQ_NQ}),
lut AS (
  SELECT q.qid, q.m, c.cid,
         list_dot_product(q.qv, q.qv)
         - 2 * list_dot_product(q.qv, c.cv)
         + list_dot_product(c.cv, c.cv) AS dist2
  FROM q JOIN c0 c USING (m)
),
adc AS (
  SELECT l.qid, a.vec_id,
         CAST(SUM(CAST(l.dist2 AS DECIMAL(38,12))) AS DOUBLE) AS approx_dist2
  FROM asg a JOIN lut l ON a.m = l.m AND a.cid = l.cid
  GROUP BY l.qid, a.vec_id
)
SELECT qid, vec_id, approx_dist2, rnk FROM (
  SELECT qid, vec_id, approx_dist2,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY approx_dist2, vec_id) AS INT) AS rnk
  FROM adc
) WHERE rnk <= 10
ORDER BY qid, rnk
""",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization SERVING: asymmetric distance computation (ADC)
    top-10. Every corpus vector is stored only as its M=8 one-byte codes;
    per query, a lookup table of query-subvector→centroid distances (M×K
    doubles) is built once, and each candidate's approximate distance is
    the sum of M table lookups — no original vectors touched at scan time.

    Spark-first shape: the LUT (queries × M × K rows) BROADCASTS; the scan
    side is the code table only (M small ints per vector — the 32× IO
    reduction that makes PQ the 100 TB serving layout), joined map-side on
    (m, cid) and aggregated per (query, vector) with decimal-summed terms
    (exact across engines regardless of aggregation order); top-k is a
    bounded per-query window. The exact re-rank half of a real serving
    stack is ``sim_topk_bruteforce`` applied to these candidates."""
    from pyspark.sql import Window as W

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sub = v.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("e", m * _PQ_SUB + 1, _PQ_SUB).alias("sv"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("ms"),
    ).select("vec_id", "ms.m", "ms.sv")
    c0 = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    dist2 = (
        dot(F.col("sv"), F.col("sv"))
        - 2 * dot(F.col("sv"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    aw = W.partitionBy("m", "vec_id").orderBy("dist2", "cid")
    asg = (
        sub.join(F.broadcast(c0), "m")
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("m", "vec_id", "cid")
    )
    q = sub.filter(F.col("vec_id") < _PQ_NQ).select(
        "m", F.col("vec_id").alias("qid"), F.col("sv").alias("qv")
    )
    lut = q.join(F.broadcast(c0), "m").select(
        "qid",
        "m",
        "cid",
        (
            dot(F.col("qv"), F.col("qv"))
            - 2 * dot(F.col("qv"), F.col("cv"))
            + dot(F.col("cv"), F.col("cv"))
        ).alias("dist2"),
    )
    adc = (
        asg.join(F.broadcast(lut), ["m", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("dist2").cast("decimal(38,12)")).cast("double").alias("approx_dist2"))
    )
    kw = W.partitionBy("qid").orderBy("approx_dist2", "vec_id")
    return (
        adc.withColumn("rnk", F.row_number().over(kw).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("qid", "vec_id", "approx_dist2", "rnk")
        .orderBy("qid", "rnk")
    )


# ---------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss) with a deterministic sign matrix
# ---------------------------------------------------------------------------

_RP_D = 64  # input dimensionality (embeddings fixture)
_RP_K = 8  # output dimensionality


def _rp_sign(i: int, j: int) -> int:
    """±1 sign for input dim i → output dim j, derived from md5 so the
    matrix is reproducible anywhere without an RNG (computed here in
    Python; baked into BOTH engines' expressions as literals)."""
    import hashlib

    return 1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) < 8 else -1


def _rp_exprs(one_based: bool) -> list[str]:
    """One explicit left-to-right sum per output dim. The chain is built
    +-left-associative with a fixed term order, so IEEE addition order is
    identical in Spark and DuckDB (and Catalyst's associative-reorder rule
    only touches integral types)."""
    exprs = []
    for j in range(_RP_K):
        terms = [
            f"CAST(embedding[{i + (1 if one_based else 0)}] AS DOUBLE) * ({_rp_sign(i, j)})"
            for i in range(_RP_D)
        ]
        exprs.append(" + ".join(terms))
    return exprs


@query(
    "sim_random_projection",
    oracle=f"""
SELECT vec_id, CAST(label AS INT) AS label,
       {", ".join(f"({e}) AS p{j}" for j, e in enumerate(_rp_exprs(True)))}
FROM embeddings
ORDER BY vec_id
""",
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random projection (Johnson-Lindenstrauss): project the 64-dim
    embeddings to 8 dims with a dense ±1 sign matrix (Achlioptas 2001 —
    database-friendly JL: ±1 entries preserve pairwise distances within
    (1±ε) at k = O(log n / ε²), no Gaussian sampling needed). The matrix
    is a compile-time constant derived from md5(i:j) — both engines carry
    it as literals, and each output coordinate is one explicit
    left-associated multiply-add chain, so the doubles match bit-for-bit.

    Scale shape: a map-ONLY stage — no shuffle, no UDF, 8 codegen'd
    fused multiply-add expressions per row; this is the cheap first stage
    that makes downstream ANN (IVF cells, LSH planes, PQ codebooks — the
    sim_* family) run on 8-dim vectors instead of 64, an 8× distance-math
    reduction bought for one linear pass. At 100 TB it pipelines inside
    the scan with zero memory footprint."""
    e = read_table(spark, sf_dir, "embeddings")
    cols = [F.expr(x).alias(f"p{j}") for j, x in enumerate(_rp_exprs(False))]
    return e.select(
        "vec_id", F.col("label").cast("int").alias("label"), *cols
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Matryoshka truncation evaluation: prefix-dim retrieval vs full-dim truth
# ---------------------------------------------------------------------------

_MRL_PREFIX = 16  # leading dims retained by the truncated index
#: Query-set bound: every 50th vector, CAPPED at the first 128 such ids
#: (vec_id < 50·128). A proportional sample made the eval O(N²/50) — at
#: the 100× tiling that is 4000 queries × 200k vectors = 800M scored
#: pairs, measured as a >20-minute single straggler. A fixed-absolute
#: deterministic sample (the r6 sim_alignment_uniformity precedent) keeps
#: the eval O(N) at any corpus size; every driver-checked SF holds fewer
#: than 6400 vectors, so values there are unchanged.
_MRL_QID_CAP = 50 * 128


@query(
    "sim_matryoshka_prefix_eval",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS qid, e AS qe FROM v
      WHERE vec_id % 50 = 0 AND vec_id < {_MRL_QID_CAP}),
scored AS (
  SELECT q.qid, a.vec_id AS nb,
         ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
           list_dot_product(q.qe, a.e) /
           (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(a.e, a.e)))
           DESC, a.vec_id) AS r_full,
         ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
           list_dot_product(q.qe[1:{_MRL_PREFIX}], a.e[1:{_MRL_PREFIX}]) /
           (sqrt(list_dot_product(q.qe[1:{_MRL_PREFIX}], q.qe[1:{_MRL_PREFIX}]))
            * sqrt(list_dot_product(a.e[1:{_MRL_PREFIX}], a.e[1:{_MRL_PREFIX}])))
           DESC, a.vec_id) AS r_pre
  FROM q, v a WHERE a.vec_id <> q.qid
)
SELECT f.qid,
       CAST(COUNT(*) AS BIGINT) AS overlap5,
       CAST(MAX(CASE WHEN f.r_full = 1 AND p.r_pre = 1 THEN 1 ELSE 0 END) = 1
            AS BOOLEAN) AS top1_match
FROM (SELECT qid, nb, r_full FROM scored WHERE r_full <= 5) f
JOIN (SELECT qid, nb, r_pre FROM scored WHERE r_pre <= 5) p
  ON f.qid = p.qid AND f.nb = p.nb
GROUP BY f.qid
ORDER BY f.qid
""",
)
def sim_matryoshka_prefix_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al. 2022 — MRL
    embeddings are trained so PREFIXES of the vector are usable
    representations): for every 50th vector as a query, compare top-5
    cosine retrieval using only the leading 16 of 64 dims against the
    full-dim truth — per-query overlap@5 and whether rank-1 agrees. This
    is the decision artifact for running the ANN tier (sim_ivf/pq/lsh) at
    4× less memory and FLOPs: measure what truncation costs on YOUR
    corpus, in-engine, before committing the index build.

    Shape: one broadcast of the (capped, fixed-size) query rows across the
    vector scan; BOTH rankings ride the same qid-clustered exchange (two
    window functions, one shuffle); cosines use the sequential-fold
    ``dot`` that is bit-identical to DuckDB's list_dot_product, so ranks —
    and therefore the overlap counts — agree exactly. Norms are hoisted
    OUT of the pair product (one fold per row instead of two per pair —
    sqrt(dot(x,x)) is the same double either way, so ranks are
    unchanged); per-pair work is the two numerator folds only."""
    from pyspark.sql import Window as W

    pre = lambda c: F.slice(c, 1, _MRL_PREFIX)  # noqa: E731
    e = F.col("embedding")
    v = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("n_full", F.sqrt(dot(e, e)))
        .withColumn("n_pre", F.sqrt(dot(pre(e), pre(e))))
    )
    q = v.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < _MRL_QID_CAP)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("n_full").alias("qn_full"),
        F.col("n_pre").alias("qn_pre"),
    )
    pairs = v.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    full_sim = dot(F.col("qe"), e) / (F.col("qn_full") * F.col("n_full"))
    pre_sim = dot(pre(F.col("qe")), pre(e)) / (F.col("qn_pre") * F.col("n_pre"))
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("nb"),
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc(full_sim), "vec_id"))
        .alias("r_full"),
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc(pre_sim), "vec_id"))
        .alias("r_pre"),
    )
    f = scored.filter(F.col("r_full") <= 5).select("qid", "nb", "r_full")
    p = scored.filter(F.col("r_pre") <= 5).select(
        F.col("qid").alias("p_qid"), F.col("nb").alias("p_nb"), "r_pre"
    )
    both = f.join(
        p, (F.col("qid") == F.col("p_qid")) & (F.col("nb") == F.col("p_nb"))
    )
    return (
        both.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("overlap5"),
            (
                F.max(
                    F.when((F.col("r_full") == 1) & (F.col("r_pre") == 1), 1).otherwise(0)
                )
                == 1
            ).alias("top1_match"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Nearest-centroid classifier evaluation over the labeled embeddings
# ---------------------------------------------------------------------------


@query(
    "sim_centroid_classifier_eval",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(label AS INT) AS label,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
x AS (SELECT vec_id, label, r.range AS d, e[CAST(r.range + 1 AS INT)] AS val
      FROM v, range({_RP_D}) r),
m AS (
  SELECT label AS clabel, d,
         CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mval
  FROM x GROUP BY label, d
),
cent AS (SELECT clabel, list(mval ORDER BY d) AS ce FROM m GROUP BY clabel),
pred AS (
  SELECT vec_id, label, clabel AS pred_label FROM (
    SELECT a.vec_id, a.label, c.clabel,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.e, c.ce) /
                      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce)))
                      DESC, c.clabel) AS rn
    FROM v a, cent c
  ) WHERE rn = 1
)
SELECT label AS true_label, pred_label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def sim_centroid_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classifier evaluation — the 10-minute
    baseline every embedding-quality audit starts with: per-label mean
    vectors as class prototypes, classify every vector by max cosine to a
    prototype, emit the CONFUSION MATRIX (true × predicted counts). Off-
    diagonal mass localizes which classes the embedding space actually
    separates — the decision input for whether the labels are usable as a
    quality-classifier training set (ta_quality_classifier consumes
    exactly such a model).

    Shape: centroid build is the kmeans update step (posexplode →
    per-(label, dim) decimal-exact mean → re-assembled arrays), the
    assignment broadcasts the 3×64-double prototypes across one vector
    scan with a bounded per-vector argmax window, and the confusion
    rollup is map-side combinable. Training-set resubstitution by design
    (the audit measures separability, not generalization); a
    ta_train_test_split upstream turns it into holdout eval unchanged."""
    from pyspark.sql import Window as W

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label"), "embedding"
    )
    x = v.select(
        "label", F.posexplode("embedding").alias("d", "val")
    )
    m = x.groupBy("label", "d").agg(
        (
            F.sum(F.col("val").cast("double").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mval")
    )
    cent = (
        m.groupBy(F.col("label").alias("clabel"))
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "mval"))).alias("dm")
        )
        .select("clabel", F.col("dm.mval").alias("ce"))
    )
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        cosine(F.col("embedding"), F.col("ce")).alias("sim"),
    )
    pred = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.desc("sim"), "clabel")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("label", F.col("clabel").alias("pred_label"))
    )
    return (
        pred.groupBy(F.col("label").alias("true_label"), "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_label", "pred_label")
    )


# ---------------------------------------------------------------------------
# PQ quality evaluation: ADC recall@10 vs exact L2 ground truth
# ---------------------------------------------------------------------------


@query(
    "sim_pq_recall_eval",
    oracle=f"""
WITH {_SQL_PQ_BASE},
q AS (SELECT m, vec_id AS qid, sv AS qv FROM sub WHERE vec_id < {_PQ_NQ}),
lut AS (
  SELECT q.qid, q.m, c.cid,
         list_dot_product(q.qv, q.qv)
         - 2 * list_dot_product(q.qv, c.cv)
         + list_dot_product(c.cv, c.cv) AS dist2
  FROM q JOIN c0 c USING (m)
),
adc AS (
  SELECT l.qid, a.vec_id,
         CAST(SUM(CAST(l.dist2 AS DECIMAL(38,12))) AS DOUBLE) AS approx_dist2
  FROM asg a JOIN lut l ON a.m = l.m AND a.cid = l.cid
  WHERE a.vec_id >= {_PQ_NQ}
  GROUP BY l.qid, a.vec_id
),
pq10 AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY approx_dist2, vec_id) AS rnk
    FROM adc
  ) WHERE rnk <= 10
),
qfull AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < {_PQ_NQ}),
exact10 AS (
  SELECT qid, vec_id FROM (
    SELECT qf.qid, a.vec_id,
           ROW_NUMBER() OVER (PARTITION BY qf.qid ORDER BY
             list_dot_product(qf.qe, qf.qe)
             - 2 * list_dot_product(qf.qe, a.e)
             + list_dot_product(a.e, a.e), a.vec_id) AS rnk
    FROM qfull qf, v a WHERE a.vec_id >= {_PQ_NQ}
  ) WHERE rnk <= 10
)
SELECT e.qid, CAST(10 AS BIGINT) AS k,
       CAST(COUNT(p.vec_id) AS BIGINT) AS n_hit,
       CAST(COUNT(p.vec_id) AS DOUBLE) / 10 AS recall_at_10
FROM exact10 e LEFT JOIN pq10 p ON e.qid = p.qid AND e.vec_id = p.vec_id
GROUP BY e.qid
ORDER BY e.qid
""",
)
def sim_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality evaluation — recall@10 of the ADC code path
    (sim_pq_topk's M=8/K=4 configuration) against exact L2 top-10 ground
    truth, per query — completing the measure-your-index triad: d10 grades
    the LSH bands, sim_recall_eval the IVF cells, and this the PQ
    codebook (the number that decides M and K before a 100 TB re-encode).
    Queries are excluded from both candidate pools so recall isn't
    inflated by self-retrieval of the codebook seeds.

    Shape: the PQ half is the broadcast-LUT ADC plan (code table only at
    scan time); the exact half is one broadcast of 5 query vectors over
    the corpus with a bounded per-query window; the compare is a 50-row
    join. Identical double op order (dp(x,x) − 2dp(x,c) + dp(c,c)) and
    decimal-summed ADC terms keep every rank — and therefore the hit
    counts — engine-exact."""
    from pyspark.sql import Window as W

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sub = v.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("e", m * _PQ_SUB + 1, _PQ_SUB).alias("sv"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("ms"),
    ).select("vec_id", "ms.m", "ms.sv")
    c0 = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    dist2 = (
        dot(F.col("sv"), F.col("sv"))
        - 2 * dot(F.col("sv"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    aw = W.partitionBy("m", "vec_id").orderBy("dist2", "cid")
    asg = (
        sub.join(F.broadcast(c0), "m")
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("m", "vec_id", "cid")
    )
    qsub = sub.filter(F.col("vec_id") < _PQ_NQ).select(
        "m", F.col("vec_id").alias("qid"), F.col("sv").alias("qv")
    )
    lut = qsub.join(F.broadcast(c0), "m").select(
        "qid",
        "m",
        "cid",
        (
            dot(F.col("qv"), F.col("qv"))
            - 2 * dot(F.col("qv"), F.col("cv"))
            + dot(F.col("cv"), F.col("cv"))
        ).alias("dist2"),
    )
    adc = (
        asg.filter(F.col("vec_id") >= _PQ_NQ)
        .join(F.broadcast(lut), ["m", "cid"])
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(F.col("dist2").cast("decimal(38,12)")).cast("double").alias("approx_dist2")
        )
    )
    kw = W.partitionBy("qid").orderBy("approx_dist2", "vec_id")
    pq10 = (
        adc.withColumn("rnk", F.row_number().over(kw))
        .filter(F.col("rnk") <= 10)
        .select("qid", "vec_id")
    )
    qfull = v.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    exact_d2 = (
        dot(F.col("qe"), F.col("qe"))
        - 2 * dot(F.col("qe"), F.col("e"))
        + dot(F.col("e"), F.col("e"))
    )
    ew = W.partitionBy("qid").orderBy("exact_d2", "vec_id")
    exact10 = (
        v.filter(F.col("vec_id") >= _PQ_NQ)
        .crossJoin(F.broadcast(qfull))
        .withColumn("exact_d2", exact_d2)
        .withColumn("rnk", F.row_number().over(ew))
        .filter(F.col("rnk") <= 10)
        .select("qid", "vec_id")
    )
    hits = exact10.join(
        pq10.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left"
    )
    return (
        hits.groupBy("qid")
        .agg(
            F.lit(10).cast("bigint").alias("k"),
            F.count("hit").cast("bigint").alias("n_hit"),
            (F.count("hit").cast("double") / 10).alias("recall_at_10"),
        )
        .orderBy("qid")
    )


_HN_QUERIES = 10


@query(
    "sim_hard_negatives",
    oracle=f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS qid, label AS q_label, e AS qe FROM v
      WHERE vec_id < {_HN_QUERIES}),
scored AS (
  SELECT q.qid, q.q_label, v.vec_id AS neg_id, v.label AS neg_label,
         list_dot_product(v.e, q.qe) /
             (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe)))
             AS c,
         ROW_NUMBER() OVER (
           PARTITION BY q.qid
           ORDER BY list_dot_product(v.e, q.qe) /
             (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe)))
             DESC, v.vec_id) AS rn
  FROM v JOIN q ON v.label <> q.q_label AND v.vec_id <> q.qid
)
SELECT qid, q_label, neg_id, neg_label, ROUND(c, 4) AS cosine
FROM scored WHERE rn = 1
ORDER BY qid
""",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the most-similar vector carrying a DIFFERENT label — the
    pair-construction step of triplet/InfoNCE data pipelines (the
    highest-cosine wrong-label neighbor is the informative negative).

    Scale shape: the anchor set broadcasts (training batches are small
    relative to the corpus); the corpus streams once through a broadcast
    nested-loop with the label-mismatch predicate applied before scoring
    output, and per-anchor argmax is a window over corpus×|anchors| scored
    rows that combines map-side via the rank's early filter. At billions
    of vectors, swap the exhaustive scorer for the sim_ivf_* cell-probe
    path (mine negatives within the anchor's probed cells only — the
    standard ANN-backed approximation); this exhaustive form is the
    recall=1.0 baseline the approximation is graded against."""
    v = read_table(spark, sf_dir, "embeddings")
    q = (
        v.filter(F.col("vec_id") < _HN_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("qe"),
        )
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("label") != F.col("q_label")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            cosine(F.col("embedding"), F.col("qe")).alias("c"),
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("c"), "neg_id")
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("qid", "q_label", "neg_id", "neg_label", F.round("c", 4).alias("cosine"))
        .orderBy("qid")
    )


@query(
    "sim_ivf_hard_negatives",
    oracle=f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NUM_CENTROIDS}),
assigned AS (
  SELECT vec_id, label, e, cid FROM (
    SELECT a.vec_id, a.label, a.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.e, c.ce) /
                      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.ce, c.ce)))
                      DESC, c.cid
           ) AS rn
    FROM v a, cent c
  ) WHERE rn = 1
),
anchors AS (
  SELECT vec_id AS qid, label AS q_label, e AS qe, cid AS qcid
  FROM assigned WHERE vec_id < {_HN_QUERIES}
),
ann AS (
  SELECT qid, q_label, vec_id AS ann_neg_id, c AS ann_cosine FROM (
    SELECT q.qid, q.q_label, a.vec_id,
           list_dot_product(a.e, q.qe) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY list_dot_product(a.e, q.qe) /
               (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qe, q.qe)))
               DESC, a.vec_id) AS rn
    FROM assigned a JOIN anchors q
      ON a.cid = q.qcid AND a.label <> q.q_label AND a.vec_id <> q.qid
  ) WHERE rn = 1
),
exact AS (
  SELECT qid, vec_id AS exact_neg_id FROM (
    SELECT q.qid, a.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY list_dot_product(a.e, q.qe) /
               (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qe, q.qe)))
               DESC, a.vec_id) AS rn
    FROM v a JOIN anchors q ON a.label <> q.q_label AND a.vec_id <> q.qid
  ) WHERE rn = 1
)
SELECT ann.qid, ann.q_label, ann.ann_neg_id,
       ROUND(ann.ann_cosine, 4) AS ann_cosine,
       exact.exact_neg_id, ann.ann_neg_id = exact.exact_neg_id AS hit
FROM ann JOIN exact USING (qid)
ORDER BY qid
""",
)
def sim_ivf_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-accelerated hard-negative mining — the scale path
    sim_hard_negatives' docstring promises: each anchor mines its
    most-similar wrong-label vector only within its OWN IVF cell
    (nprobe=1), and the exhaustive miner runs beside it so the output
    carries a per-anchor hit flag (cell-restricted negative == true
    negative). That flag is the mining-quality dial: raise nprobe until
    hits saturate.

    Scale shape: assignment is the standard one-pass broadcast-centroid
    scoring; the candidate join is an equi-join on the cell id (each
    anchor scores ~|corpus|/k vectors, not |corpus|); the exhaustive twin
    exists only to grade the approximation and would be absent at
    production scale. Everything stays in whole-stage codegen — the
    cosine is the native HOF dot-fold."""
    from pyspark.sql import Window as W

    v = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .withColumn("vnorm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    )
    cent = v.filter(F.col("vec_id") < _NUM_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "sim",
        dot(F.col("embedding"), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")),
    )
    wa = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    # persist the assignment table: it feeds the anchor slice AND the ANN
    # candidate join — uncached, the corpus×centroid scoring re-ran per
    # consumer (the materialized IVF assignment, as in sim_recall_eval).
    assigned = (
        scored.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "cid")
        .persist()
    )
    anchors = assigned.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
        F.col("cid").alias("qcid"),
    )
    wq = W.partitionBy("qid")
    ann = (
        assigned.join(
            F.broadcast(anchors),
            (F.col("cid") == F.col("qcid"))
            & (F.col("label") != F.col("q_label"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .withColumn("c", cosine(F.col("embedding"), F.col("qe")))
        .withColumn("rn", F.row_number().over(wq.orderBy(F.desc("c"), "vec_id")))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            "q_label",
            F.col("vec_id").alias("ann_neg_id"),
            F.round("c", 4).alias("ann_cosine"),
        )
    )
    exact = (
        v.join(
            F.broadcast(anchors.drop("qcid")),
            (F.col("label") != F.col("q_label")) & (F.col("vec_id") != F.col("qid")),
        )
        .withColumn("c", cosine(F.col("embedding"), F.col("qe")))
        .withColumn("rn", F.row_number().over(wq.orderBy(F.desc("c"), "vec_id")))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("vec_id").alias("exact_neg_id"))
    )
    return (
        ann.join(exact, "qid")
        .select(
            "qid",
            "q_label",
            "ann_neg_id",
            "ann_cosine",
            "exact_neg_id",
            (F.col("ann_neg_id") == F.col("exact_neg_id")).alias("hit"),
        )
        .orderBy("qid")
    )


#: Fixed ABSOLUTE sample sizes for the two pair statistics. r5 bounded the
#: uniformity sample PROPORTIONALLY (vec_id % 4) and left alignment on the
#: full label join — both keep pair mass quadratic in the corpus, and the
#: r6 30× ladder run hung on exactly that (30× vectors with a fixed label
#: alphabet → ~900× pairs). Fixed-size samples make both halves O(1) pair
#: mass at any corpus size; vec_id order is the deterministic,
#: engine-identical selection.
_AU_PER_LABEL = 64   # alignment: vectors per label → ≤ 2016 pairs/label
_AU_UNIF_N = 256     # uniformity: global sample → 32 640 pairs


@query(
    "sim_alignment_uniformity",
    oracle=f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vs AS (
  SELECT vec_id, label, e FROM (
    SELECT vec_id, label, e,
           ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM v
  ) WHERE rn <= {_AU_PER_LABEL}
),
pos AS (
  SELECT a.label,
         2 - 2 * ({_SQL_COS}) AS sqdist
  FROM vs a JOIN vs b ON a.label = b.label AND a.vec_id < b.vec_id
),
align AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         AVG(sqdist) AS alignment
  FROM pos GROUP BY 1
),
s AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {_AU_UNIF_N}),
u AS (
  SELECT ln(AVG(exp(-2 * (2 - 2 * ({_SQL_COS}))))) AS uniformity
  FROM s a JOIN s b ON a.vec_id < b.vec_id
)
SELECT align.label, align.n_pairs,
       ROUND(align.alignment, 4) AS alignment,
       ROUND(u.uniformity, 4) AS uniformity
FROM align CROSS JOIN u
ORDER BY align.label
""",
)
def sim_alignment_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health check: ALIGNMENT (mean squared distance
    between same-label pairs, on the unit sphere: 2−2cos) per label and
    UNIFORMITY (log-mean Gaussian potential over a vector sample) — the
    two axes of Wang & Isola (ICML'20) that predict whether a contrastive
    embedding is collapsing (good alignment, terrible uniformity) or
    scattering (the reverse). A training-data pipeline runs this per
    checkpoint export before trusting the embeddings for dedup (d5/d6) or
    retrieval (sim_*).

    Scale shape: both statistics are pairwise, so pair mass — not row
    count — is the cost, and BOTH run on FIXED-SIZE deterministic samples
    (smallest vec_ids; no RNG, same rows on any engine): alignment over
    _AU_PER_LABEL vectors per label (a partitioned WindowGroupLimit — the
    per-label top-k never leaves its partition) and uniformity over a
    _AU_UNIF_N-row TakeOrderedAndProject sample joined via broadcast-NL.
    Pair mass is therefore O(1) in the corpus: the r5 form (full label
    join + proportional % 4 sample) was measured quadratic at the 30×
    ladder point — 30× vectors with a fixed label alphabet is ~900×
    pairs — and hung; this is the estimator the Wang-Isola health check
    actually prescribes (sampled pairs, not the full Gram matrix). Both
    statistics are mergeable averages of per-pair doubles (the
    engine-stable cosine fold), rounded on both engines."""
    from pyspark.sql import Window as W

    from nba_data_pipeline_spark.operators.similarity import dot

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    # r11 (§1.2-2/§2.4): (a) precompute each vector's sqrt(dot(e,e)) ONCE
    # per sampled row — the per-pair cosine recomputed both norms for
    # every pair (2016 pairs/label redo the same 64 norms 63× each);
    # bit-identical because the per-pair value is the same fold divided in
    # the same order, sqrt(na)·sqrt(nb). (b) localCheckpoint the two
    # fixed-size samples so each self-join branch (and the broadcast
    # build) reads ≤64·|labels| / 256 pinned rows instead of re-running
    # the window / TakeOrdered scan per branch.
    wl = W.partitionBy("label").orderBy("vec_id")
    vs = (
        v.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= _AU_PER_LABEL)
        .select(
            "vec_id",
            "label",
            "embedding",
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .localCheckpoint()
    )
    a = vs.select(
        F.col("vec_id").alias("ida"),
        "label",
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = vs.select(
        F.col("vec_id").alias("idb"),
        "label",
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    sqdist = 2.0 - 2.0 * (
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    )
    align = (
        a.join(b, "label")
        .filter(F.col("ida") < F.col("idb"))
        .select("label", sqdist.alias("sqdist"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.avg("sqdist").alias("alignment"),
        )
    )
    s = (
        v.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(_AU_UNIF_N)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .localCheckpoint()
    )
    sa = s.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    sb = s.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    u = (
        sa.join(F.broadcast(sb), F.col("ida") < F.col("idb"))
        .select(F.exp(-2.0 * sqdist).alias("pot"))
        .agg(F.log(F.avg("pot")).alias("uniformity"))
    )
    return (
        align.crossJoin(F.broadcast(u))
        .select(
            "label",
            "n_pairs",
            F.round("alignment", 4).alias("alignment"),
            F.round("uniformity", 4).alias("uniformity"),
        )
        .orderBy("label")
    )
