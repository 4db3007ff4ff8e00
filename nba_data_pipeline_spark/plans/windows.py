"""Window-function queries (SURVEY §2.7 W1-W4, A10 variants).

Ranking (DvP tables are rank-ordered team lists), streak/gaps-and-islands
("in N straight games", nba_insights_scraper.py:424), latest-per-key dedupe
(newest download per key, ctg_export_league.py:300-307), and ordinal
disambiguation (the LA rule, DEFENSEVSPOSTION.PY:177-184).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table, table_row_count
from nba_data_pipeline_spark.operators.totalorder import ntile_exact
from nba_data_pipeline_spark.plans.exact import dsum, sql_dsum
from nba_data_pipeline_spark.plans.registry import query


@query(
    "w2_rank_within_group",
    oracle=f"""
WITH rev AS (
  SELECT s.s_suppkey, s.s_name, s.s_nationkey,
         {sql_dsum("l.l_extendedprice")} AS revenue
  FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_suppkey, s.s_name, s.s_nationkey
)
SELECT n.n_name AS nation_name, rev.s_suppkey, rev.s_name, rev.revenue,
       CAST(RANK() OVER (PARTITION BY n.n_name
                         ORDER BY rev.revenue DESC, rev.s_suppkey) AS INT) AS rev_rank,
       CAST(DENSE_RANK() OVER (PARTITION BY n.n_name
                               ORDER BY rev.revenue DESC, rev.s_suppkey) AS INT) AS rev_dense_rank
FROM rev JOIN nation n ON rev.s_nationkey = n.n_nationkey
ORDER BY nation_name, rev_rank
""",
)
def w2_rank_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank/dense_rank within partition (W2 — DvP rank-ordered team lists,
    DEFENSEVSPOSTION.PY:20-24): supplier revenue ranked within nation."""
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name", "s_nationkey")
        .agg(dsum("l_extendedprice").alias("revenue"))
    )
    w = W.partitionBy("nation_name").orderBy(F.desc("revenue"), F.asc("s_suppkey"))
    return (
        rev.join(F.broadcast(n), rev.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"), "s_suppkey", "s_name", "revenue"
        )
        .withColumn("rev_rank", F.rank().over(w).cast("int"))
        .withColumn("rev_dense_rank", F.dense_rank().over(w).cast("int"))
        .orderBy("nation_name", "rev_rank")
    )


@query(
    "w3_longest_streak",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN value > 5.0 THEN 1 ELSE 0 END AS hit,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), islands AS (
  SELECT user_id, hit,
         rn - ROW_NUMBER() OVER (PARTITION BY user_id, hit ORDER BY rn) AS grp
  FROM flagged
), streaks AS (
  SELECT user_id, COUNT(*) AS streak_len
  FROM islands WHERE hit = 1
  GROUP BY user_id, grp
)
SELECT user_id, MAX(streak_len) AS longest_streak, COUNT(*) AS n_streaks
FROM streaks GROUP BY user_id
ORDER BY user_id
""",
)
def w3_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streak detection (W3 — 'in N straight games',
    nba_insights_scraper.py:424) via gaps-and-islands: two row_numbers whose
    difference is constant within a run. One shuffle on user_id; both
    windows and the final aggregate reuse that partitioning."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    rn_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("value") > 5.0, 1).otherwise(0).alias("hit"),
    ).withColumn("rn", F.row_number().over(rn_all))
    rn_hit = W.partitionBy("user_id", "hit").orderBy("rn")
    islands = flagged.withColumn("grp", F.col("rn") - F.row_number().over(rn_hit))
    streaks = (
        islands.filter(F.col("hit") == 1)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return (
        streaks.groupBy("user_id")
        .agg(F.max("streak_len").alias("longest_streak"), F.count(F.lit(1)).alias("n_streaks"))
        .orderBy("user_id")
    )


@query(
    "w4_latest_per_key",
    oracle="""
SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type,
       value AS latest_value
FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
""",
)
def w4_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot-per-key dedupe (W4 — newest download per key,
    ctg_export_league.py:300-307; overwrite-per-date sink semantics)."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
            F.col("value").alias("latest_value"),
        )
        .orderBy("user_id")
    )


@query(
    "w1_ordinal_disambiguation",
    oracle="""
SELECT user_id, event_id, ord,
       CASE WHEN ord = 1 THEN 'first' WHEN ord = 2 THEN 'second' ELSE 'later' END
           AS arrival_label
FROM (
  SELECT user_id, event_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS ord
  FROM events WHERE event_type = 'signup'
)
WHERE ord <= 3
ORDER BY user_id, ord
""",
)
def w1_ordinal_disambiguation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-appearance disambiguation (W1 — the stateful LA rule, first
    'LOS ANGELES' → Lakers, second → Clippers, DEFENSEVSPOSTION.PY:177-184):
    an explicit ingestion order column + row_number makes the reference's
    DOM-order-dependent rule deterministic under distributed execution."""
    e = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_id", "ts")
        .withColumn("ord", F.row_number().over(w).cast("int"))
        .drop("ts")
        .filter(F.col("ord") <= 3)
        .withColumn(
            "arrival_label",
            F.when(F.col("ord") == 1, "first")
            .when(F.col("ord") == 2, "second")
            .otherwise("later"),
        )
        .orderBy("user_id", "ord")
    )


@query(
    "w5_calendar_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS last30d_spend,
       COUNT(*) OVER w AS last30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
)
def w5_calendar_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-sliced window — the reference's 'Last 7/15/30' timeframes
    (DEFENSEVSPOSTION.PY:66) as a RANGE frame over event time: every order
    sees the trailing 30 DAYS, however many rows that is (rows frames, A9,
    see the trailing N ROWS). Spark evaluates both in the same WindowExec;
    only the frame-boundary computation differs."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("__w5_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS last30d_spend,
               COUNT(*) OVER w AS last30d_orders
        FROM __w5_orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey
        """
    )


@query(
    "w6_sessionize",
    oracle=f"""
WITH x AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
y AS (
  SELECT user_id, event_id, ts, value,
         CAST(SUM(CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
  FROM x
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       {sql_dsum("value", "DECIMAL(18,2)")} AS total_value
FROM y
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def w6_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-based session-id assignment every
    clickstream/training-telemetry pipeline runs: a new session starts
    after a >30-minute silence. Two stacked windows over the SAME
    (user_id, ts) partitioning — lag to measure the gap, running sum of
    session-starts to number sessions — so Spark evaluates both in one
    WindowExec over one shuffle, then the per-session rollup reuses the
    same user_id hash partitioning (no second shuffle of the full stream).
    Gap compare is integer microseconds (``unix_micros``) — exact on both
    engines. Batch twin of the streaming ``session_window`` in
    ``s6_session_windows``."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0)
    sessioned = e.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("int"),
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
            dsum("value").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "w7_funnel_sequence",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER w AS lv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
c AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS lct,
         last_value(CASE WHEN event_type = 'click' THEN lv END IGNORE NULLS)
           OVER w AS lcv
  FROM o
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN lct IS NOT NULL AND ts <= lct + INTERVAL 24 HOUR
                      AND lcv IS NOT NULL AND lct <= lcv + INTERVAL 24 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM c
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
""",
)
def w7_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: funnel / sequence detection — per user, count purchases completing
    a view→click→purchase chain with each step at most 24 hours after the
    previous (MATCH_RECOGNIZE semantics restated as carried window state,
    the reference's "N straight games" streak idea generalized to typed
    sequences, nba_insights_scraper.py:424; the 24 h step bound matches the
    fixture's ~7 h median per-user event spacing).

    Two ordered passes over the same per-user sort: pass 1 carries the
    latest prior view timestamp; pass 2 carries, from the latest prior
    CLICK row, both its timestamp and ITS carried view (so an intervening
    view between click and purchase can't corrupt the chain). Both windows
    share one partitioning — Spark sorts each user partition once and
    reuses it; no self-joins, no explode, state is O(1) per row, which is
    the 100 TB shape (a join-based funnel would shuffle the fact table
    once per funnel step)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    before = (
        W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, -1)
    )
    o = ev.withColumn(
        "lv",
        F.last(F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True).over(before),
    )
    c = o.withColumn(
        "lct",
        F.last(F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True).over(before),
    ).withColumn(
        "lcv",
        F.last(F.when(F.col("event_type") == "click", F.col("lv")), ignorenulls=True).over(before),
    )
    hour = F.expr("INTERVAL 24 HOUR")
    converted = (
        F.col("lct").isNotNull()
        & (F.col("ts") <= F.col("lct") + hour)
        & F.col("lcv").isNotNull()
        & (F.col("lct") <= F.col("lcv") + hour)
    )
    return (
        c.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(converted, 1).otherwise(0)).alias("n_converted"),
        )
        .orderBy("user_id")
    )


@query(
    "w8_curriculum_deciles",
    oracle="""
WITH ranked AS (
  SELECT doc_id, n_chars,
         CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS decile
  FROM documents
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       MIN(doc_id) AS first_doc
FROM ranked
GROUP BY decile
ORDER BY decile
""",
)
def w8_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: NTILE curriculum bucketing — split the corpus into 10
    equal-count difficulty deciles by document length (the stand-in
    difficulty signal), the ordering primitive behind curriculum training
    schedules and quality-stratified mixing. The tile order carries
    doc_id as tiebreaker so bucket membership is deterministic.

    Scale note: the global NTILE runs on the boundary-selection primitive
    (operators/totalorder.ntile_exact, r10): exact bucket histogram →
    nine boundary tuples selected by sorting only the buckets that hold
    one → decile as a pure projection. The corpus is never globally
    sorted or re-shuffled (the r9 form paid a full-frame hash shuffle +
    window + broadcast-offset join for a rank it immediately collapsed to
    a tile), so the labeling survives a 100x corpus with only bounded
    passes. For per-epoch resharding the md5 shuffle-shard
    (ta_global_shuffle_shard) composes downstream of the decile label."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = ntile_exact(
        d, ["n_chars", "doc_id"], 10, tile_col="decile",
        # document-grain frame: exactly the documents footer count
        small_hint_rows=table_row_count(sf_dir, "documents"),
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("decile")
    )


@query(
    "w9_scd2_intervals",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE user_id % 20 = 0
), ch AS (
  SELECT user_id, ts, event_id, event_type FROM e
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
       event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM ch
ORDER BY user_id, version
""",
)
def w9_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: SCD-Type-2 interval build — compress a per-key event history
    into versioned validity intervals ``[valid_from, valid_to)``, the CDC
    backbone of every warehouse dimension (the reference keeps only the
    latest snapshot per key, ctg_export_league.py:300-307; this is the
    full-history generalization). Gaps-and-islands via lag-change
    detection, then interval edges via lead — all in ONE shuffle on
    user_id: Spark sorts each key's partition once and both window passes
    reuse that order (the change-filter between them is
    partitioning-preserving, so no second exchange; same single-sort
    discipline as the flagship's frame+rank stack). The (ts, event_id)
    tiebreaker makes the version history a total order, so the interval
    set is deterministic on both engines. At 100 TB this is the plan you
    want: state never leaves the key's partition and the output is
    change-rows-only (≪ input)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 20 == 0)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
    )
    ch = e.where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    return ch.select(
        "user_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).orderBy("user_id", "version")


# ---------------------------------------------------------------------------
# W10: overlapping-interval coalesce (gaps-and-islands on time ranges)
# ---------------------------------------------------------------------------


@query(
    "w10_interval_coalesce",
    oracle="""
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 1 HOUR AS e FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
grp AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(date_diff('second', MIN(s), MAX(e)) AS BIGINT) AS span_s
FROM grp
GROUP BY user_id, island
ORDER BY user_id, island
""",
)
def w10_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10: OVERLAPPING-INTERVAL COALESCE — merge each user's
    one-hour activity windows into maximal connected spans (the
    time-range generalization of w3's equality-keyed gaps-and-islands,
    and the batch twin of s6's session windows): an interval starts a new
    island iff its start exceeds the running MAX of all previous ends
    (not just the previous row's end — an earlier long interval can
    bridge over a later short one, which the lag-based form gets wrong).
    Output: merged span boundaries, interval count, and span length.

    Shape: one shuffle on user_id serves both windows (running max is
    frame-computable, island id is a running sum over the same order);
    the final rollup groups on (user, island) inside the same
    clustering. At 100 TB this is the one-pass plan; the naive
    interval-overlap self-join it replaces is quadratic per hot user."""
    iv = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    worder = W.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(worder.rowsBetween(W.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > prev_max_e, F.lit(1)).otherwise(F.lit(0)),
    )
    grp = marked.withColumn(
        "island",
        F.sum("new_island").over(worder.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        grp.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            (F.unix_timestamp(F.max("e")) - F.unix_timestamp(F.min("s")))
            .cast("bigint")
            .alias("span_s"),
        )
        .select(
            "user_id",
            F.col("island").cast("bigint").alias("island"),
            "span_start",
            "span_end",
            "n_intervals",
            "span_s",
        )
        .orderBy("user_id", "island")
    )


@query(
    "w11_distribution_ranks",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
       CAST(NTILE(4) OVER w AS INT) AS quartile
FROM orders
WHERE o_orderkey % 37 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
""",
)
def w11_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: the distribution-rank window trio — PERCENT_RANK (relative
    rank in [0,1]), CUME_DIST (fraction ≤ current), NTILE(4) (quartile
    bucket) over each priority's price order: the percentile-position
    primitives behind 'this player is in the top decile' framings the
    reference hand-computes from sorted exports. All three ride ONE
    window definition → one shuffle + one sort serves the trio; the
    order includes the unique o_orderkey tiebreaker so both engines
    agree on every boundary, and both rank ratios are exact small-integer
    divisions (identical IEEE doubles)."""
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 37 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# W12: rolling linear-regression slope (trend detection)
# ---------------------------------------------------------------------------


@query(
    "w12_rolling_regression_slope",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id % 25 = 0) t
  WHERE rn = 1
), seq AS (
  SELECT user_id, day, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS x
  FROM daily
), win AS (
  SELECT user_id, day, value, x,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(28,2)) AS sy,
         CAST(SUM(x * CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(28,2)) AS sxy
  FROM seq
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, value,
       CASE WHEN n >= 3 AND n * sxx - sx * sx <> 0 THEN
         (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
           / (n * sxx - sx * sx)
       END AS slope7
FROM win
ORDER BY user_id, day
""",
)
def w12_rolling_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12: ROLLING OLS trend slope — the least-squares slope of each
    series' last-7-observation window (the 'is this player trending up'
    statistic the reference eyeballs from its Last-7 exports): slope =
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with x = the observation index. Every
    windowed sum is EXACT — x sums are integers, y and xy sums are
    decimal — so the one final division is IEEE on identical operands and
    both engines agree bit-for-bit; windows shorter than 3 points emit
    NULL rather than a degenerate fit. pandas does this with
    rolling.apply (Python per window, O(N·w)); here the five running
    sums ride ONE frame pass each over the same user-clustered sort —
    no per-window recompute, no UDF.

    At 100 TB: identical shape to a9/a10's rolling stack — one shuffle on
    the series key, frame arithmetic in codegen."""
    daily_rn = F.row_number().over(
        W.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
    )
    daily = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 25 == 0)
        .withColumn("day", F.col("ts").cast("date"))
        .withColumn("rn", daily_rn)
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    seq = daily.withColumn(
        "x",
        F.row_number().over(W.partitionBy("user_id").orderBy("day")).cast("bigint"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-6, W.currentRow)
    )
    dy = F.col("value").cast("decimal(18,2)")
    win = seq.select(
        "user_id",
        "day",
        "value",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(dy).over(w).cast("decimal(28,2)").alias("sy"),
        F.sum(F.col("x") * dy).over(w).cast("decimal(28,2)").alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        (F.col("n") >= 3) & (denom != 0),
        (
            F.col("n") * F.col("sxy").cast("double")
            - F.col("sx") * F.col("sy").cast("double")
        )
        / denom,
    )
    return win.select("user_id", "day", "value", slope.alias("slope7")).orderBy(
        "user_id", "day"
    )


_W13_PATTERN = "V+CP"  # one-or-more views, then a click, then a purchase


@query(
    "w13_sequence_pattern",
    oracle=f"""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
                      WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
                      ELSE 'E' END, '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_extract_all(s, '{_W13_PATTERN}')) AS BIGINT)
           AS n_matches,
       CAST(len(s) AS BIGINT) AS seq_len
FROM seq
WHERE len(regexp_extract_all(s, '{_W13_PATTERN}')) > 0
ORDER BY user_id
""",
)
def w13_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13: regex-over-event-sequence matching — the MATCH_RECOGNIZE class
    in its most general form: each user's time-ordered event types become
    a symbol string and an arbitrary regular expression counts
    non-overlapping occurrences (here V+CP: a view burst converting
    through a click to a purchase). w7's funnel carries fixed steps
    through window state; this form handles ANY regular pattern
    (alternation, repetition, optionality) at the cost of materializing
    the per-key symbol string.

    Scale shape: one shuffle clusters each user's events; the symbol
    string is an ordered in-group reduction (array_sort over (ts, id,
    symbol) structs — no second sort pass), and the regex runs once per
    USER, not per event. Both engines scan regex matches left-to-right
    non-overlapping with greedy quantifiers, so counts agree exactly.
    Per-key sequence length is the state bound — cap or window it for
    unbounded keys (here ≤ |events per user|)."""
    sym = (
        F.when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("E")
    )
    e = read_table(spark, sf_dir, "events").select(
        "user_id", F.struct("ts", "event_id", sym.alias("sym")).alias("ev")
    )
    seq = e.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.expr("transform(array_sort(collect_list(ev)), s -> s.sym)"),
        ).alias("s")
    )
    n_matches = F.size(F.regexp_extract_all("s", F.lit(_W13_PATTERN), F.lit(0)))
    return (
        seq.select(
            "user_id",
            n_matches.cast("long").alias("n_matches"),
            F.length("s").cast("long").alias("seq_len"),
        )
        .filter(F.col("n_matches") > 0)
        .orderBy("user_id")
    )


@query(
    "w14_theil_sen_slope",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id % 25 = 0) t
  WHERE rn = 1
), seq AS MATERIALIZED (
  SELECT user_id, day, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT)
             AS x
  FROM daily
), offs AS (SELECT UNNEST(range(0, 7)) AS d
), w1 AS (
  SELECT a.user_id, a.day, a.x AS ax, p1.x AS x1, p1.value AS v1
  FROM seq a CROSS JOIN offs o
  JOIN seq p1 ON p1.user_id = a.user_id AND p1.x = a.x - o.d
), pairs AS (
  SELECT w1.user_id, w1.day, w1.ax,
         (p2.value - w1.v1) / (p2.x - w1.x1) AS slope,
         w1.x1, p2.x AS x2
  FROM w1 CROSS JOIN offs o2
  JOIN seq p2 ON p2.user_id = w1.user_id AND p2.x = w1.ax - o2.d
  WHERE w1.x1 < p2.x
), ranked AS (
  SELECT user_id, day, slope,
         ROW_NUMBER() OVER (PARTITION BY user_id, ax
                            ORDER BY slope, x1, x2) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, ax) AS n
  FROM pairs
)
SELECT user_id, day, CAST(ANY_VALUE(n) AS BIGINT) AS n_pairs,
       ROUND(AVG(slope), 6) AS ts_slope
FROM ranked
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY user_id, day
HAVING ANY_VALUE(n) >= 3
ORDER BY user_id, day
""",
)
def w14_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14: Theil-Sen robust rolling trend — the MEDIAN of all pairwise
    slopes in each series' last-7-observation window, beside w12's OLS
    slope: a single outlier day shifts OLS arbitrarily but moves the
    pairwise-slope median by at most one rank (29% breakdown point).
    The median is taken without any quantile function: rank the ≤21
    window slopes, average the middle one/two — identical integer rank
    arithmetic on both engines, so odd/even windows agree exactly.

    Scale shape: the pair expansion is an OFFSET EQUI-JOIN — each anchor
    explodes the window offsets d∈[0,6] and joins on the exact key
    (user_id, x = ax − d), so the join intermediate is exactly 7·rows and
    the pair set exactly ≤21·rows, bounded BY THE JOIN KEY at any series
    length. (The r8 sf10 sweep retired the previous user_id-equi +
    x-range-filter form: both engines hash-join on user_id alone there,
    so the pre-filter intermediate is Σ n²(user) — the oracle spilled
    >70 GB of temp at 100×, and on Spark one long series is a skew bomb.)
    The ranking windows then run over the bounded groups; one shuffle on
    the series key serves the joins and both windows."""
    daily_rn = F.row_number().over(
        W.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
    )
    seq_x = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    seq = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 25 == 0)
        .withColumn("day", F.col("ts").cast("date"))
        .withColumn("rn", daily_rn)
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
        .withColumn("x", seq_x.cast("long"))
    )
    seq = seq.localCheckpoint(eager=False)  # window scan feeds 3 consumers
    offs = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("d")
    a = seq.select(
        "user_id", "day", F.col("x").alias("ax"), offs
    ).withColumn("x1", F.col("ax") - F.col("d"))
    p1 = seq.select("user_id", F.col("x").alias("x1"), F.col("value").alias("v1"))
    w1 = a.join(p1, ["user_id", "x1"]).select(
        "user_id", "day", "ax", "x1", "v1", offs
    ).withColumn("x2", F.col("ax") - F.col("d"))
    p2 = seq.select("user_id", F.col("x").alias("x2"), F.col("value").alias("v2"))
    pairs = (
        w1.join(p2, ["user_id", "x2"])
        .filter(F.col("x1") < F.col("x2"))
        .select(
            "user_id",
            "day",
            "ax",
            ((F.col("v2") - F.col("v1")) / (F.col("x2") - F.col("x1"))).alias(
                "slope"
            ),
            "x1",
            "x2",
        )
    )
    wg = W.partitionBy("user_id", "ax")
    ranked = pairs.select(
        "user_id",
        "day",
        "slope",
        F.row_number().over(wg.orderBy("slope", "x1", "x2")).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return (
        mid.groupBy("user_id", "day")
        .agg(
            F.first("n").cast("long").alias("n_pairs"),
            F.round(F.avg("slope"), 6).alias("ts_slope"),
        )
        .filter(F.col("n_pairs") >= 3)
        .orderBy("user_id", "day")
    )


@query(
    "w15_rolling_median",
    oracle="""
SELECT user_id, event_id,
       ROUND(median(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
FROM events
ORDER BY user_id, event_id
""",
)
def w15_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15: exact rolling median over the trailing 5 observations per
    user series — the robust twin of A9's rolling mean (one spike moves
    a mean by spike/5; the median ignores it entirely), the smoother a
    feed-repair pipeline wants before ts8's CUSUM so a single glitch
    can't trip the alarm.

    Spark has no exact median window function; the Spark-first form is
    collect_list over the bounded frame + array_sort + the two-middle
    interpolation — constant work per row because the frame is ROWS 4
    PRECEDING (a K-bounded buffer, never the whole partition). The oracle
    runs DuckDB's native windowed median; both interpolate even-sized
    frames as the mean of the middles, and the short leading frames
    (sizes 1–4) interpolate identically, so values match to rounding.

    Scale shape: one shuffle on user_id, sequential scan per series,
    O(K log K) per row with K=5 — the same cost model at any row count.
    For large K switch the buffer to two heaps inside
    applyInPandas (the frame here is small enough that JVM-side HOFs
    win)."""
    w5 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w5))
    n = F.size(arr)
    lo = F.element_at(arr, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return (
        read_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
        )
        .select(
            "user_id",
            "event_id",
            F.round((lo + hi) / 2.0, 4).alias("med5"),
        )
        .orderBy("user_id", "event_id")
    )
