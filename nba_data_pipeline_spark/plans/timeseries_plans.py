"""Time-series queries (TS family): gap filling and resampling — the
feed-repair operators between raw event streams and windowed analytics
(the reference consumes pre-dense per-game tables; a real feed has holes
and irregular sampling, and A9/A10-style rolling frames silently skew on
them).

Both queries shuffle once on the series key and everything after runs
inside that key's partition — the only shape that survives 100 TB of
events, where a series is small but there are billions of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.operators.totalorder import bounded_window
from nba_data_pipeline_spark.plans.registry import query


@query(
    "ts1_locf_gapfill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id % 25 = 0) t
  WHERE rn = 1
), spine AS (
  SELECT user_id, UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))::DATE AS day
  FROM daily GROUP BY user_id
)
SELECT s.user_id, s.day,
       LAST_VALUE(d.value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       CAST(d.value IS NULL AS BOOLEAN) AS is_filled
FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
ORDER BY s.user_id, s.day
""",
)
def ts1_locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS1: LOCF gap filling — densify each series to a daily grid and
    carry the last observation forward over the holes, the repair step
    that makes rolling frames (A9/A10) honest on sparse feeds. Per-series
    spine via ``sequence(min_day, max_day)`` (no calendar dim join, no
    cross join: each series generates exactly its own range), one left
    join back to the observed days, and one ignore-nulls ``last`` window
    — all three stages share the single shuffle on user_id. The per-day
    observation is the deterministic latest (row_number over ts,
    event_id), and the fill value passes through un-arithmetic'd, so the
    double survives both engines bit-identically."""
    w_day = W.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 25 == 0)
        .select("user_id", "ts", "event_id", "value", F.to_date("ts").alias("day"))
        .withColumn("rn", F.row_number().over(w_day))
        .where(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w_fill = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("value", ignorenulls=True).over(w_fill).alias("value"),
            F.col("value").isNull().alias("is_filled"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "ts2_ohlc_bars",
    oracle="""
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         FIRST_VALUE(value) OVER (
             PARTITION BY user_id, CAST(ts AS DATE)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
         LAST_VALUE(value) OVER (
             PARTITION BY user_id, CAST(ts AS DATE)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
  FROM events WHERE user_id % 25 = 0
)
SELECT user_id, day,
       MIN(open) AS open, MAX(close) AS close,
       MAX(value) AS high, MIN(value) AS low,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM seq
GROUP BY user_id, day
ORDER BY user_id, day
""",
)
def ts2_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS2: downsampling to OHLC bars — the canonical irregular→regular
    resample: per series per day, the first/last observation in event
    order (open/close, with the (ts, event_id) total order making both
    deterministic under same-timestamp ticks) and the extremes
    (high/low). first/last come from one full-frame window pass, the bar
    rollup from the group-by that follows — both on the same
    (user, day)-clustered shuffle. min/max/first/last only MOVE input
    doubles (no arithmetic), so the bars hash identically on both
    engines. At scale this is the map-side-combining shape: the window
    runs within day-partitions and the aggregate collapses before any
    further exchange."""
    w_frame = (
        W.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    seq = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 25 == 0)
        .select("user_id", "ts", "event_id", "value", F.to_date("ts").alias("day"))
        .select(
            "user_id",
            "day",
            "value",
            F.first("value").over(w_frame).alias("open"),
            F.last("value").over(w_frame).alias("close"),
        )
    )
    return (
        seq.groupBy("user_id", "day")
        .agg(
            F.min("open").alias("open"),
            F.max("close").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# TS3: exponentially weighted moving average (finite memory, exact weights)
# ---------------------------------------------------------------------------

_EWMA_N = 8  # memory depth; weight of lag k is 2^(N-1-k)


def _ewma_exprs(lag_name) -> tuple[str, str]:
    """(numerator, denominator) as explicit left-associated chains over
    lag columns produced by ``lag_name(k)`` — identical expression trees
    on both engines so the doubles match bit-for-bit."""
    num_terms = [
        f"COALESCE({lag_name(k)}, 0) * {1 << (_EWMA_N - 1 - k)}" for k in range(_EWMA_N)
    ]
    den_terms = [
        f"CASE WHEN {lag_name(k)} IS NULL THEN 0 ELSE {1 << (_EWMA_N - 1 - k)} END"
        for k in range(_EWMA_N)
    ]
    return " + ".join(num_terms), " + ".join(den_terms)


_TS3_NUM, _TS3_DEN = _ewma_exprs(lambda k: f"x{k}")
_TS3_LAGS_SQL = ",\n         ".join(
    "value AS x0" if k == 0 else
    f"LAG(value, {k}) OVER (PARTITION BY user_id ORDER BY day) AS x{k}"
    for k in range(_EWMA_N)
)


@query(
    "ts3_ewma_smooth",
    oracle=f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id % 25 = 0) t
  WHERE rn = 1
), lagged AS (
  SELECT user_id, day,
         {_TS3_LAGS_SQL}
  FROM daily
)
SELECT user_id, day, x0 AS value,
       ({_TS3_NUM}) / ({_TS3_DEN}) AS ewma
FROM lagged
ORDER BY user_id, day
""",
)
def ts3_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS3: EWMA smoothing with α = 1/2 and finite memory N=8 — the
    denoising pass between a repaired feed (ts1) and trend logic, with the
    float-fixpoint problem designed out: instead of the recursive
    ewma = αx + (1-α)·prev (whose rounding error path no cross-engine
    oracle can reproduce), the weights are truncated to the last N
    observations and applied as INTEGER powers of two in one fixed
    left-associated expression chain, renormalized by the weights actually
    present at the series head — bit-identical doubles on both engines,
    and within 2^-N of the infinite-memory EWMA everywhere.

    Scale shape: one shuffle on the series key; the N lags all ride the
    same (user_id, day) sort, and the arithmetic is codegen'd per-row —
    the same single-partition-pass contract as ts1/ts2."""
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
    wlag = W.partitionBy("user_id").orderBy("day")
    lagged = daily.select(
        "user_id",
        "day",
        F.col("value").alias("x0"),
        *[F.lag("value", k).over(wlag).alias(f"x{k}") for k in range(1, _EWMA_N)],
    )
    return lagged.select(
        "user_id",
        "day",
        F.col("x0").alias("value"),
        F.expr(f"({_TS3_NUM}) / ({_TS3_DEN})").alias("ewma"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# TS4: seasonal-naive backtest (forecast evaluation in-engine)
# ---------------------------------------------------------------------------


@query(
    "ts4_backtest_seasonal_naive",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id % 25 = 0) t
  WHERE rn = 1
)
SELECT a.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(f.value) AS BIGINT) AS n_forecastable,
       CAST(SUM(CAST(abs(a.value - f.value) AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(f.value) AS mae,
       CAST(SUM(CAST(a.value - f.value AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(f.value) AS bias
FROM daily a
LEFT JOIN daily f ON f.user_id = a.user_id AND f.day = a.day - INTERVAL 7 DAY
GROUP BY a.user_id
ORDER BY a.user_id
""",
)
def ts4_backtest_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS4: BACKTEST of the seasonal-naive forecaster (ŷ(t) = y(t−7d)) —
    the evaluation loop that belongs next to the ts1-ts3 repair/smoothing
    stack: per series, MAE and signed bias of the one-week-ago baseline,
    plus coverage (days with a forecastable ancestor). The lag is by
    CALENDAR date (self-equi-join on day−7), not by row offset — gapped
    series must not silently compare against the wrong day, which is
    exactly the bug a row-lag backtest ships. Error sums are decimal-cast
    (exact, order-free), surfaced as sum/count doubles.

    Scale: one self-join co-partitioned on the series key (the daily
    relation is built and joined inside the same user_id clustering), and
    the metric rollup is the same shuffle. Any champion/challenger
    forecaster drops into f's position unchanged."""
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
    f = daily.select(
        F.col("user_id").alias("f_user"),
        F.col("day").alias("f_day"),
        F.col("value").alias("f_value"),
    )
    joined = daily.join(
        f,
        (F.col("f_user") == F.col("user_id"))
        & (F.col("f_day") == F.date_sub(F.col("day"), 7)),
        "left",
    )
    err = F.col("value") - F.col("f_value")
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.count("f_value").cast("bigint").alias("n_forecastable"),
            (
                F.sum(F.abs(err).cast("decimal(18,2)")).cast("double")
                / F.count("f_value")
            ).alias("mae"),
            (
                F.sum(err.cast("decimal(18,2)")).cast("double") / F.count("f_value")
            ).alias("bias"),
        )
        .orderBy("user_id")
    )


@query(
    "ts5_time_weighted_avg",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, value FROM events
),
seg AS (
  SELECT user_id, day, value,
         CAST(date_diff('second', ts,
              COALESCE(LEAD(ts) OVER (PARTITION BY user_id, day ORDER BY ts,
                                      value),
                       CAST(day + 1 AS TIMESTAMP))) AS BIGINT) AS w
  FROM e
),
agg AS (
  SELECT user_id, day,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(w) AS BIGINT) AS covered_s,
         SUM(CAST(value AS DECIMAL(18,6)) * w) AS wsum
  FROM seg GROUP BY 1, 2
)
SELECT user_id, day, n_obs, covered_s,
       ROUND(CAST(wsum AS DOUBLE) / covered_s, 4) AS twap
FROM agg
ORDER BY user_id, day
""",
)
def ts5_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS5: time-weighted average (TWAP) per user-day from IRREGULAR
    samples — each observation holds (LOCF) until the next observation or
    the end of its day, and is weighted by that holding duration in
    seconds. The irregular-sampling average a plain AVG() silently gets
    wrong (it over-weights bursts), and the settlement-price / sensor
    rollup primitive.

    Float discipline: weights are exact integer seconds from a lead()
    chain; the weighted numerator is a DECIMAL(18,6) sum (order-
    independent), so the only float op is the final division, rounded.
    Scale shape: one shuffle clusters (user, day); the lead() window and
    the aggregate share that clustering, so the fact table moves once.
    The day boundary caps segment length, which also bounds the LOCF
    carry so no segment spans a partition of the output grid."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts", "value"
    )
    w_next = W.partitionBy("user_id", "day").orderBy("ts", "value")
    day_end = (F.date_add(F.col("day"), 1)).cast("timestamp")
    seg = e.select(
        "user_id",
        "day",
        "value",
        (
            F.coalesce(F.lead("ts").over(w_next), day_end).cast("long")
            - F.col("ts").cast("long")
        ).alias("w"),
    )
    agg = seg.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("w").alias("covered_s"),
        F.sum(F.col("value").cast("decimal(18,6)") * F.col("w")).alias("wsum"),
    )
    return agg.select(
        "user_id",
        "day",
        "n_obs",
        "covered_s",
        F.round(F.col("wsum").cast("double") / F.col("covered_s"), 4).alias(
            "twap"
        ),
    ).orderBy("user_id", "day")


@query(
    "ts6_linear_interp",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id % 25 = 0) t
  WHERE rn = 1
), spine AS (
  SELECT user_id,
         UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))::DATE
             AS day
  FROM daily GROUP BY user_id
), ctx AS (
  SELECT s.user_id, s.day, d.value,
         LAST_VALUE(d.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(d.day IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         FIRST_VALUE(d.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(d.day IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id, day,
       ROUND(CASE WHEN value IS NOT NULL THEN value
            ELSE pv + (nv - pv)
                 * date_diff('day', pd, day) * 1.0 / date_diff('day', pd, nd)
            END, 4) AS value,
       CAST(value IS NULL AS BOOLEAN) AS is_interpolated
FROM ctx
ORDER BY user_id, day
""",
)
def ts6_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS6: LINEAR-interpolation gap fill — ts1's grid densification with
    holes filled by the line between the surrounding observations
    (weighted by day distance) instead of a flat carry-forward: the
    repair that keeps trends (w12/w14 slopes) unbiased on sparse feeds,
    where LOCF injects artificial flatness. Interior holes interpolate;
    series edges have both neighbors by construction (the spine spans
    min..max observed day).

    Scale shape: identical single-shuffle story to ts1 — per-series
    spine, one left join, and FOUR ignore-nulls window passes (previous
    value/day, next value/day) that all ride the same user-clustered
    sort. The interpolation weight is an exact integer day ratio; the
    filled value is rounded on both engines."""
    w_day = W.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 25 == 0)
        .select("user_id", "ts", "event_id", "value", F.to_date("ts").alias("day"))
        .withColumn("rn", F.row_number().over(w_day))
        .where(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    # spine derives FROM daily, so daily["user_id"] and spine["user_id"]
    # share lineage — written as spine["user_id"] == daily["user_id"] Spark
    # constructs a trivially-true equals predicate (WARN, silently dropped,
    # one refactor away from a cross product). Rename the observation
    # side's keys so the join condition is between distinct attributes.
    obs = daily.select(
        F.col("user_id").alias("obs_user"),
        F.col("day").alias("obs_day"),
        "value",
    )
    joined = spine.join(
        obs,
        (spine["user_id"] == obs["obs_user"]) & (spine["day"] == obs["obs_day"]),
        "left",
    ).select(spine["user_id"], spine["day"], "value")
    wb = W.partitionBy("user_id").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wf = W.partitionBy("user_id").orderBy("day").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    obs_day = F.when(F.col("value").isNotNull(), F.col("day"))
    ctx = joined.select(
        "user_id",
        "day",
        "value",
        F.last("value", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("value", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * F.datediff(
        "day", "pd"
    ) * F.lit(1.0) / F.datediff("nd", "pd")
    return ctx.select(
        "user_id",
        "day",
        F.round(
            F.when(F.col("value").isNotNull(), F.col("value")).otherwise(interp),
            4,
        ).alias("value"),
        F.col("value").isNull().alias("is_interpolated"),
    ).orderBy("user_id", "day")


@query(
    "ts7_autocorrelation",
    oracle="""
WITH s AS (
  SELECT event_type, value,
         LEAD(value, 1) OVER w AS v1,
         LEAD(value, 2) OVER w AS v2,
         LEAD(value, 3) OVER w AS v3
  FROM events
  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)
)
SELECT event_type, lag, ROUND(acf, 4) AS acf, n_pairs FROM (
  SELECT event_type, 1 AS lag, corr(value, v1) AS acf,
         CAST(COUNT(v1) AS BIGINT) AS n_pairs FROM s GROUP BY 1
  UNION ALL
  SELECT event_type, 2, corr(value, v2), CAST(COUNT(v2) AS BIGINT)
  FROM s GROUP BY 1
  UNION ALL
  SELECT event_type, 3, corr(value, v3), CAST(COUNT(v3) AS BIGINT)
  FROM s GROUP BY 1
)
ORDER BY event_type, lag
""",
)
def ts7_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS7: autocorrelation function at lags 1–3 per event type — the
    seasonality/memory diagnostic behind every rolling-frame choice (A9's
    window width, ts4's seasonal-naive lag are guesses without it; Box &
    Jenkins' identification step makes them measurements).

    Scale shape: the lag pairing runs inside (event_type, user_id)
    windows — per-SERIES partitions that stay small however many users
    exist (the 100 TB shape: billions of short series, never one giant
    ordered partition per type). Pairing emits (x_t, x_{t+k}) columns in
    place; the correlation itself is then a plain distributive groupBy
    aggregate (Spark's corr = mergeable moment sums), so the only global
    state per (type, lag) is six moments. One shuffle keys the windows;
    the agg re-shuffles the already-collapsed pair columns.
    Per-user series ordering carries the (ts, event_id) tiebreak; corr
    on both engines skips null pairs, and the statistic is rounded.
    Ref parity: SURVEY §2 A9/ts4 families (rolling + seasonal lag
    analytics); reference computes fixed last-N windows only
    (Cleaning_Glass_#1.py rolling means).
    """
    w = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    s = read_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.lead("value", 1).over(w).alias("v1"),
        F.lead("value", 2).over(w).alias("v2"),
        F.lead("value", 3).over(w).alias("v3"),
    )
    agg = s.groupBy("event_type").agg(
        F.corr("value", "v1").alias("a1"),
        F.count("v1").alias("n1"),
        F.corr("value", "v2").alias("a2"),
        F.count("v2").alias("n2"),
        F.corr("value", "v3").alias("a3"),
        F.count("v3").alias("n3"),
    )
    return agg.select(
        "event_type",
        F.expr(
            "stack(3, 1, round(a1, 4), n1, 2, round(a2, 4), n2,"
            " 3, round(a3, 4), n3) AS (lag, acf, n_pairs)"
        ),
    ).orderBy("event_type", "lag")


@query(
    "ts8_cusum_changepoint",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, ts, value,
         AVG(value) OVER (PARTITION BY user_id) AS mu,
         STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
  FROM events
),
prefix AS (
  SELECT user_id, event_id, ts, sd,
         SUM(value - mu - 0.5 * sd) OVER w AS p
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
walk AS (
  SELECT user_id, event_id, ts, sd, p,
         MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS runmin
  FROM prefix
),
scored AS (
  SELECT user_id, event_id, ts,
         (p - LEAST(0, runmin)) / sd AS score
  FROM walk
)
SELECT user_id, event_id, ROUND(score, 4) AS cusum_score
FROM scored WHERE score > 2.0
ORDER BY user_id, event_id
""",
)
def ts8_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS8: one-sided CUSUM change-point alarms per user series (Page
    1954) — the drift detector a feed-quality pipeline runs beside dq2's
    static z-scores: z-scores flag single outliers, CUSUM accumulates
    small persistent shifts until they cross the decision interval.

    The textbook recursion S_t = max(0, S_{t-1} + x_t − μ0 − k) looks
    iterative, but solves in closed form to S_t = P_t − min(0, min_{j≤t}
    P_j) with P the prefix sum of the slack-adjusted deviations — two
    stacked running windows, no loop, no stateful UDF. Identical algebra
    on both engines; the sequential ROWS UNBOUNDED PRECEDING sums add in
    the same (ts, event_id) order, so the score is bit-stable before its
    final rounding.

    Scale shape: single shuffle on user_id; every window (mean, stddev,
    prefix sum, running min) shares that partitioning and runs
    sequentially inside each small per-user series. Reference values μ0/k
    are per-series statistics computed in the same pass — no second scan,
    no driver round-trip. Alarm rows (score > 2σ) are the only output
    that leaves the executors.
    """
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    wu = W.partitionBy("user_id")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    base = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(wu).alias("mu"),
        F.stddev_samp("value").over(wu).alias("sd"),
    )
    walk = base.select(
        "user_id",
        "event_id",
        "ts",
        "sd",
        F.sum(F.col("value") - F.col("mu") - 0.5 * F.col("sd"))
        .over(wseq)
        .alias("p"),
    ).withColumn("runmin", F.min("p").over(wseq))
    scored = walk.select(
        "user_id",
        "event_id",
        ((F.col("p") - F.least(F.lit(0.0), F.col("runmin"))) / F.col("sd")).alias(
            "score"
        ),
    )
    return (
        scored.filter(F.col("score") > 2.0)
        .select("user_id", "event_id", F.round("score", 4).alias("cusum_score"))
        .orderBy("user_id", "event_id")
    )


@query(
    "ts9_seasonal_strength",
    oracle="""
WITH base AS (
  SELECT event_type, hour(ts) AS hr, value FROM events
),
seas AS (
  SELECT event_type, hr, AVG(value) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM base GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, hr, m,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ROUND(m, 6) DESC, hr) AS rk_peak,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ROUND(m, 6) ASC, hr) AS rk_trough
  FROM seas
),
resid AS (
  SELECT b.event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         VAR_SAMP(b.value) AS var_total,
         VAR_SAMP(b.value - s.m) AS var_resid
  FROM base b JOIN seas s
    ON s.event_type = b.event_type AND s.hr = b.hr
  GROUP BY 1
)
SELECT r.event_type, r.n,
       ROUND(r.var_total, 4) AS var_total,
       ROUND(r.var_resid, 4) AS var_resid,
       ROUND(GREATEST(0, 1 - r.var_resid / r.var_total), 4)
           AS seasonal_strength,
       CAST(p.hr AS INT) AS peak_hour,
       CAST(t.hr AS INT) AS trough_hour
FROM resid r
JOIN ranked p ON p.event_type = r.event_type AND p.rk_peak = 1
JOIN ranked t ON t.event_type = r.event_type AND t.rk_trough = 1
ORDER BY r.event_type
""",
)
def ts9_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS9: hour-of-day seasonal strength per event type — Hyndman &
    Athanasopoulos' F_s = max(0, 1 − Var(remainder)/Var(detrended)) with
    a seasonal-means decomposition, plus the peak and trough hours. The
    decision input for every windowing choice upstream: strength ≈ 0
    says ts4's seasonal-naive baseline and s6's day-aligned windows are
    wasted; strength near 1 says hourly partitioning will skew and
    needs time-salting.

    Scale shape: the seasonal profile contracts the stream to
    (type, hour) grain in one map-side-combined pass and broadcasts back
    (|types|·24 rows); residual and total variances are mergeable-moment
    aggregates in a SECOND single pass over the stream — two scans
    total, no windows over raw events, no global state beyond 24-row
    profiles. Peak/trough argmax runs on the contracted profile with
    6-digit-rounded means + hour tiebreak so float ulps cannot flip the
    winner."""
    base = read_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr"), "value"
    )
    seas = base.groupBy("event_type", "hr").agg(
        F.avg("value").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    rk_peak = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc(F.round("m", 6)), "hr")
    )
    rk_trough = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.round("m", 6).asc(), "hr")
    )
    ranked = seas.select(
        "event_type", "hr", "m", rk_peak.alias("rk_peak"), rk_trough.alias("rk_trough")
    )
    resid = (
        base.join(F.broadcast(seas.select("event_type", "hr", "m")), ["event_type", "hr"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.var_samp("value").alias("var_total"),
            F.var_samp(F.col("value") - F.col("m")).alias("var_resid"),
        )
    )
    peak = ranked.filter(F.col("rk_peak") == 1).select(
        "event_type", F.col("hr").cast("int").alias("peak_hour")
    )
    trough = ranked.filter(F.col("rk_trough") == 1).select(
        "event_type", F.col("hr").cast("int").alias("trough_hour")
    )
    return (
        resid.join(F.broadcast(peak), "event_type")
        .join(F.broadcast(trough), "event_type")
        .select(
            "event_type",
            "n",
            F.round("var_total", 4).alias("var_total"),
            F.round("var_resid", 4).alias("var_resid"),
            F.round(
                F.greatest(
                    F.lit(0.0), 1 - F.col("var_resid") / F.col("var_total")
                ),
                4,
            ).alias("seasonal_strength"),
            "peak_hour",
            "trough_hour",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TS10: Kaplan-Meier survival curve (product-limit estimator)
# ---------------------------------------------------------------------------

#: A "churn" is the first error event whose value exceeds this — calibrated
#: so both lanes of the estimator are populated in the test data (sf0.01:
#: 75/150 users churn, 75 are right-censored at their last-seen event).
_TS10_CHURN_VALUE = 150


@query(
    "ts10_kaplan_meier",
    oracle=f"""
WITH birth AS (
  SELECT user_id, MIN(ts) AS b, MAX(ts) AS last_seen FROM events GROUP BY 1
),
churn AS (
  SELECT user_id, MIN(ts) AS c FROM events
  WHERE event_type = 'error' AND value > {_TS10_CHURN_VALUE}
  GROUP BY 1
),
obs AS (
  SELECT birth.user_id,
         CASE WHEN churn.c IS NOT NULL
              THEN date_diff('day', CAST(birth.b AS DATE), CAST(churn.c AS DATE))
              ELSE date_diff('day', CAST(birth.b AS DATE),
                             CAST(birth.last_seen AS DATE)) END AS dur,
         CASE WHEN churn.c IS NOT NULL THEN 1 ELSE 0 END AS died
  FROM birth LEFT JOIN churn USING (user_id)
),
grp AS (
  SELECT CAST(dur AS INT) AS dur_day,
         CAST(SUM(died) AS BIGINT) AS n_deaths,
         CAST(SUM(1 - died) AS BIGINT) AS n_censored
  FROM obs GROUP BY 1
),
risk AS (
  SELECT dur_day, n_deaths, n_censored,
         SUM(n_deaths + n_censored)
             OVER (ORDER BY dur_day DESC) AS n_at_risk
  FROM grp
)
SELECT dur_day, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_deaths, n_censored,
       ROUND(EXP(SUM(LN(1.0 - CAST(n_deaths AS DOUBLE) / n_at_risk))
                 OVER (ORDER BY dur_day)), 4) AS survival
FROM risk
WHERE n_deaths > 0
ORDER BY dur_day
""",
)
def ts10_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS10: Kaplan-Meier product-limit survival curve (Kaplan & Meier,
    JASA 1958) over user lifetimes mined from the event log: birth = first
    event, death = first error with value > _TS10_CHURN_VALUE, users who
    never die are RIGHT-CENSORED at their last-seen event — the censoring
    handling is the whole point (naive "fraction still alive" curves are
    biased the moment observation windows differ per user, which they
    always do in a growing product). The retention primitive behind
    churn/LTV analytics, and the missing rigor in a24's cohort grid.

    Scale shape: the event scan collapses to USER GRAIN in one partially
    aggregated pass (min/max ts, conditional min for the death time), so
    everything after the first shuffle is |users| rows; the life table
    then contracts to DISTINCT DURATION grain (bounded by the observation
    span in days, a few hundred rows at any corpus size). The at-risk
    count is a descending cumulative sum and the survival product is the
    classic EXP(running SUM(LN(1 - d/n))) — both windows run over the
    duration-grain table, never over raw events, and are declared via
    ``bounded_window``: the grain is |distinct lifetimes in days| ≤ the
    observation span (≈3.7k rows even for a decade of data at any corpus
    size) — bounded by the calendar, not the data. Keeping the survival
    log-sum sequential (one task) also keeps its float accumulation order
    identical to the oracle's ordered window.

    Determinism: durations and death/censor counts are exact integers;
    only the survival product is floating and it is ROUND()ed after an
    ordered prefix sum both engines evaluate in the same order.
    Ref parity: SURVEY §2 A-family retention analytics (the reference
    stops at per-season averages, e.g. Cleaning_Glass_#1.py aggregates).
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    obs = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("b"),
            F.max("ts").alias("last_seen"),
            F.min(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("value") > _TS10_CHURN_VALUE),
                    F.col("ts"),
                )
            ).alias("c"),
        )
        .select(
            F.when(
                F.col("c").isNotNull(),
                F.datediff(F.to_date("c"), F.to_date("b")),
            )
            .otherwise(F.datediff(F.to_date("last_seen"), F.to_date("b")))
            .cast("int")
            .alias("dur_day"),
            F.when(F.col("c").isNotNull(), 1).otherwise(0).alias("died"),
        )
    )
    grp = obs.groupBy("dur_day").agg(
        F.sum("died").cast("long").alias("n_deaths"),
        F.sum(1 - F.col("died")).cast("long").alias("n_censored"),
    )
    w_risk = bounded_window(
        F.desc("dur_day"), anchor="dur_day"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = grp.select(
        "dur_day",
        "n_deaths",
        "n_censored",
        F.sum(F.col("n_deaths") + F.col("n_censored"))
        .over(w_risk)
        .cast("long")
        .alias("n_at_risk"),
    )
    w_surv = bounded_window("dur_day", anchor="dur_day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        risk.withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            1.0
                            - F.col("n_deaths").cast("double") / F.col("n_at_risk")
                        )
                    ).over(w_surv)
                ),
                4,
            ),
        )
        .filter(F.col("n_deaths") > 0)
        .select("dur_day", "n_at_risk", "n_deaths", "n_censored", "survival")
        .orderBy("dur_day")
    )


# ---------------------------------------------------------------------------
# TS11: LTTB downsampling (largest-triangle, bucket-anchor variant)
# ---------------------------------------------------------------------------

#: Fixed TIME width per LTTB bucket (6 h). Equal-time buckets instead of the
#: textbook equal-count buckets: bucket assignment becomes a stateless
#: expression on the timestamp (no global row_number pass), so the plan has
#: no single-partition window over raw events — the scalable variant.
_TS11_BUCKET_SEC = 6 * 3600


def _ts11_area2():
    """TS11's scaled triangle-area argmax key over columns
    (x, y, pa_sx, pa_sy, pa_n, na_sx, na_sy, na_n) — in DECIMAL(38,0):
    the factor products scale ~n^3 per bucket and blow past BIGINT once
    buckets hold >~10k rows (the 30x ladder hit ANSI ARITHMETIC_OVERFLOW
    at sf3); decimal keeps the argmax exact to ~1e8 rows per bucket."""
    return F.abs(
        (
            F.col("pa_sx").cast("decimal(38,0)") * F.col("na_n")
            - F.col("na_sx").cast("decimal(38,0)") * F.col("pa_n")
        )
        * (F.col("y").cast("decimal(38,0)") * F.col("pa_n") - F.col("pa_sy"))
        - (
            F.col("pa_sx").cast("decimal(38,0)")
            - F.col("x").cast("decimal(38,0)") * F.col("pa_n")
        )
        * (
            F.col("pa_sy").cast("decimal(38,0)") * F.col("na_n")
            - F.col("na_sy").cast("decimal(38,0)") * F.col("pa_n")
        )
    )


@query(
    "ts11_lttb_downsample",
    oracle=f"""
WITH pts AS (
  SELECT epoch_ms(ts) // 1000 AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y,
         ts, event_id,
         (epoch_ms(ts) // 1000) // {_TS11_BUCKET_SEC} AS b
  FROM events
),
agg AS (
  SELECT b, CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1
),
bounds AS (SELECT MIN(b) AS bmin, MAX(b) AS bmax FROM agg),
interior AS (
  SELECT p.b, p.x, p.y, p.ts, p.event_id,
         ABS((CAST(pa.sx AS HUGEINT) * na.n - CAST(na.sx AS HUGEINT) * pa.n)
             * (CAST(p.y AS HUGEINT) * pa.n - pa.sy)
             - (CAST(pa.sx AS HUGEINT) - CAST(p.x AS HUGEINT) * pa.n)
             * (CAST(pa.sy AS HUGEINT) * na.n - CAST(na.sy AS HUGEINT) * pa.n))
             AS area2
  FROM pts p
  JOIN agg pa ON pa.b = p.b - 1
  JOIN agg na ON na.b = p.b + 1
  CROSS JOIN bounds
  WHERE p.b > bounds.bmin AND p.b < bounds.bmax
),
picked AS (
  SELECT b, x, y,
         ROW_NUMBER() OVER (PARTITION BY b
                            ORDER BY area2 DESC, ts, event_id) AS rn
  FROM interior
),
edges AS (
  SELECT b, x, y,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY ts, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY b ORDER BY ts DESC, event_id DESC)
             AS rn_last
  FROM pts CROSS JOIN bounds
  WHERE b = bounds.bmin OR b = bounds.bmax
)
SELECT CAST(b AS BIGINT) AS bucket, CAST(x AS BIGINT) AS x_epoch_sec, y AS y_cents
FROM (
  SELECT b, x, y FROM picked WHERE rn = 1
  UNION ALL
  SELECT b, x, y FROM edges
  WHERE (b = (SELECT bmin FROM bounds) AND rn_first = 1)
     OR (b = (SELECT bmax FROM bounds) AND rn_last = 1)
)
ORDER BY bucket, x_epoch_sec
""",
)
def ts11_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS11: LTTB downsampling (Steinarsson 2013, "largest triangle three
    buckets") of the event value series — keep, per bucket, the point
    that subtends the largest triangle against its neighbor buckets, so
    the downsampled series preserves visual extremes instead of averaging
    them away (the downsampler inside every time-series dashboard).

    Two deliberate deviations from the sequential textbook algorithm,
    both FOR scale and both part of the shared definition so the oracle
    is exact:
      * equal-TIME buckets (_TS11_BUCKET_SEC) instead of equal-count —
        bucket id is a stateless expression on the timestamp, so no
        global row-numbering pass exists anywhere in the plan;
      * both anchors are neighbor-bucket CENTROIDS (the classic
        effective-area variant) rather than the previously-selected
        point — this removes the left-to-right sequential dependency,
        making every bucket's argmax independent and parallel.

    Integer-exact argmax: with a = centroid(b-1), c = centroid(b+1), the
    triangle area's sign-free double form is scaled by na²·nc (positive
    constants per bucket) into pure integer products of epoch-second and
    value-cent sums — `area2 = |(sx_a·n_a' ... )|` as written — so the
    per-bucket winner cannot flip on a float ulp; ties break on
    (ts, event_id). The products scale as n³ per bucket (sums carry a
    factor n, and factors multiply), which OVERFLOWS BIGINT once buckets
    pass ~10k rows (caught by the 30x ladder: ANSI ARITHMETIC_OVERFLOW
    at sf3), so area2 is computed in DECIMAL(38,0) here and HUGEINT in
    the oracle — exact to n ≈ 1e8 rows per bucket, ordering unchanged.

    Scale shape: one partial-agg shuffle to bucket grain, then the point
    table joins the TINY bucket-centroid frame twice (broadcast) and the
    argmax window partitions BY BUCKET — fully parallel, no global
    window over raw rows. First/last buckets contribute their first/last
    point (LTTB's fixed endpoints)."""
    pts = read_table(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        "ts",
        "event_id",
        (F.unix_timestamp("ts") / _TS11_BUCKET_SEC).cast("long").alias("b"),
    )
    # persisted: the bucket-grain contraction feeds THREE broadcast builds
    # (prev-neighbor, next-neighbor, bounds) whose shifted projections are
    # plan-distinct, so without the pin each build re-runs the groupBy
    # over the raw events.
    agg = (
        pts.groupBy("b")
        .agg(
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .persist()
    )
    bounds = agg.agg(F.min("b").alias("bmin"), F.max("b").alias("bmax"))
    pa = F.broadcast(
        agg.select(
            (F.col("b") + 1).alias("b"),
            F.col("sx").alias("pa_sx"),
            F.col("sy").alias("pa_sy"),
            F.col("n").alias("pa_n"),
        )
    )
    na = F.broadcast(
        agg.select(
            (F.col("b") - 1).alias("b"),
            F.col("sx").alias("na_sx"),
            F.col("sy").alias("na_sy"),
            F.col("n").alias("na_n"),
        )
    )
    interior = (
        pts.crossJoin(F.broadcast(bounds))
        .filter((F.col("b") > F.col("bmin")) & (F.col("b") < F.col("bmax")))
        .join(pa, "b")
        .join(na, "b")
        .withColumn("area2", _ts11_area2())
    )
    picked = (
        interior.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("b").orderBy(F.desc("area2"), "ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("b", "x", "y")
    )
    edge_pts = pts.crossJoin(F.broadcast(bounds)).filter(
        (F.col("b") == F.col("bmin")) | (F.col("b") == F.col("bmax"))
    )
    edges = (
        edge_pts.withColumn(
            "rn_first",
            F.row_number().over(W.partitionBy("b").orderBy("ts", "event_id")),
        )
        .withColumn(
            "rn_last",
            F.row_number().over(
                W.partitionBy("b").orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter(
            ((F.col("b") == F.col("bmin")) & (F.col("rn_first") == 1))
            | ((F.col("b") == F.col("bmax")) & (F.col("rn_last") == 1))
        )
        .select("b", "x", "y")
    )
    return (
        picked.unionAll(edges)
        .select(
            F.col("b").cast("long").alias("bucket"),
            F.col("x").cast("long").alias("x_epoch_sec"),
            F.col("y").alias("y_cents"),
        )
        .orderBy("bucket", "x_epoch_sec")
    )
