"""Text-analysis + extraction catalog queries (SURVEY §2.4 X*, north-star
text ops) over the ``documents`` and ``orders`` tables.

The extraction suite constructs betting-shaped text deterministically from
integer columns, then recovers the typed fields with the §2.4 expression
library — the same parse the reference does row-at-a-time in Python
(nba_props_scraper.py:733-822), here fully vectorized and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nba_data_pipeline_spark.functions.extract import (
    detect_sportsbook,
    extract_first_odds,
    extract_hit_rate_pct,
    extract_over_under,
    extract_prop_line,
    extract_spread,
    format_date_mdY,
    implied_probability,
    resolve_relative_date,
    sanitize_filename,
)
from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.operators.textops import (
    LANG_STOPWORDS,
    PUNCT_PATTERN,
    doc_fingerprint,
    predict_lang_fast,
    quality_features,
    stopword_hits,
    token_count_bpe,
    token_count_ws,
    ws_tokens,
)
from nba_data_pipeline_spark.plans.registry import pinned_sort, query

_TOKS = r"string_split_regex(trim(text), '\s+')"


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` repartitioned to the session's parallelism for the
    regex-heavy per-document feature queries: the table lands as one row
    group, and without a shuffle the tokenize/score expressions would run
    in a single task. The shuffle moves raw text once and buys a 32-way
    expression stage; at cluster scale, where the scan already has many
    splits, callers should drop this in favor of the scan's own
    partitioning (maxPartitionBytes governs it)."""
    return read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


def _orders_wide(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """Narrow ``orders`` projection repartitioned to the session's
    parallelism — same single-row-group rationale as ``_docs_wide``, for
    the X-suite queries whose regex/parse expressions dominate the scan."""
    return (
        read_table(spark, sf_dir, "orders")
        .select(*cols)
        .repartition(spark.sparkContext.defaultParallelism)
    )


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, t -> t IN ({words})))"


@query(
    "ta_token_counts",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens_bpe,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def ta_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish pre-tokenizer regex) — the
    document-budget primitive for LLM data pipelines."""
    d = _docs_wide(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_tokens_ws"),
        token_count_bpe(F.col("text")).alias("n_tokens_bpe"),
        "n_chars",
    ).orderBy("doc_id")


@query(
    "ta_quality_scores",
    oracle=f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len({_TOKS}) AS INT) AS n_tokens,
       CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len({_TOKS}) AS avg_token_len,
       CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / length(text) AS punct_ratio,
       CAST({_sql_stop_hits("en")} AS DOUBLE) / len({_TOKS}) AS stopword_ratio
FROM documents
ORDER BY doc_id
""",
)
def ta_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features (length / punctuation / stopword ratios) — exact
    integer counts divided pairwise, cross-engine stable."""
    d = _docs_wide(spark, sf_dir)
    feats = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    ).orderBy("doc_id")


_LANGS = sorted(LANG_STOPWORDS)
_SQL_SCORES = ",\n       ".join(f"{_sql_stop_hits(lang)} AS s_{lang}" for lang in _LANGS)
_SQL_BEST = "CASE " + " ".join(
    f"WHEN s_{lang} = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN '{lang}'"
    for lang in _LANGS
) + " END"


@query(
    "ta_language_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
       {_SQL_SCORES}
  FROM documents
)
SELECT doc_id, lang AS labeled_lang, {_SQL_BEST} AS predicted_lang,
       CAST({_SQL_BEST} = lang AS BOOLEAN) AS lang_match
FROM scored
ORDER BY doc_id
""",
)
def ta_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword scoring with a deterministic first-max
    tie-break, compared against the dataset's label column."""
    d = _docs_wide(spark, sf_dir)
    pred = predict_lang_fast(F.col("text"))
    out = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("lang_match"),
    )
    # pinned: the range sampling would re-run the Arrow predict lane
    return pinned_sort(out, "doc_id")


@query(
    "ta_fingerprint_groups",
    oracle=f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
  FROM documents
)
SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM fp GROUP BY fingerprint
ORDER BY fingerprint
""",
)
def ta_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct token set —
    word-order/duplication-invariant near-dup key, grouped."""
    d = _docs_wide(spark, sf_dir)
    return (
        d.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc"))
        .orderBy("fingerprint")
    )


@query(
    "ta_stratified_sample",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, source,
         substring(md5(concat('seed42:', CAST(doc_id AS VARCHAR))), 1, 2) AS hk
  FROM documents
)
SELECT doc_id, lang, source FROM keyed
WHERE hk < CASE WHEN lang = 'en' THEN '20' ELSE '80' END
ORDER BY doc_id
""",
)
def ta_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus downsampling: per-language keep rates via a seeded
    hash threshold (en ~12.5%, others ~50% — down-weight the dominant
    language). Hash-threshold sampling is the 100 TB-safe form: it's
    deterministic (reproducible across runs/engines — no RNG state), it
    pushes down as a plain filter (no shuffle, no sampling operator), and
    membership is stable under re-partitioning, so incremental runs keep
    identical samples. The 2-hex-char key compares lexicographically, which
    both engines order identically."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    hk = F.substring(
        F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string"))), 1, 2
    )
    thr = F.when(F.col("lang") == "en", F.lit("20")).otherwise(F.lit("80"))
    return d.filter(hk < thr).orderBy("doc_id")


@query(
    "ta_quality_percentiles",
    oracle="""
SELECT lang,
       MIN(n_chars) AS min_chars,
       quantile_cont(n_chars, 0.5) AS median_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars,
       MAX(n_chars) AS max_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def ta_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution statistics per language stratum: exact median / p90 of
    document length (percentile_cont semantics — linear interpolation,
    verified bit-identical to DuckDB's quantile_cont) plus min/max. Exact
    percentile sorts within the group; at 100 TB swap to
    approx_percentile(...) (t-digest sketch, map-side combinable) and keep
    this as the small-stratum auditor."""
    d = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    return (
        d.groupBy("lang")
        .agg(
            F.min("n_chars").alias("min_chars"),
            F.percentile("n_chars", F.lit(0.5)).alias("median_chars"),
            F.percentile("n_chars", F.lit(0.9)).alias("p90_chars"),
            F.max("n_chars").alias("max_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


@query(
    "ta_token_budget_pack",
    oracle="""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
         md5(concat('pack:', CAST(doc_id AS VARCHAR))) AS hk
  FROM documents
), ranked AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, lang, n_tokens, cum_tokens
FROM ranked WHERE cum_tokens <= 20000
ORDER BY doc_id
""",
)
def ta_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: fill a fixed per-language token budget (20k)
    by admitting documents in seeded-hash order until the running total
    would exceed it — how a training mix hits per-language token targets
    deterministically. One window per language partition (running sum over
    the hash order) and a filter; at 100 TB the partitionBy(lang) window
    shuffles once on the stratum key, and skewed strata split under AQE."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))).alias("hk"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("hk", "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 20000)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X1/X2/X7/X8/X19 extraction suite + X21 odds math on constructed prop text.
# ---------------------------------------------------------------------------

_SQL_TEXT = (
    "concat('Player#', CAST(o_custkey AS VARCHAR), ' Over ', "
    "CAST(o_orderkey % 40 AS VARCHAR), '.5 Points at ', "
    "CASE WHEN o_orderkey % 2 = 0 THEN '-' ELSE '+' END, "
    "CAST(100 + o_orderkey % 300 AS VARCHAR), ' on FanDuel ', "
    "CAST(o_orderkey % 101 AS VARCHAR), '%')"
)


def _spark_prop_text() -> F.Column:
    return F.concat(
        F.lit("Player#"),
        F.col("o_custkey").cast("string"),
        F.lit(" Over "),
        (F.col("o_orderkey") % 40).cast("string"),
        F.lit(".5 Points at "),
        F.when(F.col("o_orderkey") % 2 == 0, "-").otherwise("+"),
        (100 + F.col("o_orderkey") % 300).cast("string"),
        F.lit(" on FanDuel "),
        (F.col("o_orderkey") % 101).cast("string"),
        F.lit("%"),
    )


@query(
    "x_prop_extraction",
    oracle=f"""
WITH raw AS (SELECT o_orderkey, {_SQL_TEXT} AS content FROM orders)
SELECT o_orderkey,
       TRY_CAST(NULLIF(regexp_extract(content, '(\\d+\\.5)', 1), '') AS DOUBLE) AS prop_line,
       TRY_CAST(NULLIF(regexp_extract(content, '[+-]\\d{{3,4}}', 0), '') AS INT) AS odds,
       TRY_CAST(NULLIF(regexp_extract(content, '(\\d{{1,3}})%', 1), '') AS INT) AS hit_rate_pct,
       CASE WHEN contains(lower(content), 'fanduel') THEN 'fanduel' END AS sportsbook,
       substring(md5(concat_ws('_', CAST(o_orderkey AS VARCHAR), content)), 1, 12) AS surrogate_id
FROM raw
ORDER BY o_orderkey
""",
)
def x_prop_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-field extraction (X1 odds, X2 line, X7 hit-rate, X8 book,
    X19 md5 surrogate) from prop-shaped text — the reference's Python
    parsers (nba_props_scraper.py:733-822) as pure regexp expressions."""
    o = _orders_wide(spark, sf_dir, "o_orderkey", "o_custkey")
    raw = o.withColumn("content", _spark_prop_text())
    return raw.select(
        "o_orderkey",
        extract_prop_line(F.col("content")).alias("prop_line"),
        extract_first_odds(F.col("content")).alias("odds"),
        extract_hit_rate_pct(F.col("content")).alias("hit_rate_pct"),
        detect_sportsbook(F.col("content")).alias("sportsbook"),
        F.substring(
            F.md5(F.concat_ws("_", F.col("o_orderkey").cast("string"), F.col("content"))),
            1,
            12,
        ).alias("surrogate_id"),
    ).orderBy("o_orderkey")


@query(
    "x21_odds_math",
    oracle="""
WITH odds AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 0 THEN -(100 + o_orderkey % 300)
              ELSE (100 + o_orderkey % 300) END AS over_odds,
         CASE WHEN o_orderkey % 2 = 0 THEN (105 + o_orderkey % 250)
              ELSE -(105 + o_orderkey % 250) END AS under_odds
  FROM orders
)
SELECT o_orderkey, over_odds, under_odds,
       CASE WHEN over_odds > 0 THEN 100.0 / (over_odds + 100.0)
            ELSE -over_odds / (-over_odds + 100.0) END AS over_prob,
       CASE WHEN under_odds > 0 THEN 100.0 / (under_odds + 100.0)
            ELSE -under_odds / (-under_odds + 100.0) END AS under_prob,
       (CASE WHEN over_odds > 0 THEN 100.0 / (over_odds + 100.0)
             ELSE -over_odds / (-over_odds + 100.0) END
        + CASE WHEN under_odds > 0 THEN 100.0 / (under_odds + 100.0)
               ELSE -under_odds / (-under_odds + 100.0) END - 1.0) AS vig
FROM odds
ORDER BY o_orderkey
""",
)
def x21_odds_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """American-odds math (X21, hardrock_scraper.py:497-503): implied
    probability per side + book vig, pure double arithmetic."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    over = F.when(
        F.col("o_orderkey") % 2 == 0, -(100 + F.col("o_orderkey") % 300)
    ).otherwise(100 + F.col("o_orderkey") % 300)
    under = F.when(
        F.col("o_orderkey") % 2 == 0, 105 + F.col("o_orderkey") % 250
    ).otherwise(-(105 + F.col("o_orderkey") % 250))
    df = o.withColumn("over_odds", over).withColumn("under_odds", under)
    over_p = implied_probability(F.col("over_odds"))
    under_p = implied_probability(F.col("under_odds"))
    return df.select(
        "o_orderkey",
        "over_odds",
        "under_odds",
        over_p.alias("over_prob"),
        under_p.alias("under_prob"),
        (over_p + under_p - 1.0).alias("vig"),
    ).orderBy("o_orderkey")


@query(
    "x_sanitize_dates",
    oracle="""
WITH raw AS (
  SELECT o_orderkey, o_orderstatus, o_orderdate,
         concat('Game: ', o_orderpriority, '/', o_orderstatus, '?*',
                CAST(o_orderkey AS VARCHAR)) AS fname_raw,
         CASE o_orderkey % 3 WHEN 0 THEN 'today' WHEN 1 THEN 'tomorrow'
              ELSE strftime(o_orderdate, '%Y-%m-%d') END AS rel_raw,
         concat(CASE o_orderstatus WHEN 'F' THEN 'BOS' WHEN 'O' THEN 'LAL'
                     ELSE 'CHI' END,
                ' by ', CAST(o_orderkey % 12 AS VARCHAR), '.',
                CAST((o_orderkey % 2) * 5 AS VARCHAR),
                ' o/u ', CAST(200 + o_orderkey % 30 AS VARCHAR), '.5') AS header
  FROM orders
),
cooked AS (
  SELECT o_orderstatus,
         substring(regexp_replace(regexp_replace(regexp_replace(fname_raw,
                   '[<>:"/\\\\|?*]', '_', 'g'), '_+', '_', 'g'),
                   '^_|_$', '', 'g'), 1, 80) AS fname,
         strftime(o_orderdate, '%m/%d/%Y') AS date_mdY,
         CASE WHEN rel_raw = 'today' THEN 0
              WHEN rel_raw = 'tomorrow' THEN 1
              ELSE CAST(CAST(rel_raw AS DATE) - current_date AS INT) END
             AS rel_offset_days,
         regexp_extract(header, '([A-Z]{3}) by (\\d+\\.?\\d*)', 1) AS fav,
         CAST(regexp_extract(header, '([A-Z]{3}) by (\\d+\\.?\\d*)', 2)
              AS DOUBLE) AS spread,
         CAST(regexp_extract(header, 'o/u\\s*(\\d+\\.?\\d*)', 1) AS DOUBLE)
             AS ou
  FROM raw
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(fname) AS min_fname, MAX(fname) AS max_fname,
       MIN(date_mdY) AS min_date, MAX(date_mdY) AS max_date,
       CAST(SUM(CASE WHEN rel_offset_days IN (0, 1)
                     THEN rel_offset_days ELSE 0 END) AS BIGINT)
           AS rel_today_tomorrow_sum,
       MIN(fav) AS fav, SUM(spread) AS sum_spread, SUM(ou) AS sum_ou
FROM cooked
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def x_sanitize_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 filename sanitization + X16 relative-date resolution + X15 date
    format + X20 betting-header parse, batched into one oracle-checked pass
    (VERDICT r5 item 8 — these were pytest-only). Raw strings are built
    deterministically from orders columns, pushed through the REAL extract
    functions (functions/extract.py:91,109,114,134,142 — reference parity
    nba_props_scraper.py:862-872,94-102, lineup_scraper.py:71-78), then
    re-aggregated so the DuckDB twin hash-checks every transform.

    Determinism: the 'today'/'tomorrow' lanes are compared as OFFSETS from
    current_date (0/1 — stable regardless of run date); absolute dates are
    compared as formatted strings with no clock dependence. Spreads/totals
    are exact multiples of 0.5, so their double sums are exact.

    Scale shape: pure per-row codegen expressions over one scan + one
    map-side-combined 3-group aggregate — no shuffle wider than the
    3-value status alphabet."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"
    )
    k = F.col("o_orderkey")
    fname_raw = F.concat(
        F.lit("Game: "),
        F.col("o_orderpriority"),
        F.lit("/"),
        F.col("o_orderstatus"),
        F.lit("?*"),
        k.cast("string"),
    )
    rel_raw = (
        F.when(k % 3 == 0, F.lit("today"))
        .when(k % 3 == 1, F.lit("tomorrow"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    header = F.concat(
        F.when(F.col("o_orderstatus") == "F", F.lit("BOS"))
        .when(F.col("o_orderstatus") == "O", F.lit("LAL"))
        .otherwise(F.lit("CHI")),
        F.lit(" by "),
        (k % 12).cast("string"),
        F.lit("."),
        ((k % 2) * 5).cast("string"),
        F.lit(" o/u "),
        (200 + k % 30).cast("string"),
        F.lit(".5"),
    )
    resolved = resolve_relative_date(rel_raw)
    rel_offset = F.datediff(resolved, F.current_date())
    fav, spread = extract_spread(header)
    cooked = o.select(
        "o_orderstatus",
        sanitize_filename(fname_raw).alias("fname"),
        format_date_mdY(F.col("o_orderdate")).alias("date_mdY"),
        F.when(rel_raw.isin("today", "tomorrow"), rel_offset)
        .otherwise(F.lit(0))
        .alias("rel_clamped"),
        fav.alias("fav"),
        spread.alias("spread"),
        extract_over_under(header).alias("ou"),
    )
    return (
        cooked.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("fname").alias("min_fname"),
            F.max("fname").alias("max_fname"),
            F.min("date_mdY").alias("min_date"),
            F.max("date_mdY").alias("max_date"),
            F.sum("rel_clamped").cast("bigint").alias("rel_today_tomorrow_sum"),
            F.min("fav").alias("fav"),
            F.sum("spread").alias("sum_spread"),
            F.sum("ou").alias("sum_ou"),
        )
        .orderBy("o_orderstatus")
    )


_SQL_MATCHUP_RAW = (
    "concat('  T', CAST(o_orderkey % 30 AS VARCHAR), '   @   T', "
    "CAST(o_custkey % 30 AS VARCHAR), '  (', CAST(o_orderkey % 20 AS VARCHAR), "
    "'-', CAST(o_custkey % 20 AS VARCHAR), ')  ')"
)


@query(
    "x_matchup_cleanup",
    oracle=f"""
WITH raw AS (
  SELECT o_orderkey, o_orderdate, {_SQL_MATCHUP_RAW} AS raw_text FROM orders
), cleaned AS (
  SELECT o_orderkey, o_orderdate,
         trim(regexp_replace(raw_text, '\\s+', ' ', 'g')) AS clean_text
  FROM raw
), stripped AS (
  SELECT o_orderkey, o_orderdate, clean_text,
         regexp_replace(clean_text, '\\s*\\([^)]*\\)\\s*$', '') AS matchup
  FROM cleaned
)
SELECT o_orderkey, clean_text, matchup,
       regexp_extract(matchup, '^(\\S+) @ (\\S+)$', 1) AS away_team,
       regexp_extract(matchup, '^(\\S+) @ (\\S+)$', 2) AS home_team,
       strftime(o_orderdate, '%m/%d/%Y') AS game_date_us
FROM stripped
ORDER BY o_orderkey
""",
)
def x_matchup_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 whitespace normalize + X10 record-paren strip + X3 matchup parse +
    X15 date format in one pass — the reference's per-row cleanup chain
    (DEFENSEVSPOSTION.PY:155-175, nba_insights_scraper.py:397-404,
    Basketball_Refrence_alltables.py:165-166) as pure codegen expressions."""
    o = _orders_wide(spark, sf_dir, "o_orderkey", "o_custkey", "o_orderdate")
    raw = F.concat(
        F.lit("  T"),
        (F.col("o_orderkey") % 30).cast("string"),
        F.lit("   @   T"),
        (F.col("o_custkey") % 30).cast("string"),
        F.lit("  ("),
        (F.col("o_orderkey") % 20).cast("string"),
        F.lit("-"),
        (F.col("o_custkey") % 20).cast("string"),
        F.lit(")  "),
    )
    clean = F.trim(F.regexp_replace(raw, r"\s+", " "))
    matchup = F.regexp_replace(clean, r"\s*\([^)]*\)\s*$", "")
    shape = r"^(\S+) @ (\S+)$"
    return o.select(
        "o_orderkey",
        clean.alias("clean_text"),
        matchup.alias("matchup"),
        F.regexp_extract(matchup, shape, 1).alias("away_team"),
        F.regexp_extract(matchup, shape, 2).alias("home_team"),
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("game_date_us"),
    ).orderBy("o_orderkey")


@query(
    "x18_event_mining",
    oracle="""
WITH raw AS (
  SELECT concat('visit /event/E', CAST(o_orderkey % 50 AS VARCHAR),
                ' and /event/E', CAST(o_custkey % 50 AS VARCHAR),
                ' today') AS page FROM orders
), mined AS (
  SELECT unnest(regexp_extract_all(page, '/event/([A-Za-z0-9-]+)', 1)) AS event_code
  FROM raw
)
SELECT event_code, COUNT(*) AS n_mentions,
       concat('/event/', event_code) AS event_url
FROM mined GROUP BY event_code
ORDER BY event_code
""",
)
def x18_event_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X18: event-id mining (nba_props_scraper.py:236-249 — regex findall
    over page source, set-dedupe, URL construction): regexp_extract_all +
    explode + groupBy; the driver-side set becomes a distributed agg."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    page = F.concat(
        F.lit("visit /event/E"),
        (F.col("o_orderkey") % 50).cast("string"),
        F.lit(" and /event/E"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit(" today"),
    )
    mined = o.select(
        F.explode(
            F.regexp_extract_all(page, F.lit(r"/event/([A-Za-z0-9-]+)"), 1)
        ).alias("event_code")
    )
    return (
        mined.groupBy("event_code")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .withColumn("event_url", F.concat(F.lit("/event/"), F.col("event_code")))
        .orderBy("event_code")
    )


_SQL_GAME_TEXT = """
  SELECT o_orderkey,
         1 + o_orderkey % 12 AS h12,
         o_orderkey % 60 AS mm,
         CASE WHEN o_orderkey % 2 = 0 THEN 'PM' ELSE 'AM' END AS ampm,
         1 + o_orderkey % 12 AS mon,
         1 + o_orderkey % 28 AS day,
         o_orderkey % 24 AS h24
  FROM orders
"""


@query(
    "x4_game_time",
    oracle=f"""
WITH c AS ({_SQL_GAME_TEXT})
SELECT o_orderkey,
       CASE o_orderkey % 3
         WHEN 0 THEN make_timestamp(2024, 6, 1, (h12 % 12) + CASE WHEN ampm = 'PM' THEN 12 ELSE 0 END, mm, 0.0)
         WHEN 1 THEN make_timestamp(2024, mon, day, (h12 % 12) + 12, mm, 0.0)
         ELSE make_timestamp(2024, mon, day, h24, mm, 0.0)
       END AS game_ts
FROM c
ORDER BY o_orderkey
""",
)
def x4_game_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: multi-pattern game-time parse (nba_insights_scraper.py:407-417 —
    'Today 10:30 PM' / '12/25 7:30 PM' / ISO) via coalesce over pattern
    alternatives. The oracle reconstructs ground truth from the integer
    components, so this validates the whole regex path end-to-end."""
    from nba_data_pipeline_spark.functions.extract import parse_game_time

    o = _orders_wide(spark, sf_dir, "o_orderkey")
    k = F.col("o_orderkey")
    h12 = (1 + k % 12).cast("int")
    mm = F.lpad((k % 60).cast("string"), 2, "0")
    ampm = F.when(k % 2 == 0, "PM").otherwise("AM")
    mon = F.lpad((1 + k % 12).cast("string"), 2, "0")
    day = F.lpad((1 + k % 28).cast("string"), 2, "0")
    h24 = F.lpad((k % 24).cast("string"), 2, "0")
    text = (
        F.when(k % 3 == 0, F.concat(F.lit("Tip-off Today "), h12, F.lit(":"), mm, F.lit(" "), ampm))
        .when(k % 3 == 1, F.concat((1 + k % 12).cast("string"), F.lit("/"), (1 + k % 28).cast("string"), F.lit(" "), h12, F.lit(":"), mm, F.lit(" PM")))
        .otherwise(F.concat(F.lit("2024-"), mon, F.lit("-"), day, F.lit(" "), h24, F.lit(":"), mm))
    )
    return o.select(
        "o_orderkey", parse_game_time(text).alias("game_ts")
    ).orderBy("o_orderkey")


_STATS = ["points", "assists", "rebounds"]
_SQL_STATS = "['points', 'assists', 'rebounds']"


@query(
    "x56_insight_parse",
    oracle=f"""
WITH raw AS (
  SELECT o_orderkey,
         CASE o_orderkey % 3
           WHEN 0 THEN concat('Over ', CAST(o_orderkey % 40 AS VARCHAR), '.5 ',
                              {_SQL_STATS}[o_orderkey % 3 + 1])
           WHEN 1 THEN concat({_SQL_STATS}[o_orderkey % 3 + 1], ' Under ',
                              CAST(o_orderkey % 40 AS VARCHAR), '.5')
           ELSE 'no prop in this text'
         END AS headline,
         concat('Longer bio text where the player scored ',
                CAST(o_orderkey % 50 AS VARCHAR),
                ' points in the last game and kept going after that') AS bio
  FROM orders
), parsed AS (
  SELECT o_orderkey, headline, bio,
         NULLIF(regexp_extract(headline, '^(Over|Under)\\s+(\\d+\\.?\\d*)\\s+(\\w+)', 1), '') AS ou1,
         NULLIF(regexp_extract(headline, '^(\\w+)\\s+(Over|Under)\\s+(\\d+\\.?\\d*)', 2), '') AS ou2
  FROM raw
)
SELECT o_orderkey,
       COALESCE(ou1, ou2) AS outcome,
       CASE WHEN COALESCE(ou1, ou2) IS NOT NULL THEN
         TRY_CAST(CASE WHEN ou1 IS NOT NULL
                       THEN regexp_extract(headline, '^(Over|Under)\\s+(\\d+\\.?\\d*)\\s+(\\w+)', 2)
                       ELSE regexp_extract(headline, '^(\\w+)\\s+(Over|Under)\\s+(\\d+\\.?\\d*)', 3) END
                  AS DOUBLE) END AS prop_line,
       CASE WHEN COALESCE(ou1, ou2) IS NOT NULL THEN
         NULLIF(lower(CASE WHEN ou1 IS NOT NULL
                           THEN regexp_extract(headline, '^(Over|Under)\\s+(\\d+\\.?\\d*)\\s+(\\w+)', 3)
                           ELSE regexp_extract(headline, '^(\\w+)\\s+(Over|Under)\\s+(\\d+\\.?\\d*)', 1) END), '') END AS prop_type,
       CASE WHEN NULLIF(regexp_extract(bio, 'scored \\d+ points', 0), '') IS NOT NULL THEN
         substring(bio,
                   GREATEST(strpos(bio, regexp_extract(bio, 'scored \\d+ points', 0)) - 20, 1),
                   length(regexp_extract(bio, 'scored \\d+ points', 0)) + 70) END AS context_snippet
FROM parsed
ORDER BY o_orderkey
""",
)
def x56_insight_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 alternative-shape prop parse + X5 ±N-char context-window snippet
    (nba_insights_scraper.py:420-464) on constructed insight text; unparsed
    shapes yield null fields like the reference's empty dict."""
    from nba_data_pipeline_spark.functions.extract import (
        extract_context_window,
        parse_prop_outcome,
    )

    o = _orders_wide(spark, sf_dir, "o_orderkey")
    k = F.col("o_orderkey")
    stat = F.element_at(F.array(*[F.lit(s) for s in _STATS]), (k % 3 + 1).cast("int"))
    line_txt = F.concat((k % 40).cast("string"), F.lit(".5"))
    headline = (
        F.when(k % 3 == 0, F.concat(F.lit("Over "), line_txt, F.lit(" "), stat))
        .when(k % 3 == 1, F.concat(stat, F.lit(" Under "), line_txt))
        .otherwise(F.lit("no prop in this text"))
    )
    bio = F.concat(
        F.lit("Longer bio text where the player scored "),
        (k % 50).cast("string"),
        F.lit(" points in the last game and kept going after that"),
    )
    raw = o.withColumn("headline", headline).withColumn("bio", bio)
    outcome, prop_line, prop_type = parse_prop_outcome(F.col("headline"))
    return raw.select(
        "o_orderkey",
        outcome.alias("outcome"),
        prop_line.alias("prop_line"),
        prop_type.alias("prop_type"),
        extract_context_window(F.col("bio"), r"scored \d+ points", 20, 50).alias(
            "context_snippet"
        ),
    ).orderBy("o_orderkey")


@query(
    "x12_team_mentions",
    oracle="""
WITH texts AS (
  SELECT o_orderkey,
         concat('NATION_', CAST(o_orderkey % 25 AS VARCHAR), ' hosts NATION_',
                CAST((o_orderkey * 7) % 25 AS VARCHAR), ' tonight') AS line
  FROM orders
), hits AS (
  SELECT t.o_orderkey, n.n_name
  FROM texts t JOIN nation n
    ON contains(concat(' ', t.line, ' '), concat(' ', n.n_name, ' '))
)
SELECT o_orderkey, string_agg(n_name, ' vs ' ORDER BY n_name) AS matchup,
       COUNT(*) AS n_teams
FROM hits GROUP BY o_orderkey
ORDER BY o_orderkey
""",
)
def x12_team_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: team-names-from-text heuristic (nba_props_scraper.py:313-351 —
    scan lines for team indicators, emit 'A vs B'): containment theta-join
    against the broadcast dim with space-padding so NATION_1 can't match
    inside NATION_17, then per-line sorted aggregation."""
    o = _orders_wide(spark, sf_dir, "o_orderkey")
    n = read_table(spark, sf_dir, "nation").select("n_name")
    line = F.concat(
        F.lit("NATION_"),
        (F.col("o_orderkey") % 25).cast("string"),
        F.lit(" hosts NATION_"),
        ((F.col("o_orderkey") * 7) % 25).cast("string"),
        F.lit(" tonight"),
    )
    texts = o.withColumn("line", line)
    padded = F.concat(F.lit(" "), F.col("line"), F.lit(" "))
    hits = texts.join(
        F.broadcast(n), padded.contains(F.concat(F.lit(" "), F.col("n_name"), F.lit(" ")))
    )
    return (
        hits.groupBy("o_orderkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), " vs ").alias("matchup"),
            F.count(F.lit(1)).alias("n_teams"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "ud4_llm_prompt",
    oracle="""
WITH g AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       concat('Analyze ', CAST(n_orders AS VARCHAR), ' orders for customer ',
              CAST(o_custkey AS VARCHAR), ' and summarize betting-relevant trends.') AS prompt,
       CAST(to_json(struct_pack(customer := o_custkey, n_orders := n_orders,
                                total_cents := total_cents)) AS VARCHAR) AS envelope
FROM g
ORDER BY o_custkey
""",
)
def ud4_llm_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4: LLM-analysis prompt generation (hardrock_scraper.py:453-506 —
    grouped data → prompt string + JSON envelope). format/concat builds the
    prompt; to_json(struct) builds the machine-readable envelope. Monetary
    totals ride as exact integer cents so the JSON is byte-stable across
    engines (no double serialization in strings)."""
    o = read_table(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")).alias(
            "total_cents"
        ),
    )
    return g.select(
        "o_custkey",
        F.concat(
            F.lit("Analyze "),
            F.col("n_orders").cast("string"),
            F.lit(" orders for customer "),
            F.col("o_custkey").cast("string"),
            F.lit(" and summarize betting-relevant trends."),
        ).alias("prompt"),
        F.to_json(
            F.struct(
                F.col("o_custkey").alias("customer"),
                F.col("n_orders").alias("n_orders"),
                F.col("total_cents").alias("total_cents"),
            )
        ).alias("envelope"),
    ).orderBy("o_custkey")


@query(
    "corpus_curation_pipeline",
    oracle=f"""
WITH gated AS (
  SELECT doc_id, lang, source, text
  FROM documents
  WHERE n_chars BETWEEN 40 AND 5000
    AND len({_TOKS}) >= 5
), keyed AS (
  SELECT *, md5(text) AS content_id,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM gated
), deduped AS (
  SELECT doc_id, lang, source FROM keyed WHERE rn = 1
)
SELECT lang, source, COUNT(*) AS n_docs
FROM deduped
GROUP BY lang, source
ORDER BY lang, source
""",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation composite, end-to-end in one plan:
    quality gate (length + minimum token count, F2/F7) → exact near-dup
    removal (content-hash first-wins, D4/D1) → per-language/source corpus
    manifest (A2). Single scan, one window for the dedupe, one aggregate —
    the linear shape this pipeline keeps at 100 TB."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    gated = d.filter(
        F.col("n_chars").between(40, 5000)
        & (F.size(F.split(F.trim("text"), r"\s+")) >= 5)
    )
    keyed = gated.withColumn("content_id", F.md5("text")).withColumn(
        "rn", F.row_number().over(W.partitionBy("content_id").orderBy("doc_id"))
    )
    return (
        keyed.filter(F.col("rn") == 1)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "source")
    )


@query(
    "ud13_prop_line_walker",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         concat('Player', translate(CAST(o_orderkey % 100 AS VARCHAR), '0123456789', 'ABCDEFGHIJ'), ' Smith') AS player,
         CAST(o_orderkey % 40 AS DOUBLE) + 0.5 AS line,
         -(100 + CAST(o_orderkey % 300 AS INT)) AS over_odds,
         (105 + CAST(o_orderkey % 250 AS INT)) AS under_odds
  FROM orders
)
SELECT o_orderkey, player, 'POINTS' AS prop_type, line AS prop_line, over_odds AS odds
FROM base
UNION ALL
SELECT o_orderkey, player, 'POINTS', line, under_odds FROM base
ORDER BY o_orderkey, odds
""",
)
def ud13_prop_line_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD1+UD3 through the SQL-callable UDTF: build one DOM-text blob per
    order (player header, prop-type header, Over/Under value lines), then
    LATERAL prop_line_walker — the stateful line-cursor parse
    (nba_props_scraper.py:645-702) distributed one blob per eval call.

    The scan is repartitioned to the session's parallelism before the
    lateral: the Python UDTF is the expensive stage, and without a shuffle
    upstream it inherits the scan's partitioning (a single row group here
    → ONE Python worker). The shuffle moves only the 8-byte key."""
    from nba_data_pipeline_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    o = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    k = F.col("o_orderkey")
    blob = F.concat(
        F.lit("Player"),
        F.translate((k % 100).cast("string"), "0123456789", "ABCDEFGHIJ"),
        F.lit(" Smith\nPOINTS\nO "),
        (k % 40).cast("string"), F.lit(".5 -"), (100 + k % 300).cast("string"),
        F.lit("\nU "), (k % 40).cast("string"), F.lit(".5 +"),
        (105 + k % 250).cast("string"),
    )
    o.withColumn("blob", blob).createOrReplaceTempView("__walker_blobs")
    # Sort in DataFrame land above a pin: the SQL ORDER BY's range sampling
    # would re-run the UDTF lane (see pinned_sort).
    return pinned_sort(
        spark.sql(
            "SELECT b.o_orderkey, p.player, p.prop_type, p.prop_line, p.odds "
            "FROM __walker_blobs b, LATERAL prop_line_walker(b.blob) p"
        ),
        "o_orderkey",
        "odds",
    )


#: the 30 NBA team abbreviations the lineup fixture draws from — all exactly
#: three uppercase letters so the reference's favorite regex ([A-Z]{3})
#: matches (lineup_scraper.py:69).
_NBA_ABBRS = (
    "ATL BOS BKN CHA CHI CLE DAL DEN DET GSW HOU IND LAC LAL MEM MIA MIL "
    "MIN NOP NYK OKC ORL PHI PHX POR SAC SAS TOR UTA WAS"
).split()

_ABBR_SQL = "[" + ", ".join(f"'{a}'" for a in _NBA_ABBRS) + "]"


@query(
    "ud3_lineup_parse",
    oracle=f"""
WITH g AS (
  SELECT o_orderkey AS game_key,
         list_extract({_ABBR_SQL}, CAST(o_orderkey % 30 AS INT) + 1) AS team_a,
         list_extract({_ABBR_SQL},
             CAST(((o_orderkey % 30) + 1 + (o_orderkey % 29)) % 30 AS INT) + 1
         ) AS team_b,
         CAST(6 + o_orderkey % 6 AS VARCHAR) || ':30 PM ET' AS game_time,
         CAST(1 + o_orderkey % 10 AS DOUBLE) + 0.5 AS spread,
         CAST(210 + o_orderkey % 40 AS DOUBLE) + 0.5 AS over_under
  FROM orders WHERE o_orderkey % 97 = 0
),
pos AS (
  SELECT UNNEST(['PG', 'SG', 'SF', 'PF', 'C']) AS pos,
         UNNEST([0, 1, 2, 3, 4]) AS pos_idx
),
sides AS (SELECT UNNEST([0, 1]) AS s)
SELECT g.game_key,
       g.team_a || ' @ ' || g.team_b AS game,
       g.game_time,
       g.team_a AS favorite,
       g.spread,
       g.over_under,
       CASE sides.s WHEN 0 THEN 'away' ELSE 'home' END AS side,
       CASE sides.s WHEN 0 THEN g.team_a ELSE g.team_b END AS team,
       pos.pos, pos.pos_idx,
       'P' || pos.pos || ' '
           || (CASE sides.s WHEN 0 THEN g.team_a ELSE g.team_b END) AS player
FROM g CROSS JOIN pos CROSS JOIN sides
ORDER BY game_key, pos_idx, side
""",
)
def ud3_lineup_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD3: the lineup-table parse (lineup_scraper.py:31-114) as a
    SQL-callable UDTF over game-table text blobs — one blob per game in,
    game header + 2 teams × 5 position rows out.

    Fixture: one deterministic game table per sampled order key (matchup
    from the 30-team abbreviation ring, tip-off time, the reference's
    betting line ``XXX by <spread>, o/u <total>``, a ``|``-led team row
    with the away ``@ `` marker, and five ``POS|playerA|playerB`` rows
    whose player cells carry doubled spaces so the whitespace collapse at
    :104-106 is actually exercised). The oracle recomputes every emitted
    field directly from the key arithmetic, so the parse must be the exact
    inverse of the construction — favorite/spread via the :69 regex, o/u
    via :70, team-row cleanup via :85, position gating via :108.

    Scale shape: identical to ud13 — the blob table repartitions to the
    session's parallelism BEFORE the lateral so the Python UDTF stage (the
    expensive one) fans out, and each eval() owns one whole blob, so the
    reference's in-table cursor order needs no global ordering."""
    from nba_data_pipeline_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    o = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .filter(F.col("o_orderkey") % 97 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    k = F.col("o_orderkey")
    abbrs = F.array(*[F.lit(a) for a in _NBA_ABBRS])
    team_a = F.element_at(abbrs, ((k % 30) + 1).cast("int"))
    team_b = F.element_at(
        abbrs, ((((k % 30) + 1 + (k % 29)) % 30) + 1).cast("int")
    )
    pos_rows = [
        F.concat(
            F.lit(p), F.lit("|P"), F.lit(p), F.lit("  "), team_a,
            F.lit("|P"), F.lit(p), F.lit("  "), team_b,
        )
        for p in ("PG", "SG", "SF", "PF", "C")
    ]
    blob = F.concat_ws(
        "\n",
        F.concat(team_a, F.lit(" @ "), team_b),
        F.concat((6 + k % 6).cast("string"), F.lit(":30 PM ET")),
        F.concat(
            team_a, F.lit(" by "), (1 + k % 10).cast("string"), F.lit(".5"),
            F.lit(", o/u "), (210 + k % 40).cast("string"), F.lit(".5"),
        ),
        F.concat(F.lit("| "), team_a, F.lit(" | @ "), team_b),
        *pos_rows,
    )
    o.withColumn("blob", blob).createOrReplaceTempView("__lineup_blobs")
    # Sort in DataFrame land above a pin: the SQL ORDER BY's range sampling
    # would re-run the UDTF lane (see pinned_sort).
    return pinned_sort(
        spark.sql(
            "SELECT b.o_orderkey AS game_key, p.game, p.game_time, p.favorite, "
            "p.spread, p.over_under, p.side, p.team, p.pos, p.pos_idx, p.player "
            "FROM __lineup_blobs b, LATERAL lineup_table_walker(b.blob) p"
        ),
        "game_key",
        "pos_idx",
        "side",
    )


@query(
    "ta_vocab_topk",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM tok
GROUP BY token
ORDER BY tf DESC, token
LIMIT 100
""",
)
def ta_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: term frequency + document frequency for
    the top-100 tokens — the stopword-table / tokenizer-vocab primitive of a
    training-data pipeline. Explode → groupBy(token) is the canonical
    map-side-combine aggregation: partial counts collapse before the
    shuffle, so the exchange carries one row per distinct token per
    partition, not one per occurrence. The top-k is a deterministic total
    order (tf DESC, token ASC), so LIMIT is stable across engines."""
    d = _docs_wide(spark, sf_dir)
    tok = d.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), "token")
        .limit(100)
    )


@query(
    "ta_tfidf_top_terms",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rn
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf, CAST(rn AS INT) AS rn
FROM scored
WHERE rn <= 3
ORDER BY doc_id, rn
""",
)
def ta_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the keyword/topic-signal primitive
    (feature store for dedup-aware sampling, topic balance audits). The
    ranking is all-integer (tf DESC, df ASC, token ASC) so engines can't
    diverge on float ties; TF-IDF itself is reported rounded per the
    catalog's float discipline. Shape: two shuffles (doc-term counts,
    term df) + one broadcast scalar (corpus size) + a bounded per-doc
    window — each stage map-side-combines, nothing is quadratic."""
    d = _docs_wide(spark, sf_dir)
    from pyspark.sql import Window as W

    tok = d.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("token"))
    # persist the contracted doc-term table and derive df from it (tf has
    # exactly one row per (doc, token), so rows-per-token IS the document
    # frequency) — without this the tokenize+explode pass ran twice.
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = read_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), "token")
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                4,
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


_SQL_EN_STOPS = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])


@query(
    "ta_gopher_rules",
    oracle=f"""
WITH feat AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS INT) AS n_tokens,
         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
             / len({_TOKS}) AS mean_word_len,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
             / length(text) AS symbol_ratio,
         CAST(len(list_intersect(list_distinct({_TOKS}),
                                 [{_SQL_EN_STOPS}])) AS INT) AS n_stop_distinct
  FROM documents
)
SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, n_stop_distinct,
       n_tokens BETWEEN 5 AND 1000 AS r_word_count,
       mean_word_len BETWEEN 3 AND 10 AS r_mean_word_len,
       symbol_ratio < 0.1 AS r_symbol_ratio,
       n_stop_distinct >= 2 AS r_stopwords,
       (n_tokens BETWEEN 5 AND 1000) AND (mean_word_len BETWEEN 3 AND 10)
           AND symbol_ratio < 0.1 AND n_stop_distinct >= 2 AS keep
FROM feat
ORDER BY doc_id
""",
)
def ta_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 class of
    filters): word-count bounds, mean-word-length bounds, symbol-to-char
    ratio, distinct-stopword floor — each rule surfaced as its own boolean
    plus the conjunctive keep flag, so downstream curation can audit WHICH
    rule rejected a document. Distinct from ta_quality_scores (raw features)
    — this is the thresholded decision layer. Pure JVM expressions, one
    scan, no shuffle."""
    d = _docs_wide(spark, sf_dir)
    toks = ws_tokens(F.col("text"))
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_tokens = F.size(toks)
    mean_wl = F.length(F.regexp_replace("text", r"\s", "")).cast("double") / n_tokens
    sym_ratio = (
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("double")
        / F.length("text")
    )
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stops))
    feat = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        n_stop.alias("n_stop_distinct"),
    )
    r_wc = F.col("n_tokens").between(5, 1000)
    r_mwl = F.col("mean_word_len").between(3, 10)
    r_sym = F.col("symbol_ratio") < 0.1
    r_stop = F.col("n_stop_distinct") >= 2
    return feat.select(
        "doc_id", "n_tokens", "mean_word_len", "symbol_ratio", "n_stop_distinct",
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_stop.alias("r_stopwords"),
        (r_wc & r_mwl & r_sym & r_stop).alias("keep"),
    ).orderBy("doc_id")


_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_RE_PHONE = r"\b555-[0-9]{4}\b"


@query(
    "ta_pii_scrub",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@' || source
              || '.org call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS full_text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(full_text, '{_RE_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(full_text, '{_RE_IP}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(full_text, '{_RE_PHONE}')) AS INT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(full_text,
           '{_RE_EMAIL}', '<EMAIL>', 'g'),
           '{_RE_IP}', '<IP>', 'g'),
           '{_RE_PHONE}', '<PHONE>', 'g') AS redacted
FROM seeded
ORDER BY doc_id
""",
)
def ta_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (email / IPv4 / phone) — the scrubbing pass
    every training corpus runs before tokenization. The synthetic corpus is
    PII-free, so the fixture deterministically injects one span of each
    class per document (derived from doc_id/source) and the operator must
    find and mask exactly those; the redacted text itself is value-hashed,
    so the regex semantics are checked byte-for-byte across engines.
    Replacement order (email → IP → phone) is fixed so the classes can't
    shadow each other. Pure JVM regexp expressions, one scan, no shuffle —
    at 100 TB this runs entirely inside whole-stage codegen."""
    d = _docs_wide(spark, sf_dir)
    k = F.col("doc_id")
    full = F.concat(
        F.col("text"), F.lit(" Contact user"), k.cast("string"), F.lit("@"),
        F.col("source"), F.lit(".org call 555-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (k % 256).cast("string"), F.lit("."),
        ((k * 7) % 256).cast("string"),
    )
    seeded = d.select("doc_id", full.alias("full_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("full_text", _RE_EMAIL, "<EMAIL>"),
            _RE_IP, "<IP>",
        ),
        _RE_PHONE, "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("full_text", F.lit(_RE_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("full_text", F.lit(_RE_IP), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all("full_text", F.lit(_RE_PHONE), 0)).alias("n_phones"),
        redacted.alias("redacted"),
    ).orderBy("doc_id")


@query(
    "ta_mixture_weights",
    oracle="""
WITH c AS (
  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
),
t AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
         COUNT(*) AS n_langs
  FROM c
)
SELECT lang, n_docs, n_chars,
       CAST(n_docs AS DOUBLE) / total_docs AS actual_share,
       (CAST(total_docs AS DOUBLE) / n_langs) / n_docs AS sample_weight
FROM c, t
ORDER BY lang
""",
)
def ta_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix reweighting: per-language corpus shares and the
    per-document sampling weight that rebalances the corpus to a uniform
    language target (weight = target_share / actual_share) — the number a
    data loader multiplies into its sampling probability to hit the mix
    spec. Two tiny aggregates and a broadcast scalar; all divisions are
    integer-valued doubles with identical operands on both engines.
    At 100 TB the per-language aggregate map-side combines to one row per
    language per partition — the weight table is dimension-sized and
    broadcasts back onto the corpus for the actual sampling pass."""
    d = read_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    t = c.agg(
        F.sum("n_docs").alias("total_docs"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_docs",
            "n_chars",
            (F.col("n_docs").cast("double") / F.col("total_docs")).alias("actual_share"),
            (
                (F.col("total_docs").cast("double") / F.col("n_langs"))
                / F.col("n_docs")
            ).alias("sample_weight"),
        )
        .orderBy("lang")
    )


@query(
    "ta_repetition_ratio",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INT) AS n_tokens,
       CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}) AS uniq_ratio,
       (CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})) < 0.5
           AS is_repetitive
FROM documents
ORDER BY doc_id
""",
)
def ta_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signal (the Gopher-style repetition filter):
    fraction of distinct whitespace tokens. Highly repetitive documents
    (boilerplate, keyword stuffing, templated spam) score low and get
    flagged. Pure JVM expressions — one scan, no shuffle, whole-stage
    codegen end-to-end; the integer-valued division is bit-stable across
    engines."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ratio = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        ratio.alias("uniq_ratio"),
        (ratio < 0.5).alias("is_repetitive"),
    ).orderBy("doc_id")


@query(
    "ta_chunk_overlap",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 1),
e AS (SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS start FROM s)
SELECT doc_id,
       CAST(start // 24 AS INT) AS chunk_id,
       CAST(LEAST(32, n - start) AS INT) AS n_chunk_tokens,
       array_to_string(
         toks[CAST(start + 1 AS INT):CAST(LEAST(start + 32, n) AS INT)], ' '
       ) AS chunk_text
FROM e
ORDER BY doc_id, chunk_id
""",
)
def ta_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence chunking: split each document into 32-token windows
    with stride 24 (8-token overlap), the standard long-document → context-
    window preprocessing step for LLM pretraining. Narrow map only — the
    token split, window starts (``sequence``), and slice all happen inside
    one projection with no shuffle, so at 100 TB this runs scan-speed and
    the posexplode fan-out is bounded by ceil(n_tokens / stride) per doc.
    Chunk rows inherit the scan's partitioning, ready for a downstream
    ``ta_token_budget_pack``-style packing pass."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    d = d.select("doc_id", toks.alias("toks")).withColumn("n", F.size("toks"))
    d = d.filter(F.col("n") >= 1)
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(24))
    e = d.select(
        "doc_id", "toks", "n", F.posexplode(starts).alias("chunk_id", "start")
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.least(F.lit(32), F.col("n") - F.col("start")).cast("int").alias(
            "n_chunk_tokens"
        ),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("start") + F.lit(1), F.lit(32))
        ).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "ta_train_test_split",
    oracle="""
WITH h AS (
  SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < '1a' THEN 'test'
            WHEN bucket < '34' THEN 'val'
            ELSE 'train' END AS split
FROM h
ORDER BY doc_id
""",
)
def ta_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split — the assignment step every
    training pipeline needs to be reproducible across reruns AND engines:
    hash the stable doc key (md5, identical bytes on any engine — never a
    per-engine hash like xxhash64/DuckDB hash()), take the first byte, and
    threshold into ~10% test (< 0x1a), ~10% val (< 0x34), ~80% train.
    Pure projection: no shuffle, no state, scan-speed at 100 TB, and a
    doc's split never changes when the corpus grows — the property
    random-sampling splits lack."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return (
        d.withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < "1a", "test")
            .when(F.col("bucket") < "34", "val")
            .otherwise("train"),
        )
        .select("doc_id", "lang", "bucket", "split")
        .orderBy("doc_id")
    )


@query(
    "ta_global_shuffle_shard",
    oracle="""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key FROM documents
)
SELECT doc_id, substr(shuffle_key, 1, 1) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY substr(shuffle_key, 1, 1)
                               ORDER BY shuffle_key, doc_id) AS INT) AS pos
FROM h ORDER BY doc_id
""",
)
def ta_global_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the step that turns
    a curated corpus into training shards: every doc gets a pseudo-random
    but reproducible position (md5 of the stable key — engine-portable,
    unlike xxhash64/rand), sharded by the first hex nibble (16 shards) with
    a dense position inside each shard.

    Spark-first shape: one narrow projection, then ONE shuffle on the shard
    key with a sort-within-partition window for positions — shards are
    written in parallel, no global sort, no driver state. Doc→shard is
    stable under corpus growth; at 100 TB raise the nibble count to match
    the target shard size and the plan is unchanged."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.col("doc_id").cast("string").cast("binary"))
    win = W.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        d.withColumn("shuffle_key", key)
        .withColumn("shard", F.substring("shuffle_key", 1, 1))
        .withColumn("pos", F.row_number().over(win))
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    )


@query(
    "ta_perplexity_score",
    oracle=f"""
WITH split AS (
  SELECT doc_id, text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '34' AS is_train
  FROM documents
),
tok AS (
  SELECT doc_id, is_train, unnest({_TOKS}) AS token FROM split
),
vocab AS (
  SELECT token, COUNT(*) AS c FROM tok WHERE is_train GROUP BY token
),
sizes AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM vocab
),
scored AS (
  SELECT t.doc_id,
         CAST(ln(CAST(COALESCE(vb.c, 0) + 1 AS DOUBLE) / (s.n + s.v))
              AS DECIMAL(38,18)) AS logp
  FROM tok t CROSS JOIN sizes s
  LEFT JOIN vocab vb ON t.token = vb.token
  WHERE NOT t.is_train
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
       ROUND(exp(-(CAST(SUM(logp) AS DOUBLE) / COUNT(*))), 4) AS ppl
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""",
)
def ta_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality scoring (the CCNet/Gopher companion filter):
    train a Laplace-smoothed unigram LM on the train split of the corpus
    (same md5 split rule as ``ta_train_test_split``), then score every
    held-out document by per-token perplexity — the standard signal for
    "looks like the reference distribution" quality filtering.

    Spark-first shape: token counts are one hash aggregate over the train
    split; the (N, V) normalizer is a 1-row broadcast; scoring is explode →
    broadcast hash join against the vocab → per-doc aggregate (vocab is
    dim-sized next to the corpus — at 100 TB a multi-million-row vocab
    either still broadcasts at ~100 MB or falls back to a shuffle join on
    the 8-byte token hash, same plan otherwise). Per-token log-probs are
    summed under the ``plans/exact.py`` decimal discipline so the
    cross-entropy is order-independent and engine-exact; the only floating
    steps are ln/exp on identical doubles, absorbed by ROUND(…, 4)."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    split = d.withColumn("is_train", bucket >= "34")
    tok = split.select(
        "doc_id", "is_train", F.explode(ws_tokens(F.col("text"))).alias("token")
    )
    # persist the dim-sized vocab: it feeds BOTH the (N, V) normalizer
    # and the scoring join — without this the train-split explode + count
    # aggregate runs twice.
    vocab = (
        tok.filter(F.col("is_train"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    sizes = vocab.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    scored = (
        tok.filter(~F.col("is_train"))
        .crossJoin(F.broadcast(sizes))
        .join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("n") + F.col("v"))
            )
            .cast("decimal(38,18)")
            .alias("logp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(
                F.exp(-(F.sum("logp").cast("double") / F.count(F.lit(1)))), 4
            ).alias("ppl"),
        )
        .orderBy("doc_id")
    )


@query(
    "x22_fuzzy_match",
    oracle="""
WITH src AS (
  SELECT n_nationkey, n_name,
         CAST(n_nationkey % length(n_name) AS INT) + 1 AS p
  FROM nation
),
misspelled AS (
  SELECT n_nationkey, n_name,
         concat(substr(n_name, 1, p - 1), substr(n_name, p + 1)) AS typo
  FROM src
),
scored AS (
  SELECT m.n_nationkey, m.typo, m.n_name AS true_name,
         c.n_name AS cand, levenshtein(m.typo, c.n_name) AS dist,
         ROW_NUMBER() OVER (PARTITION BY m.n_nationkey
                            ORDER BY levenshtein(m.typo, c.n_name), c.n_name)
           AS rn
  FROM misspelled m CROSS JOIN (SELECT DISTINCT n_name FROM nation) c
)
SELECT n_nationkey, typo, cand AS matched_name, CAST(dist AS INT) AS edit_dist,
       (cand = true_name) AS recovered
FROM scored WHERE rn = 1
ORDER BY n_nationkey
""",
)
def x22_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22 (extends X11/X14): FUZZY canonicalization — map a misspelled
    name to its nearest canonical entry by Levenshtein distance with a
    deterministic lexicographic tie-break. The reference's alias maps
    (DEFENSEVSPOSTION.PY:83-148) only handle exact known variants; edit
    distance is what catches the long tail of scraped typos. Each name is
    corrupted deterministically (drop the (key mod len)-th character) and
    must be recovered.

    Scale shape: the canonical dictionary is dim-sized and BROADCASTS; the
    dirty-name stream cross-joins only against that broadcast (a
    BroadcastNestedLoopJoin against a 25-row frame, not a shuffle
    cartesian), and the per-name argmin is a bounded window. At 100 TB
    the dictionary side stays small — that asymmetry is the whole
    design."""
    from pyspark.sql import Window as W

    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    misspelled = n.select(
        "n_nationkey",
        F.col("n_name").alias("true_name"),
        F.concat(
            F.expr("substr(n_name, 1, CAST(n_nationkey % length(n_name) AS INT))"),
            F.expr("substr(n_name, CAST(n_nationkey % length(n_name) AS INT) + 2)"),
        ).alias("typo"),
    )
    cand = n.select(F.col("n_name").alias("cand")).distinct()
    w = W.partitionBy("n_nationkey").orderBy(F.levenshtein("typo", "cand"), "cand")
    return (
        misspelled.crossJoin(F.broadcast(cand))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_nationkey",
            "typo",
            F.col("cand").alias("matched_name"),
            F.levenshtein("typo", "cand").cast("int").alias("edit_dist"),
            (F.col("cand") == F.col("true_name")).alias("recovered"),
        )
        .orderBy("n_nationkey")
    )


# Linear quality-classifier weights — stands in for a fastText/logreg model
# trained offline; inference is broadcast-literal arithmetic. Cross-engine
# float discipline: the logit z = -1.5 + 2.5*(s/t) + 0.8*(m/400) - 6*(p/c)
# + 0.15*(w/t) is never computed in floating point. Multiplying through by
# 100 * 400*t*c gives the EXACT BIGINT numerator
#   Z = -60000*t*c + 100000*c*s + 80*t*c*m - 240000*t*p + 6000*c*w
# (t=tokens, c=chars, s=stop hits, m=min(t,400), p=punct, w=non-ws chars),
# so bucket thresholds are integer comparisons (z > 0.55 <=> Z > 22000*t*c)
# and the reported logit is ONE double division of identical integers —
# thresholds (-0.50 / -0.60) sit at the corpus logit terciles —
# bit-stable on both engines, no transcendental calls, no rounding drift.
_QC_SQL_Z = (
    "(-60000 * t * c + 100000 * c * s + 80 * t * c * m"
    " - 240000 * t * p + 6000 * c * w)"
)


@query(
    "ta_quality_classifier",
    oracle=f"""
WITH feats AS (
  SELECT source,
         CAST(len({_TOKS}) AS BIGINT) AS t,
         CAST(length(text) AS BIGINT) AS c,
         CAST({_sql_stop_hits("en")} AS BIGINT) AS s,
         CAST(LEAST(len({_TOKS}), 400) AS BIGINT) AS m,
         CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS p,
         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS w
  FROM documents
), scored AS (
  SELECT source, {_QC_SQL_Z} AS z_num, 40000 * t * c AS z_den FROM feats
), bucketed AS (
  SELECT source,
         CASE WHEN 100 * z_num > -50 * z_den THEN 'keep'
              WHEN 100 * z_num > -60 * z_den THEN 'review'
              ELSE 'discard' END AS bucket,
         CAST(z_num AS DOUBLE) / CAST(z_den AS DOUBLE) AS logit
  FROM scored
)
SELECT source, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(logit AS DECIMAL(18,6))) AS DOUBLE) AS sum_logit
FROM bucketed
GROUP BY source, bucket
ORDER BY source, bucket
""",
)
def ta_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-CLASSIFIER inference — the model-based keep/review/discard
    gate every LLM curation stack runs after the rule-based (Gopher)
    pass: a linear model over the quality features scores each document
    and routes it to a bucket. Weights are broadcast literals (a real
    model's coefficients ship the same way); inference is whole-stage-
    codegen integer arithmetic (see ``_QC_SQL_Z``) with zero Python and
    zero shuffle before the per-source rollup, so it scales to 100 TB as
    a pure map. Bucketing compares exact integer numerators (the logit is
    decision-equivalent to the sigmoid probability — monotone — so no
    exp() crosses the engine boundary) and the audited ``sum_logit`` is a
    decimal-exact sum of bit-identical doubles."""
    d = _docs_wide(spark, sf_dir)
    feats = quality_features(F.col("text"))
    t = feats["n_tokens"].cast("long")
    c = feats["n_chars"].cast("long")
    s = stopword_hits(F.col("text"), "en").cast("long")
    m = F.least(feats["n_tokens"], F.lit(400)).cast("long")
    p = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_PATTERN), 0)).cast("long")
    w = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("long")
    z_num = (
        F.lit(-60000) * t * c
        + F.lit(100000) * c * s
        + F.lit(80) * t * c * m
        - F.lit(240000) * t * p
        + F.lit(6000) * c * w
    )
    z_den = F.lit(40000) * t * c
    scored = d.select(
        "source",
        z_num.alias("z_num"),
        z_den.alias("z_den"),
    )
    bucket = (
        F.when(F.lit(100) * F.col("z_num") > F.lit(-50) * F.col("z_den"), "keep")
        .when(F.lit(100) * F.col("z_num") > F.lit(-60) * F.col("z_den"), "review")
        .otherwise("discard")
    )
    return (
        scored.withColumn("bucket", bucket)
        .withColumn(
            "logit",
            F.col("z_num").cast("double") / F.col("z_den").cast("double"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("logit").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_logit"),
        )
        .orderBy("source", "bucket")
    )


@query(
    "x23_deletion_neighborhood_join",
    oracle="""
WITH probe AS (
  SELECT c_name AS a FROM customer WHERE c_custkey % 10 = 0
), dict AS (
  SELECT c_name AS b FROM customer
), pv AS (
  SELECT DISTINCT a, a AS var FROM probe
  UNION
  SELECT DISTINCT a, substr(a, 1, i - 1) || substr(a, i + 1, len(a) - i)
  FROM probe, UNNEST(range(1, len(a) + 1)) AS t(i)
), dv AS (
  SELECT DISTINCT b, b AS var FROM dict
  UNION
  SELECT DISTINCT b, substr(b, 1, i - 1) || substr(b, i + 1, len(b) - i)
  FROM dict, UNNEST(range(1, len(b) + 1)) AS t(i)
), cand AS (
  SELECT DISTINCT pv.a, dv.b FROM pv JOIN dv USING (var) WHERE pv.a <> dv.b
), ver AS (
  SELECT a, b FROM cand WHERE levenshtein(a, b) <= 1
)
SELECT p.a AS name,
       CAST(COALESCE(COUNT(v.b), 0) AS BIGINT) AS n_neighbors,
       MIN(v.b) AS closest
FROM probe p LEFT JOIN ver v ON v.a = p.a
GROUP BY p.a
ORDER BY name
""",
)
def x23_deletion_neighborhood_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: fuzzy JOIN at edit distance ≤ 1 via DELETION NEIGHBORHOODS
    (the SymSpell index) — the set-to-set sibling of x22's
    broadcast-dictionary argmin, for when BOTH sides are too big to
    broadcast: every string expands to its ≤ len+1 one-char-deletion
    variants, candidates come from a plain equi-join on the variant key
    (any two strings within one edit share a variant — substitution ⇒
    same deletion at the edit position, insert/delete ⇒ one side's
    identity equals the other's deletion), and only candidates pay the
    exact ``levenshtein`` verify. Candidate volume is Σ(len+1) per side —
    LINEAR, against the quadratic all-pairs Levenshtein x22 would cost
    without a broadcastable side. Output is per-probe neighbor stats
    (count + lexicographic closest), never the pair list, so result size
    is probe-bounded at any scale."""
    cust = read_table(spark, sf_dir, "customer")
    probe = cust.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_name").alias("a")
    )
    dict_ = cust.select(F.col("c_name").alias("b"))

    def variants(df: DataFrame, col: str) -> DataFrame:
        # NOTE (r11, measured and kept as-is): replacing this
        # union + DISTINCT with an in-plan array_distinct-before-explode
        # looked like a free shuffle removal and was a wash at sf0.1
        # (1.52 → 1.43 s), but at sf10 it regressed 12 s → 1027 s — the
        # post-DISTINCT relation carries real size/row statistics the
        # planner needs to pick the variant-join strategy, and the bare
        # Generate's estimates sent it down a catastrophic plan. The
        # per-side DISTINCT stays: it is load-bearing for the join, not
        # just dedup.
        ident = df.select(col, F.col(col).alias("var"))
        deleted = (
            df.select(col, F.explode(F.sequence(F.lit(1), F.length(col))).alias("i"))
            .select(
                col,
                F.expr(
                    f"substring({col}, 1, i - 1) || "
                    f"substring({col}, i + 1, length({col}) - i)"
                ).alias("var"),
            )
        )
        return ident.unionByName(deleted).distinct()

    pv = variants(probe, "a")
    dv = variants(dict_, "b")
    cand = (
        pv.join(dv, "var")
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ver = cand.where(F.levenshtein("a", "b") <= 1)
    return (
        probe.join(ver, "a", "left")
        .groupBy("a")
        .agg(
            F.count("b").cast("long").alias("n_neighbors"),
            F.min("b").alias("closest"),
        )
        .select(F.col("a").alias("name"), "n_neighbors", "closest")
        .orderBy("name")
    )


@query(
    "x24_suffixed_number_parse",
    oracle="""
WITH raw AS (
  SELECT o_orderkey,
         CASE o_orderkey % 4
           WHEN 0 THEN concat(CAST(o_orderkey % 90 + 1 AS VARCHAR), '.',
                              CAST(o_orderkey % 10 AS VARCHAR), 'K')
           WHEN 1 THEN concat(CAST(o_orderkey % 9 + 1 AS VARCHAR), 'M')
           WHEN 2 THEN concat(CAST(o_orderkey % 900 + 100 AS VARCHAR))
           ELSE 'N/A'
         END AS display
  FROM orders
),
parsed AS (
  SELECT o_orderkey, display,
         CASE
           WHEN display = 'N/A' THEN NULL
           WHEN display LIKE '%K' THEN CAST(CAST(
             regexp_extract(display, '^([0-9]+)(?:\\.([0-9]))?', 1) AS BIGINT) * 1000
             + COALESCE(CAST(NULLIF(
                 regexp_extract(display, '^([0-9]+)(?:\\.([0-9]))?', 2), '') AS BIGINT), 0) * 100
             AS BIGINT)
           WHEN display LIKE '%M' THEN CAST(
             regexp_extract(display, '^([0-9]+)', 1) AS BIGINT) * 1000000
           ELSE CAST(display AS BIGINT)
         END AS value
FROM raw
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(value) AS BIGINT) AS n_parsed,
       CAST(SUM(value) AS BIGINT) AS total,
       CAST(MAX(value) AS BIGINT) AS max_value
FROM parsed
""",
)
def x24_suffixed_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: suffixed-display-number parsing — '12.3K', '5M', '742', 'N/A'
    → exact integers (the follower/attendance/salary display format every
    scraped stats site uses; sibling of the X21 odds math). The K-form is
    parsed as integer thousands + tenths·100 — never a DOUBLE multiply,
    so 12.3K is exactly 12300 (float 12.3·1000 is 12299.999…, the classic
    silent corruption); unparseable markers become NULL, counted
    separately. All regexp_extract + integer CASE arithmetic in codegen.

    The synthesized display strings cycle all four shapes over orders, so
    the one-row audit (n_parsed, total, max) covers every branch."""
    k = F.col("o_orderkey")
    display = (
        F.when(k % 4 == 0, F.concat((k % 90 + 1).cast("string"), F.lit("."), (k % 10).cast("string"), F.lit("K")))
        .when(k % 4 == 1, F.concat((k % 9 + 1).cast("string"), F.lit("M")))
        .when(k % 4 == 2, (k % 900 + 100).cast("string"))
        .otherwise(F.lit("N/A"))
    )
    whole = F.regexp_extract("display", r"^([0-9]+)(?:\.([0-9]))?", 1).cast("bigint")
    tenth = F.nullif(
        F.regexp_extract("display", r"^([0-9]+)(?:\.([0-9]))?", 2), F.lit("")
    ).cast("bigint")
    value = (
        F.when(F.col("display") == "N/A", F.lit(None).cast("bigint"))
        .when(
            F.col("display").endswith("K"),
            whole * 1000 + F.coalesce(tenth, F.lit(0)) * 100,
        )
        .when(
            F.col("display").endswith("M"),
            F.regexp_extract("display", r"^([0-9]+)", 1).cast("bigint") * 1000000,
        )
        .otherwise(F.col("display").cast("bigint"))
    )
    parsed = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", display.alias("display"))
        .withColumn("value", value)
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("value").cast("bigint").alias("n_parsed"),
        F.sum("value").cast("bigint").alias("total"),
        F.max("value").cast("bigint").alias("max_value"),
    )


@query(
    "ta_langid_confusion",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
       {_SQL_SCORES}
  FROM documents
),
pred AS (
  SELECT lang AS labeled, {_SQL_BEST} AS predicted FROM scored
),
cells AS (
  SELECT labeled, predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
),
tot AS (
  SELECT labeled, CAST(SUM(n) AS BIGINT) AS n_labeled FROM cells GROUP BY 1
)
SELECT c.labeled, c.predicted, c.n,
       ROUND(100.0 * c.n / t.n_labeled, 4) AS pct_of_label,
       c.labeled = c.predicted AS correct
FROM cells c JOIN tot t USING (labeled)
ORDER BY labeled, predicted
""",
)
def ta_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID classifier EVALUATION: the full confusion matrix of the
    stopword-scoring predictor against the label column, with per-label
    recall shares — the model-audit artifact (which language pairs
    confuse, is the 'en' prior leaking) that ta_language_id's per-doc
    verdicts don't aggregate. Same class as sim_centroid_classifier_eval
    but for the text lane.

    Scale shape: prediction is the same single-scan codegen scoring as
    ta_language_id; the matrix is a |langs|² map-side-combined aggregate
    and per-label totals re-aggregate the cells, so the corpus is
    scanned exactly once."""
    d = _docs_wide(spark, sf_dir)
    pred = predict_lang_fast(F.col("text"))
    cells = (
        d.select(F.col("lang").alias("labeled"), pred.alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.groupBy("labeled").agg(F.sum("n").alias("n_labeled"))
    return (
        cells.join(F.broadcast(tot), "labeled")
        .select(
            "labeled",
            "predicted",
            "n",
            F.round(F.lit(100.0) * F.col("n") / F.col("n_labeled"), 4).alias(
                "pct_of_label"
            ),
            (F.col("labeled") == F.col("predicted")).alias("correct"),
        )
        .orderBy("labeled", "predicted")
    )


@query(
    "x28_log_template_mining",
    oracle="""
WITH lines AS (
  SELECT o_orderkey,
         'order ' || o_orderkey || ' priority ' || o_orderpriority ||
         ' status ' || o_orderstatus || ' amount ' ||
         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR) || ' cents'
             AS line
  FROM orders
),
templ AS (
  SELECT o_orderkey, line,
         regexp_replace(line, '[0-9]+', '<N>', 'g') AS template
  FROM lines
)
SELECT template,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       MIN(line) AS example
FROM templ
GROUP BY template
ORDER BY n_lines DESC, template
""",
)
def x28_log_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28: log-template mining (the Drain/SPELL class, reduced to its
    core move): mask every numeric run to a placeholder so structurally
    identical log lines collapse to one template, then count lines and
    distinct keys per template with a deterministic example line — the
    first step of any log-analytics pipeline (template inventory →
    anomaly = new/rare template). Lines are constructed deterministically
    from order columns (the x-suite convention), so the oracle rebuilds
    and masks the identical corpus.

    Scale shape: one scan, one codegen regex pass, one map-side-combined
    groupBy on the (low-cardinality) template key; MIN(line) gives a
    stable exemplar without a window. Variable-position parameters
    (true Drain's token-tree) reduce to the same collapse with a
    token-wise mask — the aggregation shape is unchanged."""
    o = _orders_wide(
        spark, sf_dir, "o_orderkey", "o_orderpriority", "o_orderstatus",
        "o_totalprice",
    )
    line = F.concat(
        F.lit("order "),
        F.col("o_orderkey").cast("string"),
        F.lit(" priority "),
        F.col("o_orderpriority"),
        F.lit(" status "),
        F.col("o_orderstatus"),
        F.lit(" amount "),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .cast("string"),
        F.lit(" cents"),
    )
    t = o.select(
        "o_orderkey",
        line.alias("line"),
    ).withColumn("template", F.regexp_replace("line", "[0-9]+", "<N>"))
    return (
        t.groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_keys"),
            F.min("line").alias("example"),
        )
        .orderBy(F.desc("n_lines"), "template")
    )
