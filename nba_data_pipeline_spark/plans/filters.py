"""Filter/predicate catalog queries (SURVEY §2.3 F2-F8).

Each reference predicate — keyword+length windows, pattern exclusion,
multi-dimension selection, name-shape regexes, token-list validation,
min-content gates, skip-if-exists incrementality — is restated as a pure
Catalyst filter so predicate pushdown and codegen apply. F1 (header-repeat
rows) already runs inside ``n_normalize_pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.plans.registry import query

_KEYWORDS = "points|pts|rebounds|assists|over|under|line|odds|the|and"


@query(
    "f2_keyword_length",
    oracle=f"""
SELECT doc_id, n_chars
FROM documents
WHERE n_chars BETWEEN 40 AND 2000
  AND regexp_matches(lower(text), '{_KEYWORDS}')
ORDER BY doc_id
""",
)
def f2_keyword_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: keyword + length-window predicate (run_scraper.py:97-101 —
    40<len<500 AND any of N keywords) over documents. Pure filter: pushes
    to the scan for the length column, codegen for the regex."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.filter(
            F.col("n_chars").between(40, 2000)
            & F.lower(F.col("text")).rlike(_KEYWORDS)
        )
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "f3_pattern_exclusion",
    oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
WHERE NOT regexp_matches(event_type, 'error|timeout')
GROUP BY event_type
ORDER BY event_type
""",
)
def f3_pattern_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: negative-pattern exclusion (nba_props_scraper.py:267-270 drops
    'Quarter|Half Time|Live' rows) — keep events whose type matches none of
    the exclusion patterns, then count per type."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.filter(~F.col("event_type").rlike("error|timeout"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "f4_multi_dim_selection",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderstatus = 'P')
  AND o_totalprice > 100000
  AND contains(o_orderpriority, '-')
ORDER BY o_orderkey
""",
)
def f4_multi_dim_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: conjunction of membership, alternative-dimension OR, and
    substring predicates (nba_insights_scraper.py:728-747: team∈sel OR
    opp∈sel, AND insight-type, AND prop-substring)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
                | (F.col("o_orderstatus") == "P")
            )
            & (F.col("o_totalprice") > 100000)
            & F.col("o_orderpriority").contains("-")
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )


_FIRSTS = ["James", "Kevin", "over", "Luka", "the"]
_LASTS = ["Doncic", "Durant", "James", "total", "Curry"]
_NAME_SHAPE = r"^([A-Z][A-Za-z.'-]+ ){1,3}[A-Z][A-Za-z.'-]+$"
_STOPWORDS = r"\b(over|under|the|total|points)\b"
_SQL_FIRSTS = "[" + ", ".join(f"'{w}'" for w in _FIRSTS) + "]"
_SQL_LASTS = "[" + ", ".join(f"'{w}'" for w in _LASTS) + "]"


@query(
    "f5_name_shape",
    oracle=f"""
WITH named AS (
  SELECT c_custkey,
         concat({_SQL_FIRSTS}[c_custkey % 5 + 1], ' ',
                {_SQL_LASTS}[(c_custkey // 5) % 5 + 1]) AS candidate
  FROM customer
)
SELECT c_custkey, candidate
FROM named
WHERE regexp_matches(candidate, '{_NAME_SHAPE.replace("'", "''")}')
  AND NOT regexp_matches(lower(candidate), '{_STOPWORDS}')
ORDER BY c_custkey
""",
)
def f5_name_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: player-name-shape predicate (nba_props_scraper.py:707-731): 2-4
    capitalized words, charset regex, stop-word exclusion — applied to
    deterministically constructed candidate strings."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    first = F.element_at(
        F.array(*[F.lit(w) for w in _FIRSTS]), (F.col("c_custkey") % 5 + 1).cast("int")
    )
    last = F.element_at(
        F.array(*[F.lit(w) for w in _LASTS]),
        (F.floor(F.col("c_custkey") / 5) % 5 + 1).cast("int"),
    )
    named = c.withColumn("candidate", F.concat(first, F.lit(" "), last))
    return (
        named.filter(
            F.col("candidate").rlike(_NAME_SHAPE)
            & ~F.lower(F.col("candidate")).rlike(_STOPWORDS)
        )
        .select("c_custkey", "candidate")
        .orderBy("c_custkey")
    )


_TEAM_CSV = "NATION_1, nation_2 ,NATION_1,BOGUS,NATION_17,nope, NATION_3"


@query(
    "f6_token_list_validate",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT upper(trim(t)) AS token
  FROM unnest(string_split('{_TEAM_CSV}', ',')) AS u(t)
  WHERE trim(t) <> ''
)
SELECT token, (n_name IS NOT NULL) AS is_valid
FROM tok LEFT JOIN nation ON token = n_name
ORDER BY token
""",
)
def f6_token_list_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: parse a user-supplied team-list string — split, trim, upper,
    dedupe — then partition valid/invalid against the dimension table
    (Cleaning_Glass_Multi.py:716-739). The dim side is broadcast."""
    n = read_table(spark, sf_dir, "nation").select("n_name")
    tok = (
        spark.range(1)
        .select(F.explode(F.split(F.lit(_TEAM_CSV), ",")).alias("raw"))
        .select(F.upper(F.trim("raw")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        tok.join(F.broadcast(n), tok.token == n.n_name, "left")
        .select("token", F.col("n_name").isNotNull().alias("is_valid"))
        .orderBy("token")
    )


@query(
    "f7_min_content",
    oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE n_chars > 50 AND len(string_split_regex(trim(text), '\s+')) > 1
GROUP BY source
ORDER BY source
""",
)
def f7_min_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: minimum-content gate (Cleaning_Glass_#1.py:400-414: displayed AND
    len(text)>50 AND rows>1) — keep documents with >50 chars and >1 token,
    count survivors per source."""
    d = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    return (
        d.filter((F.col("n_chars") > 50) & (n_tokens > 1))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


@query(
    "f8_skip_if_exists",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n_pending
FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def f8_skip_if_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: skip-if-exists incremental run
    (get_basketball_stats_all_teams_Version6.py:219-222) — anti-join the
    work list against the already-materialized manifest; only unprocessed
    keys remain. At scale this is partition pruning over the sink manifest."""
    o = read_table(spark, sf_dir, "orders")
    manifest = o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    return (
        o.join(manifest, "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_pending"))
        .orderBy("o_orderstatus")
    )
