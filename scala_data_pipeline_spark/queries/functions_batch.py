"""Scalar-function queries (SURVEY.md §2.8): JSON parse, datetime
derivations, URL decode/parse/regex, explode, collect_list, casts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import extract_domain, parse_host, strip_www, url_decode_pandas
from ..functions.timefn import (
    EVENING_HOURS,
    WORK_HOURS,
    in_hour_range,
    weekday_name,
    yyyymmdd,
)
from ..sources import load_table


# ---------------------------------------------------------------------------
# F14: from_json with declared schema over events.props (the reference
# parses Kafka JSON payloads this way, filter/filter.scala:51).
# ---------------------------------------------------------------------------

def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("parsed", F.from_json("props", "k INT"))
    # P2 star-expansion of the parsed struct, then an aggregate to keep
    # the result compact: count + value sum per extracted key bucket.
    return (
        parsed.select("event_id", "parsed.*")
        .withColumn("k_bucket", F.floor(F.col("k") / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("k").cast("long").alias("k_sum"))
    )


JSON_PROPS_ORACLE = """
SELECT CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS BIGINT) AS k_bucket,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
FROM events
GROUP BY 1
"""


def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-free twin of json_extract_props via Spark 4's VariantType:
    parse_json keeps the full document (no up-front schema like
    from_json) and variant_get extracts typed paths lazily — the
    semi-structured scan pattern for heterogeneous event payloads."""
    events = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.withColumn("k", k)
        .withColumn("k_bucket", F.floor(F.col("k") / 10).cast("long"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("k").cast("long").alias("k_sum"))
    )


# ---------------------------------------------------------------------------
# F8-F13: datetime derivations + A4/A5 conditional-count fractions — the
# features module's time features (features/features.scala:64-76).
# ---------------------------------------------------------------------------

def user_time_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    visits = events.filter(F.col("user_id").isNotNull())
    return (
        visits.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("visits"),
            F.count(F.when(in_hour_range(F.col("ts"), *WORK_HOURS), 1)).alias(
                "work_cnt"
            ),
            F.count(
                F.when(in_hour_range(F.col("ts"), *EVENING_HOURS), 1)
            ).alias("evening_cnt"),
        )
        .withColumn(
            "web_fraction_work_hours", F.col("work_cnt") / F.col("visits")
        )
        .withColumn(
            "web_fraction_evening_hours", F.col("evening_cnt") / F.col("visits")
        )
    )


def _hours_case(lo: int, hi: int) -> str:
    return (
        f"CASE WHEN EXTRACT(hour FROM ts) >= {lo}"
        f" AND EXTRACT(hour FROM ts) < {hi} THEN 1 END"
    )


TIME_FRACTIONS_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS visits,
       COUNT({_hours_case(*WORK_HOURS)}) AS work_cnt,
       COUNT({_hours_case(*EVENING_HOURS)}) AS evening_cnt,
       CAST(COUNT({_hours_case(*WORK_HOURS)}) AS DOUBLE) / COUNT(*) AS web_fraction_work_hours,
       CAST(COUNT({_hours_case(*EVENING_HOURS)}) AS DOUBLE) / COUNT(*) AS web_fraction_evening_hours
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# F8/F9/F11: epoch + yyyyMMdd round-trips (filter/filter.scala:53-54,
# users_items/users_items.scala:28).
# ---------------------------------------------------------------------------

def date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_sec"),
        yyyymmdd(F.col("ts")).alias("date_str"),
        F.to_date(yyyymmdd(F.col("ts")), "yyyyMMdd").cast("string").alias("date_back"),
        weekday_name(F.col("ts")).alias("weekday"),
        F.hour("ts").cast("long").alias("hour"),
    )


DATE_ROUNDTRIP_ORACLE = """
SELECT event_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_sec,
       strftime(ts, '%Y%m%d') AS date_str,
       CAST(CAST(strptime(strftime(ts, '%Y%m%d'), '%Y%m%d') AS DATE) AS VARCHAR) AS date_back,
       lower(strftime(ts, '%a')) AS weekday,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour
FROM events
"""


# ---------------------------------------------------------------------------
# F4-F7: URL pipeline — synthesize a URL per document, then decode (UDF),
# parse_url HOST, strip www., regexp-extract the domain
# (data_mart/data_mart.scala:94-113 flow).
# ---------------------------------------------------------------------------

def url_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".org/"), F.col("lang"),
            F.lit("?id="), F.col("doc_id"),
        ).alias("url"),
        # Percent-encoded payload whose decoded form is derivable in SQL:
        F.regexp_replace(F.substring("text", 1, 30), " ", "%20").alias("encoded"),
    )
    return with_url.select(
        "doc_id",
        extract_domain(F.col("url")).alias("domain_re"),
        strip_www(parse_host(F.col("url"))).alias("host_stripped"),
        url_decode_pandas(F.col("encoded")).alias("decoded"),
    )


URL_PIPELINE_ORACLE = """
SELECT doc_id,
       source || '.org' AS domain_re,
       source || '.org' AS host_stripped,
       substr(text, 1, 30) AS decoded
FROM documents
"""


# ---------------------------------------------------------------------------
# F17: explode/unnest — token frequency over documents.
# ---------------------------------------------------------------------------

def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return tokens.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))


EXPLODE_ORACLE = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
"""


# ---------------------------------------------------------------------------
# A6: collect_list with deterministic ordering (SURVEY.md §7.5 risk 8:
# sort before compare; array serialized to string for stable hashing).
# ---------------------------------------------------------------------------

def collect_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias(
                "event_types"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


COLLECT_ORACLE = """
SELECT user_id,
       array_to_string(list_sort(list(event_type)), ',') AS event_types,
       COUNT(*) AS n_events
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
"""


# Round-6 rotation: url_pipeline (F4-F7, green r1-r5 — five consecutive
# driver rows) demoted to fund a never-checked flagship extra; the
# regex/parse_url/UDF machinery stays green via test_oracle_parity.
QUERIES: dict = {}

ORACLES: dict = {}

# Locally-oracled extras (driver registry at its 50-row cap): VariantType
# produces the same values as the from_json path, so it shares the
# oracle; user_time_fractions is a strict subset of user_time_matrix's
# oracle, so it was demoted to free a driver slot for a flagship dedup
# query (round-2 verdict).
# Round-5 rotation: date_roundtrip / explode_tokens (long-green since
# round 1; their F8-F13 / F17 machinery is also exercised by
# user_time_matrix and collect_user_events) freed driver slots for
# never-checked flagship extras. Still green via test_oracle_parity.
EXTRA_QUERIES = {
    "user_time_fractions": user_time_fractions,
    "date_roundtrip": date_roundtrip,
    "explode_tokens": explode_tokens,
    "url_pipeline": url_pipeline,
}
EXTRA_ORACLES = {
    "user_time_fractions": TIME_FRACTIONS_ORACLE,
    "date_roundtrip": DATE_ROUNDTRIP_ORACLE,
    "explode_tokens": EXPLODE_ORACLE,
    "url_pipeline": URL_PIPELINE_ORACLE,
}
# Round-13 rotation: promoted to a driver slot (per round-12 verdict:
# never driver-checked; the VARIANT-style semi-structured extraction —
# parse_json/variant_get — is a plan shape no driver query exercises).
# Round-18 rotation: demoted after 5 green driver rounds (r13-r17).
EXTRA_QUERIES["variant_extract_props"] = variant_extract_props
EXTRA_ORACLES["variant_extract_props"] = JSON_PROPS_ORACLE

# Round-6 rotation: json_extract_props (F14, green rounds 1-4; the
# from_json machinery also backs variant_extract_props' shared oracle)
# and collect_user_events (A6, green rounds 1-4; collect_list is also
# the ML train path) demoted for never-checked flagship extras.
EXTRA_QUERIES["json_extract_props"] = json_extract_props
EXTRA_ORACLES["json_extract_props"] = JSON_PROPS_ORACLE
EXTRA_QUERIES["collect_user_events"] = collect_user_events
EXTRA_ORACLES["collect_user_events"] = COLLECT_ORACLE


def map_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column family in one pass: from_json to map, create_map
    enrichment, map_concat, map_filter, transform_values, and a
    deterministic serialization (sorted map_entries → k=v CSV). The
    oracle verifies VALUES; the map API semantics live on the Spark
    side (DuckDB builds the same strings directly)."""
    events = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "map<string,string>")
    enriched = F.map_concat(
        parsed,
        F.create_map(
            F.lit("etype"), F.col("event_type"),
            F.lit("vbucket"), F.floor(F.coalesce(F.col("value"), F.lit(0.0)))
            .cast("long").cast("string"),
        ),
    )
    # drop empty/zero buckets, uppercase every value
    cleaned = F.transform_values(
        F.map_filter(enriched, lambda k, v: v != "0"),
        lambda k, v: F.upper(v),
    )
    serialized = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(cleaned)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ",",
    )
    return events.select("event_id", serialized.alias("props_norm"))


MAP_FUNCTIONS_ORACLE = """
SELECT event_id,
       array_to_string(
         list_sort(
           list_filter(
             [ 'etype=' || upper(event_type),
               CASE WHEN json_extract_string(props, '$.k') <> '0'
                    THEN 'k=' || json_extract_string(props, '$.k') END,
               CASE WHEN CAST(floor(COALESCE(value, 0.0)) AS BIGINT) <> 0
                    THEN 'vbucket=' || CAST(CAST(floor(COALESCE(value, 0.0)) AS BIGINT) AS VARCHAR)
               END ],
             x -> x IS NOT NULL)),
         ',') AS props_norm
FROM events
"""

# Round-15 promotion (never driver-checked):
# Round-19 demotion (green r15-r18).
EXTRA_QUERIES["map_functions_props"] = map_functions_props
EXTRA_ORACLES["map_functions_props"] = MAP_FUNCTIONS_ORACLE
