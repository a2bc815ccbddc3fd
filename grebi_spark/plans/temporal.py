"""Temporal / window operators over the events table — the batch twins of
the streaming ops (tumbling windows, sessionization) plus per-group
sampling, each with a DuckDB oracle.

Timestamps cross engines as epoch microseconds (bigint) so nanosecond
parquet precision and timezone rendering cannot skew the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: counts + value sums per event type."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("hour_us", "event_type")
    )


ORACLE_EVENTS_HOURLY = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions split on >30-minute gaps
    (built-in session_window — no Python state). Output: per user, number
    of sessions and the largest session size."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    sessions = e.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "n_sessions",
            "max_session_events",
        )
        .orderBy("user_id")
    )


ORACLE_EVENTS_SESSIONIZE = """
WITH ordered AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM ordered
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), sized AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id::bigint AS user_id,
       count(*) AS n_sessions,
       max(n_events) AS max_session_events
FROM sized GROUP BY user_id ORDER BY user_id
"""


def sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k sampling (the 'take N best docs per source' shape
    every corpus pipeline needs): top 3 docs per source by quality proxy
    (longest first, doc_id tiebreak) via row_number."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", "n_chars", F.col("rn").cast("int").alias("rn"))
        .orderBy("source", "rn")
    )


ORACLE_SAMPLE_PER_SOURCE = """
SELECT source, doc_id, n_chars, rn::int AS rn FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= 3
ORDER BY source, rn
"""


QUERIES = {
    "events_hourly": events_hourly,
    "events_sessionize": events_sessionize,
    "sample_per_source": sample_per_source,
}

ORACLES = {
    "events_hourly": ORACLE_EVENTS_HOURLY,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "sample_per_source": ORACLE_SAMPLE_PER_SOURCE,
}
