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


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join — the temporal operator Spark has no
    built-in for: each click event is matched to the same user's most
    recent purchase at or before the click.

    Implementation is the scalable union-window pattern, not a range
    join: tag both streams, union, ONE shuffle on user_id, sort within
    partition by (ts, kind), and carry the last purchase forward with
    last(..., ignorenulls) over an unbounded-preceding frame. At 100 TB
    this is a single exchange + sort regardless of how many purchases
    precede each click; a per-user range join would be quadratic in
    events-per-user and a broadcast approach impossible.

    Purchases are pre-deduped to one per (user, ts) — max event_id wins —
    so ties are deterministic in both engines; at equal timestamps the
    purchase sorts before the click (kind 0 < 1), i.e. the match is
    inclusive. Oracle: DuckDB's native ASOF JOIN.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"), F.col("event_id")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts", F.lit(0).alias("kind"), "event_id")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purch_id = F.when(F.col("kind") == 0, F.col("event_id"))
    purch_ts = F.when(F.col("kind") == 0, F.col("ts"))
    return (
        clicks.unionByName(purchases)
        .withColumn("b_event_id", F.last(purch_id, ignorenulls=True).over(w))
        .withColumn("b_ts", F.last(purch_ts, ignorenulls=True).over(w))
        .filter((F.col("kind") == 1) & F.col("b_event_id").isNotNull())
        .select(
            F.col("event_id").alias("a_event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("a_ts"),
            "b_event_id",
            (F.unix_timestamp("ts") - F.unix_timestamp("b_ts"))
            .cast("long")
            .alias("gap_sec"),
        )
        .orderBy("a_event_id")
    )


ORACLE_EVENTS_ASOF = """
WITH clicks AS (
  SELECT event_id AS a_event_id, user_id, ts FROM events
  WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, max(event_id) AS b_event_id FROM events
  WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT a_event_id,
       clicks.user_id::bigint AS user_id,
       strftime(clicks.ts, '%Y-%m-%d %H:%M:%S') AS a_ts,
       b_event_id,
       (epoch(date_trunc('second', clicks.ts))
        - epoch(date_trunc('second', purch.ts)))::bigint AS gap_sec
FROM clicks ASOF JOIN purch
  ON clicks.user_id = purch.user_id AND clicks.ts >= purch.ts
ORDER BY a_event_id
"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: per click, the count and value-sum of the
    same user's purchases in the preceding hour (inclusive bounds).

    Spark has no range-join operator, and the naive plan — equi-join on
    user_id with the time predicate as a residual — goes quadratic in
    events-per-user. The scale-safe shape used here is bucketed range
    join: each purchase is replicated to its hour bucket and the next
    (a 1-hour window spans at most two hour buckets), the join key is
    (user_id, hour_bucket of the click) — an exact equi-join — and the
    time predicate filters the ≤2-bucket candidates. Join fan-out is 2×
    the purchase stream regardless of per-user volume.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_event_id"),
        "user_id",
        F.col("ts").alias("a_ts"),
        F.floor(F.unix_timestamp("ts") / 3600).alias("bucket"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
        F.floor(F.unix_timestamp("ts") / 3600).alias("pbucket"),
    )
    expanded = purchases.withColumn(
        "bucket", F.explode(F.array(F.col("pbucket"), F.col("pbucket") + 1))
    )
    return (
        clicks.join(expanded, ["user_id", "bucket"])
        .filter(
            (F.col("b_ts") <= F.col("a_ts"))
            & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("a_event_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("b_value"), 4).alias("purchase_value"),
        )
        .orderBy("a_event_id")
    )


ORACLE_EVENTS_RANGE = """
SELECT c.event_id AS a_event_id,
       count(*) AS n_purchases,
       round(sum(p.value), 4) AS purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND p.ts <= c.ts
 AND p.ts >= c.ts - INTERVAL 1 HOUR
WHERE c.event_type = 'click'
GROUP BY c.event_id
ORDER BY a_event_id
"""


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted by how many weeks after their cohort week they were active —
    the standard product-analytics triangle, all exact integer arithmetic
    (week truncation + day diffs).

    Scale shape: two aggregates and one equi-join, all keyed on user_id —
    the join co-partitions with the activity aggregate so AQE can plan it
    shuffle-once; nothing is per-event after the first distinct."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    wk = F.date_trunc("week", F.col("ts"))
    act = e.select(F.col("user_id"), F.to_date(wk).alias("wk")).distinct()
    first = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        act.join(first, "user_id")
        .groupBy(
            F.unix_date(F.col("cohort")).alias("cohort_day"),
            ((F.datediff(F.col("wk"), F.col("cohort"))) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "week_offset")
    )


ORACLE_RETENTION = """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::date AS wk FROM events
), first AS (
  SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id
)
SELECT (cohort - DATE '1970-01-01') AS cohort_day,
       (datediff('day', cohort, wk) // 7)::int AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage
    must strictly follow the user's first completion of the previous
    stage. One row: users entering each stage.

    Scale shape: three per-user aggregates chained by equi-joins on
    user_id — every stage is min(ts)-conditional aggregation, so the
    event stream is scanned per stage but reduced immediately; no
    window over the full event history, no self-join on events."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    t1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.agg(F.count("*").alias("n_view"))
        .crossJoin(t2.agg(F.count("*").alias("n_view_click")))
        .crossJoin(t3.agg(F.count("*").alias("n_full_funnel")))
    )


ORACLE_FUNNEL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM t1) AS n_view,
       (SELECT count(*) FROM t2) AS n_view_click,
       (SELECT count(*) FROM t3) AS n_full_funnel
"""


def events_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample: a complete day-by-type grid over the
    events span with zero-filled counts — the time-series densification
    every downstream window/forecast operator assumes (missing periods
    must be explicit zeros, not absent rows).

    Scale shape: the dense axis is generated (sequence + explode over
    one min/max row), never scanned; the grid is a broadcast cross of
    (days × types) joined LEFT to the sparse aggregate — the aggregate
    is the only event-sized shuffle."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.to_date(F.date_trunc("day", "ts"))
    sparse = e.groupBy(day.alias("d"), "event_type").agg(
        F.count("*").alias("n")
    )
    span = e.agg(
        F.min(day).alias("d0"),
        F.max(day).alias("d1"),
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    return (
        grid.join(sparse, ["d", "event_type"], "left")
        .select(
            F.unix_date(F.col("d")).alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


ORACLE_RESAMPLE = """
WITH sparse AS (
  SELECT date_trunc('day', ts)::date AS d, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), span AS (
  SELECT min(date_trunc('day', ts))::date AS d0,
         max(date_trunc('day', ts))::date AS d1
  FROM events
), days AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS d FROM span
), types AS (SELECT DISTINCT event_type FROM events)
SELECT (days.d - DATE '1970-01-01') AS day,
       types.event_type,
       coalesce(sparse.n, 0)::bigint AS n_events
FROM days CROSS JOIN types
LEFT JOIN sparse ON sparse.d = days.d AND sparse.event_type = types.event_type
ORDER BY 1, 2
"""


def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma anomaly detection over hourly event-type counts in EXACT
    integer arithmetic: with per-type moments n, s=Σx, ss=Σx², hour h
    is anomalous iff (n·x_h − s)² > 9·(n·ss − s²) — the z² > 9 test
    cross-multiplied into bigints (mean = s/n, n²·var = n·ss − s², so
    z² = (n·x−s)²/(n·ss−s²)), and no engine can disagree on a boundary
    (the float z-score version depends on stddev accumulation order).

    Scale shape: one hourly aggregate (event-sized shuffle), one tiny
    per-type moment aggregate broadcast back onto it — the standard
    two-pass outlier scan."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = e.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
        "event_type",
    ).agg(F.count("*").alias("x"))
    moments = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    flagged = (
        hourly.join(F.broadcast(moments), "event_type")
        .withColumn("lhs", (F.col("n") * F.col("x") - F.col("s")))
        .filter(
            F.col("lhs") * F.col("lhs")
            > 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        )
    )
    return (
        flagged.select(
            "hour_us",
            "event_type",
            F.col("x").alias("n_events"),
        )
        .orderBy("hour_us", "event_type")
    )


ORACLE_ANOMALY = """
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
         count(*) AS x
  FROM events GROUP BY 1, 2
), moments AS (
  SELECT event_type, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
  FROM hourly GROUP BY event_type
)
SELECT h.hour_us, h.event_type, h.x AS n_events
FROM hourly h JOIN moments m ON h.event_type = m.event_type
WHERE (m.n * h.x - m.s) * (m.n * h.x - m.s)
      > 9 * (m.n * m.ss - m.s * m.s)
ORDER BY h.hour_us, h.event_type
"""


_SLIDING_DAYS = 7


def events_sliding_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct active users ending each day (the WAU
    curve). Distinct-over-sliding-window has no direct window-function
    form (countDistinct is unsupported over RANGE frames in any
    engine); the scalable shape is replicate-by-offset: each (user,
    active-day) pair contributes to the 7 window-end days it falls in,
    then ONE distinct-count per end day.

    Scale shape: the distinct (user, day) reduction happens FIRST (the
    only event-sized shuffle), the ×7 replication is a narrow explode
    of the already-reduced pairs, and the final aggregate is day-keyed.
    Replication factor == window length — bounded and explicit."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.to_date(F.date_trunc("day", "ts"))
    act = e.select("user_id", day.alias("d")).distinct()
    span = e.agg(F.min(day).alias("d0"), F.max(day).alias("d1")).collect()[0]
    ends = (
        act.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(d, date_add(d, {_SLIDING_DAYS - 1}), interval 1 day)")
            ).alias("end_day"),
        )
        .filter(
            (F.col("end_day") >= F.lit(span["d0"]))
            & (F.col("end_day") <= F.lit(span["d1"]))
        )
    )
    return (
        ends.groupBy(F.unix_date(F.col("end_day")).alias("end_day"))
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("end_day")
    )


ORACLE_SLIDING = f"""
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('day', ts)::date AS d FROM events
), span AS (
  SELECT min(d) AS d0, max(d) AS d1 FROM act
), ends AS (
  SELECT user_id,
         unnest(generate_series(d, d + INTERVAL {_SLIDING_DAYS - 1} DAY,
                                INTERVAL 1 DAY))::date AS end_day
  FROM act
)
SELECT (end_day - DATE '1970-01-01') AS end_day,
       count(DISTINCT user_id) AS n_active_users
FROM ends, span
WHERE end_day BETWEEN span.d0 AND span.d1
GROUP BY 1 ORDER BY 1
"""


def order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps via LEAD/LAG — the sequential-window shape
    (reorder-time analytics, churn signals) the catalog's other windows
    (ROWS/RANGE frames, session_window) do not cover: per customer, the
    day gaps between consecutive orders, aggregated per market segment
    in exact integers.

    Scale shape: ONE shuffle on o_custkey for the lag window, then one
    segment-sized aggregate after a broadcast join to the customer dim.
    Ties on o_orderdate are broken by o_orderkey in the window ordering
    on BOTH engines, so the lag pairing is deterministic."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        t["orders"]
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return (
        gaps.join(
            F.broadcast(
                t["customer"].select(
                    F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
                )
            ),
            "o_custkey",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("sum_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_ORDER_GAPS = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(CAST(o_orderdate AS DATE))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
)
SELECT c_mktsegment,
       count(*) AS n_gaps,
       CAST(sum(gap_days) AS BIGINT) AS sum_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days
FROM g JOIN customer ON c_custkey = o_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build — the CDC/dimension-history operator:
    each user's event stream becomes validity intervals
    [ts, next_ts) via LEAD, the open-ended current version identified
    per key; reported per user as version count, the current value, and
    the total closed-interval coverage in exact epoch microseconds.

    This is the batch twin of ``events_latest_state_stream`` (the
    last-write-wins serving view): same key ordering, but keeping the
    FULL version history instead of only the head — what a warehouse
    dimension load does on every merge.

    Scale shape: one shuffle on user_id; both windows (the LEAD and the
    current-row rank) share that exchange. Ordering ties on ts break by
    event_id on both engines."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    v = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.lead("ts").over(wv)).alias("next_us"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        v.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            F.count("*").alias("n_versions"),
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
                "current_type"
            ),
            F.coalesce(
                F.sum(F.col("next_us") - F.col("ts_us")), F.lit(0)
            )
            .cast("long")
            .alias("covered_us"),
        )
        .orderBy("user_id")
    )


ORACLE_SCD2 = """
WITH v AS (
  SELECT user_id, event_type,
         epoch_us(ts) AS ts_us,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) AS next_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       count(*) AS n_versions,
       max(CASE WHEN rn = 1 THEN event_type END) AS current_type,
       CAST(coalesce(sum(next_us - ts_us), 0) AS BIGINT) AS covered_us
FROM v
GROUP BY user_id
ORDER BY user_id
"""


def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily volume trend: the OLS regression slope of daily
    event counts over the day index, per event type — grouped model
    fitting, the growth/decay detector run over every metric stream
    before alerting on it.

    Engine-portability: ``regr_slope`` accumulates floats in partition
    order, so its last bits differ between engines. Instead the closed
    form slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) is computed with
    EXACT bigint sums (x = epoch day number, y = the day's count) and
    ONE final IEEE division — bit-identical anywhere, the PageRank
    contract. Both integer terms ship in the output so the oracle
    checks the sums, not just the quotient.

    Scale shape: one shuffle for the (type, day) pre-aggregate, one for
    the per-type rollup of five integer sums — partial-aggregated
    map-side. Headroom: day numbers ~2×10⁴, so n·Σx² needs ~62 bits at
    a century of days × 10⁹ events/day; past that, scale x to
    days-since-corpus-min (the oracle's CTE does the same).
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
        )
        .agg(F.count("*").alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        sums.select(
            "event_type",
            "n_days",
            num.cast("long").alias("num"),
            den.cast("long").alias("den"),
            F.round(num.cast("double") / den.cast("double"), 6).alias("slope"),
        )
        .orderBy("event_type")
    )


ORACLE_TREND = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         count(*) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         count(*) AS n_days,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type,
       n_days,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS num,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS den,
       round(CAST(n_days * sxy - sx * sy AS DOUBLE)
             / CAST(n_days * sxx - sx * sx AS DOUBLE), 6) AS slope
FROM s ORDER BY event_type
"""



def events_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing hours in the per-type hourly
    value series — the time-series repair step after densification
    (events_resample_fill zero-fills; forecasting and anomaly baselines
    want the line between the neighbours instead): every absent hour
    gets prev + (next − prev)·(t − t_prev)/(t_next − t_prev), computed
    from integer cent sums with ONE rounded IEEE division per gap row —
    engine-portable like every fixed-point operator here.

    Scale shape: one shuffle for the hourly pre-aggregate; the per-type
    hour grid comes from a sequence() explode of the type's own span
    (never a global cross join); the neighbour lookup is two window
    passes over the SAME (type, hr) sort — Spark plans one sort, both
    frames run in it. Reported per type: grid size, observed hours,
    interpolated hours, and the exact post-fill total.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    obs = (
        e.groupBy(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").alias("hr"),
        )
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"))
    )
    span = obs.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = span.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    g = grid.join(obs, ["event_type", "hr"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    marked = g.select(
        "event_type",
        "hr",
        "cents",
        F.last("cents", ignorenulls=True).over(w_prev).alias("pc"),
        F.last(F.when(F.col("cents").isNotNull(), F.col("hr")), ignorenulls=True)
        .over(w_prev)
        .alias("ph"),
        F.first("cents", ignorenulls=True).over(w_next).alias("nc"),
        F.first(F.when(F.col("cents").isNotNull(), F.col("hr")), ignorenulls=True)
        .over(w_next)
        .alias("nh"),
    )
    interp = (
        F.col("pc")
        + F.round(
            (F.col("nc") - F.col("pc"))
            * (F.col("hr") - F.col("ph"))
            / (F.col("nh") - F.col("ph"))
        ).cast("long")
    )
    filled = F.coalesce(F.col("cents"), interp)
    return (
        marked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.count("cents").alias("n_observed"),
            (F.count("*") - F.count("cents")).alias("n_interp"),
            F.sum(filled).alias("total_cents"),
        )
        .orderBy("event_type")
    )


ORACLE_INTERP = """
WITH obs AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS hr,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM obs GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM span
), g AS (
  SELECT gr.event_type, gr.hr, o.cents
  FROM grid gr LEFT JOIN obs o
    ON gr.event_type = o.event_type AND gr.hr = o.hr
), marked AS (
  SELECT event_type, hr, cents,
         last_value(cents IGNORE NULLS) OVER w_prev AS pc,
         last_value(CASE WHEN cents IS NOT NULL THEN hr END IGNORE NULLS)
           OVER w_prev AS ph,
         first_value(cents IGNORE NULLS) OVER w_next AS nc,
         first_value(CASE WHEN cents IS NOT NULL THEN hr END IGNORE NULLS)
           OVER w_next AS nh
  FROM g
  WINDOW w_prev AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       count(*) AS n_hours,
       count(cents) AS n_observed,
       count(*) - count(cents) AS n_interp,
       CAST(sum(coalesce(cents,
            pc + CAST(round((nc - pc) * (hr - ph) * 1.0 / (nh - ph)) AS BIGINT)))
            AS BIGINT) AS total_cents
FROM marked GROUP BY event_type ORDER BY event_type
"""



def events_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioural-model operator (what follows a click?
    is error->error a loop?) behind next-action prediction and
    anomaly scoring on event streams. Each user's events are ordered by
    (ts, event_id) — deterministic under timestamp ties — LAG yields
    the (prev_type, type) bigrams, and the rollup emits count plus the
    row-conditional probability P(to | from) as ONE IEEE division of
    exact integers.

    Scale shape: one shuffle on user_id for the sequence sort (the
    window), one grouped aggregate on the 25-cell transition key, and a
    broadcast-sized per-from total joined back — the same
    sort-once/aggregate-twice shape as the sessionizers.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    counts = bi.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 4).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_MARKOV = """
WITH bi AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM bi WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
), totals AS (
  SELECT from_type, sum(n) AS tot FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       round(c.n * 1.0 / t.tot, 4) AS p
FROM counts c JOIN totals t ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""


QUERIES = {
    "events_hourly": events_hourly,
    "events_trend_slope": events_trend_slope,
    "events_interpolate_gaps": events_interpolate_gaps,
    "events_type_markov": events_type_markov,
    "order_gap_stats": order_gap_stats,
    "events_scd2_intervals": events_scd2_intervals,
    "events_resample_fill": events_resample_fill,
    "events_anomaly_hours": events_anomaly_hours,
    "events_sliding_users": events_sliding_users,
    "events_sessionize": events_sessionize,
    "sample_per_source": sample_per_source,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "user_retention_cohorts": user_retention_cohorts,
    "event_funnel": event_funnel,
}

ORACLES = {
    "events_hourly": ORACLE_EVENTS_HOURLY,
    "events_trend_slope": ORACLE_TREND,
    "events_interpolate_gaps": ORACLE_INTERP,
    "events_type_markov": ORACLE_MARKOV,
    "order_gap_stats": ORACLE_ORDER_GAPS,
    "events_scd2_intervals": ORACLE_SCD2,
    "events_resample_fill": ORACLE_RESAMPLE,
    "events_anomaly_hours": ORACLE_ANOMALY,
    "events_sliding_users": ORACLE_SLIDING,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "sample_per_source": ORACLE_SAMPLE_PER_SOURCE,
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_range_join": ORACLE_EVENTS_RANGE,
    "user_retention_cohorts": ORACLE_RETENTION,
    "event_funnel": ORACLE_FUNNEL,
}
