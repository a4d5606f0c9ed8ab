"""Event-time windowing over the `events` table (SURVEY.md §7.2 M6).

The reference only aspires to streaming ("could be data from the disk or
streaming", example/word-count-taskfile.lua:81) — never implemented. Here
the window semantics are implemented with Spark's native event-time window
functions in BATCH mode so they are oracle-checkable; `streaming/windows.py`
re-uses the same logic under Structured Streaming with watermarks (rows-only
checked, same results by construction).

Window starts are emitted both as epoch seconds (exact integer — portable)
and formatted strings; never as raw timestamps (Spark µs vs DuckDB ns
precision would break value comparison).

Scale notes: tumbling/sliding windows are pure hash aggregations on
(window, key) — map-side partial agg + one shuffle. Session windows shuffle
once on user_id then merge sorted runs per key; key cardinality (users)
bounds state exactly as in Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lua_mapreduce_spark.catalog import load_table
from lua_mapreduce_spark.functions.exact import dec, dsum_sql

_VAL = dec("value")  # events.value sits on the 2-decimal grid


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window per event_type: F.window (epoch-aligned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(f"CAST(SUM({_VAL}) AS DOUBLE)").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws_epoch"),
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_ORACLE = f"""
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS ws_epoch,
       strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600) AT TIME ZONE 'UTC',
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {dsum_sql(_VAL, "sum_value")}
FROM events
GROUP BY 1, 2, 3
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes — each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws_epoch"),
            "n_events",
            "n_users",
        )
    )


SLIDING_ORACLE = """
WITH exploded AS (
  SELECT u.ws_epoch AS ws_epoch, user_id
  FROM events,
       unnest([CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT),
               CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)]) AS u(ws_epoch)
  WHERE epoch(ts) >= u.ws_epoch AND epoch(ts) < u.ws_epoch + 3600
)
SELECT ws_epoch, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM exploded GROUP BY ws_epoch
"""


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap — Spark's
    native session_window; the oracle is classic gaps-and-islands SQL.
    Semantics: a session closes when the next event is >= gap after the
    previous event; session end = last_ts + gap (we emit start/count/sum)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(f"CAST(SUM({_VAL}) AS DOUBLE)").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


SESSION_ORACLE = f"""
WITH brk AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id < 100
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM brk
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       {dsum_sql(_VAL, "sum_value")}
FROM sess GROUP BY user_id, sid
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_ORACLE = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


def events_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup: date_trunc + distinct users + value stats."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr(f"CAST(SUM({_VAL}) AS DOUBLE)").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
    )


DAILY_ORACLE = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {dsum_sql(_VAL, "sum_value")},
       MAX(value) AS max_value
FROM events GROUP BY 1
"""


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase by first-occurrence time):
    per-stage user counts. One shuffle on user_id (conditional min-aggs),
    then a single-row reduction — the standard large-scale funnel shape;
    no self-joins, no per-user event lists."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).alias("n_click_after_view"),
        F.sum(
            F.when(
                (F.col("t_click") > F.col("t_view")) & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS n_viewed,
       CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
       CAST(SUM(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END)
            AS BIGINT) AS n_full_funnel
FROM per_user
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    distinct per (cohort_week, activity_week). Two shuffles total — one for
    first-seen per user, one for the cohort x week distinct count; the
    first-seen relation re-joins the event stream on user_id (the standard
    cohort shape, no event-list materialization)."""
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            F.date_format(week("first_ts"), "yyyy-MM-dd").alias("cohort_week"),
            F.date_format(week(F.col("ts")), "yyyy-MM-dd").alias("activity_week"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


COHORT_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
       strftime(date_trunc('week', ts), '%Y-%m-%d') AS activity_week,
       COUNT(DISTINCT e.user_id) AS n_active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


def events_sessionize_gap_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by the manual lag+cumsum method: a session starts
    where the gap to the previous event exceeds 30 minutes; the running
    count of session-starts labels each event's session. Same single
    sort-shuffle on user_id as F.session_window, but portable to any
    engine with window functions — and the label (user_id, session_seq) is
    a stable join key for downstream enrichment, which session_window's
    struct key is not."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Raw-timestamp interval comparison, NOT unix_timestamp() diffs: the
    # floored-second form disagrees with a fractional-second oracle for
    # gaps in (1800 s, 1801 s) — microsecond-exact in both engines.
    with_start = ev.withColumn(
        "is_start",
        F.when(
            F.col("ts") > F.lag("ts").over(order_w) + F.expr("INTERVAL 30 MINUTES"),
            1,
        )
        .otherwise(
            F.when(F.lag("ts").over(order_w).isNull(), 1).otherwise(0)
        ),
    )
    return (
        with_start.withColumn("session_seq", F.sum("is_start").over(run_w))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


SESSIONIZE_GAP_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1
              ELSE 0 END AS is_start
  FROM events WHERE user_id < 50
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
labeled AS (
  SELECT user_id, ts,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM labeled GROUP BY user_id, session_seq
"""


def events_trending_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types per hour: windowed count + rank, top 2 per
    hour with deterministic tie-break (count desc, type asc). Two
    shuffles: the (hour, type) agg and the per-hour rank — the standard
    'trending now' dashboard shape; at scale the rank input is already
    tiny (one row per hour x type)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("hour_epoch").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        hourly.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("hour_epoch", "event_type", "n_events", "rank")
    )


TRENDING_ORACLE = """
WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT hour_epoch, event_type, n_events, rank FROM (
  SELECT hour_epoch, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY hour_epoch
                            ORDER BY n_events DESC, event_type ASC) AS rank
  FROM hourly)
WHERE rank <= 2
"""


# --------------------------------------------------------------------------
# Trailing-window anomaly detection: flag hours whose event count deviates
# from the trailing-24h baseline by more than 3 sigma — the standard
# monitoring pass over an event firehose. The entire test is INTEGER
# arithmetic: z^2 > 9 is evaluated as
#     (cnt*n - sum)^2 > 9 * (cnt*sumsq - sum^2)
# (multiply the usual (n-mean)^2 > 9*var through by cnt^2), so there is no
# sqrt, no division, no float accumulation — bit-identical across engines
# and association orders. int64 headroom: hourly counts up to ~10^6 keep
# every term under 10^15.
#
# 100 TB shape: the raw scan collapses to (event_type, hour) rows in ONE
# map-side-combined agg — the window then runs over thousands of rows per
# type regardless of input size; a RANGE frame (value-based, 24 hours)
# stays correct when hours are missing, where a ROWS frame would silently
# stretch the baseline.
# --------------------------------------------------------------------------

_ANOM_MIN_BASE_HOURS = 12
_ANOM_K_SQ = 9  # 3-sigma


def anomaly_flags(hourly: DataFrame) -> DataFrame:
    """Trailing-24h integer z-test over an (event_type, hr, n_events)
    hourly table. Shared by the batch query below and its streaming twin
    (streaming_ops.streaming_anomaly_hours), so the two can never drift."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-24, -1)
    )
    based = hourly.select(
        "event_type",
        "hr",
        "n_events",
        F.count(F.lit(1)).over(w).alias("base_cnt"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("base_sum"),
        F.coalesce(
            F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)
        ).alias("base_sumsq"),
    )
    lhs = F.col("base_cnt") * F.col("n_events") - F.col("base_sum")
    rhs = F.col("base_cnt") * F.col("base_sumsq") - F.col("base_sum") * F.col(
        "base_sum"
    )
    return based.withColumn(
        "is_anomaly",
        (F.col("base_cnt") >= _ANOM_MIN_BASE_HOURS)
        & (lhs * lhs > F.lit(_ANOM_K_SQ) * rhs),
    )


def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("CAST(unix_timestamp(ts) DIV 3600 AS BIGINT)").alias("hr"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return anomaly_flags(hourly)


ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2),
based AS (
  SELECT event_type, hr, n_events,
         COUNT(*) OVER w AS base_cnt,
         CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS base_sum,
         CAST(COALESCE(SUM(n_events * n_events) OVER w, 0) AS BIGINT)
           AS base_sumsq
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT event_type, hr, n_events, base_cnt, base_sum, base_sumsq,
       base_cnt >= {_ANOM_MIN_BASE_HOURS}
       AND (base_cnt * n_events - base_sum) * (base_cnt * n_events - base_sum)
           > {_ANOM_K_SQ} * (base_cnt * base_sumsq - base_sum * base_sum)
         AS is_anomaly
FROM based
"""


# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov over user sequences)
# --------------------------------------------------------------------------


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each (previous type, current type) pair, the transition count and
    its row-normalized probability in integer permille — the standard
    user-behavior model input. Each user's first event has no predecessor
    and is dropped (no NULL-state row).

    Scale shape: one window shuffle on user_id for the lag, then a
    map-side-combinable count into <= |types|^2 groups; the row totals
    come from a window over that tiny grouped relation (no second scan).
    Integer permille via truncating division -> exact value oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(seq_w).alias("prev_type"),
            F.col("event_type").alias("cur_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "cur_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    return pairs.select(
        "prev_type",
        "cur_type",
        "n_transitions",
        F.expr(
            "CAST((n_transitions * 1000) DIV SUM(n_transitions)"
            " OVER (PARTITION BY prev_type) AS BIGINT)"
        ).alias("p_permille"),
    )


MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS cur_type
  FROM events),
pairs AS (
  SELECT prev_type, cur_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, cur_type)
SELECT prev_type, cur_type, n_transitions,
       CAST((n_transitions * 1000) // SUM(n_transitions)
            OVER (PARTITION BY prev_type) AS BIGINT) AS p_permille
FROM pairs
"""


# --------------------------------------------------------------------------
# Seasonal decomposition (trend + hour-of-day profile, integer-milli exact)
# --------------------------------------------------------------------------

_SD_HALF = 12 * 3600  # centered +/-12 h RANGE frame, in epoch seconds


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition of the hourly event-count series into a
    centered 25-hour moving-average TREND and an hour-of-day SEASONAL
    profile, all in scaled-integer (milli) arithmetic — no floats, so the
    oracle is exact.

    The RANGE frame on epoch seconds stays correct across missing hours
    (the events_anomaly_hours convention); both windows run over the
    ALREADY-AGGREGATED hourly table (days x 24 rows — input-size-
    independent after the first map-side-combined shuffle). The hour-of-
    day mean partitions by hod; deviation_milli = 1000*n - hod_mean is
    the seasonality-adjusted load signal an alerting pipeline consumes."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    trend = (
        f"CAST((1000 * SUM(n) OVER (ORDER BY hr_epoch RANGE BETWEEN {_SD_HALF}"
        f" PRECEDING AND {_SD_HALF} FOLLOWING)) DIV (COUNT(*) OVER (ORDER BY"
        f" hr_epoch RANGE BETWEEN {_SD_HALF} PRECEDING AND {_SD_HALF}"
        " FOLLOWING)) AS BIGINT)"
    )
    hod_mean = (
        "CAST((1000 * SUM(n) OVER (PARTITION BY hod)) DIV"
        " (COUNT(*) OVER (PARTITION BY hod)) AS BIGINT)"
    )
    return hourly.select(
        F.unix_timestamp("hour").alias("hr_epoch"),
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_str"),
        F.hour("hour").cast("int").alias("hod"),
        "n",
    ).select(
        "hr_epoch",
        "hour_str",
        "hod",
        "n",
        F.expr(trend).alias("trend_milli"),
        F.expr(hod_mean).alias("hod_mean_milli"),
        (F.col("n") * 1000 - F.expr(hod_mean)).alias("deviation_milli"),
    )


SEASONAL_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1),
base AS (
  SELECT CAST(epoch(hour) AS BIGINT) AS hr_epoch,
         strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_str,
         CAST(EXTRACT(hour FROM hour) AS INT) AS hod,
         n
  FROM hourly)
SELECT hr_epoch, hour_str, hod, n,
       CAST((1000 * SUM(n) OVER (ORDER BY hr_epoch RANGE BETWEEN {_SD_HALF}
             PRECEDING AND {_SD_HALF} FOLLOWING))
            // (COUNT(*) OVER (ORDER BY hr_epoch RANGE BETWEEN {_SD_HALF}
                PRECEDING AND {_SD_HALF} FOLLOWING)) AS BIGINT) AS trend_milli,
       CAST((1000 * SUM(n) OVER (PARTITION BY hod))
            // (COUNT(*) OVER (PARTITION BY hod)) AS BIGINT) AS hod_mean_milli,
       1000 * n - CAST((1000 * SUM(n) OVER (PARTITION BY hod))
            // (COUNT(*) OVER (PARTITION BY hod)) AS BIGINT) AS deviation_milli
FROM base
"""


# --------------------------------------------------------------------------
# Session-path analysis (top user journeys)
# --------------------------------------------------------------------------

_PA_CAP = 32  # serialized path prefix (events per user-day, deterministic)
_PA_TOP = 20


def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-_PA_TOP user journeys: the ordered event-type path of each
    (user, day), truncated to the first _PA_CAP events, counted across
    the corpus. Path construction is one (user, day) aggregation (sorted
    struct collect, bounded by the cap — no per-event window); the top-k
    frontier sorts only the aggregated path-TYPE table (the
    text_collocations convention) with the deterministic
    (count DESC, path ASC) order.

    Bounded state: the cap is applied with a row_number over the same
    (user, day) keys the aggregation groups on — rn <= cap compiles to
    WindowGroupLimit, so a pathological user-day (10^6 events) is
    truncated map-side BEFORE any per-group list materializes, and the
    collect is structurally <= _PA_CAP rows per group."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    capped = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PA_CAP
    )
    prefix = F.transform(
        F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
        lambda s: s["event_type"],
    )
    paths = capped.groupBy("user_id", "day").agg(
        F.concat_ws(">", prefix).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_user_days"))
    w = Window.orderBy(F.desc("n_user_days"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PA_TOP)
        .select("path", "n_user_days", "rank")
    )


PATH_ANALYSIS_ORACLE = f"""
WITH paths AS (
  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         array_to_string(
           list(event_type ORDER BY ts, event_id)[1:{_PA_CAP}], '>') AS path
  FROM events GROUP BY 1, 2),
counted AS (
  SELECT path, COUNT(*) AS n_user_days FROM paths GROUP BY path)
SELECT path, n_user_days, rank FROM (
  SELECT path, n_user_days,
         ROW_NUMBER() OVER (ORDER BY n_user_days DESC, path ASC) AS rank
  FROM counted)
WHERE rank <= {_PA_TOP}
"""


QUERIES = {
    "events_markov_transitions": events_markov_transitions,
    "events_seasonal_decompose": events_seasonal_decompose,
    "events_path_analysis": events_path_analysis,
    "events_sessionize_gap_method": events_sessionize_gap_method,
    "events_trending_hourly": events_trending_hourly,
    "events_cohort_retention": events_cohort_retention,
    "events_funnel_conversion": events_funnel_conversion,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_windows": events_sliding_windows,
    "events_session_windows": events_session_windows,
    "events_json_extract": events_json_extract,
    "events_daily_activity": events_daily_activity,
    "events_anomaly_hours": events_anomaly_hours,
}

ORACLES = {
    "events_markov_transitions": MARKOV_ORACLE,
    "events_seasonal_decompose": SEASONAL_ORACLE,
    "events_path_analysis": PATH_ANALYSIS_ORACLE,
    "events_sessionize_gap_method": SESSIONIZE_GAP_ORACLE,
    "events_trending_hourly": TRENDING_ORACLE,
    "events_cohort_retention": COHORT_ORACLE,
    "events_funnel_conversion": FUNNEL_ORACLE,
    "events_tumbling_hourly": TUMBLING_ORACLE,
    "events_sliding_windows": SLIDING_ORACLE,
    "events_session_windows": SESSION_ORACLE,
    "events_json_extract": JSON_ORACLE,
    "events_daily_activity": DAILY_ORACLE,
    "events_anomaly_hours": ANOMALY_ORACLE,
}
