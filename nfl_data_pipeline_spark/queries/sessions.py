"""Set operations, strict-NA aggregation, sessionization, and batch
event-time windows — the remaining SURVEY §2 surface (§2.7 set ops,
A3 strict mean) plus the batch twins of the streaming operators
(§2.10) so they are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.relational import asof_join
from nfl_data_pipeline_spark.queries import register

_GAP_NS = 30 * 60 * 1_000_000_000  # 30-minute session gap
_WIN_NS = 60 * 60 * 1_000_000_000  # 1-hour tumbling window
_HOUR_NS = 3_600_000_000_000  # 1-hour resample bucket


@register(
    "set_ops",
    """
    SELECT custkey, 'both' AS bucket FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) t
    UNION ALL
    SELECT custkey, 'f_only' AS bucket FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) t
    """,
    survey_ids=("§2.7",),
    doc="intersect / except (distinct set semantics) — absent as verbs "
    "in the reference (SURVEY §2.7), free in Spark.",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    both = f.intersect(op).withColumn("bucket", F.lit("both"))
    # subtract == SQL EXCEPT (distinct semantics)
    f_only = f.subtract(op).withColumn("bucket", F.lit("f_only"))
    return both.unionByName(f_only)


@register(
    "sessionize",
    f"""
    WITH seq AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
             LAG(epoch_ns(ts)) OVER w AS prev_ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ),
    tagged AS (
      SELECT event_id, user_id, ts_ns,
             CASE WHEN prev_ns IS NULL OR ts_ns - prev_ns > {_GAP_NS}
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    )
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts_ns, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM tagged
    """,
    survey_ids=("§2.10", "W6", "W11"),
    doc="Gap-based sessionization (30-min inactivity) — the batch twin "
    "of streaming session windows: lag → gap flag → running sum as "
    "session id. Declarative, no stateful UDF.",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumnRenamed("ts", "ts_ns")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_ns").over(w)
    new_s = F.when(
        prev.isNull() | ((F.col("ts_ns") - prev) > _GAP_NS), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_s)
        .select(
            "event_id",
            "user_id",
            F.sum("new_session").over(wrun).cast("bigint").alias("session_id"),
        )
    )


_SLIDE_NS = 30 * 60 * 1_000_000_000  # 30-minute slide
# sliding window: size = 2 × slide → every event falls in exactly 2 windows


@register(
    "time_window_aggs",
    f"""
    WITH tumbling AS (
      SELECT 'tumbling' AS kind,
             (epoch_ns(ts) - epoch_ns(ts) % {_WIN_NS}) AS win_start_ns,
             event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 2, 3
    ),
    exploded AS (
      SELECT unnest([epoch_ns(ts) - epoch_ns(ts) % {_SLIDE_NS},
                     epoch_ns(ts) - epoch_ns(ts) % {_SLIDE_NS} - {_SLIDE_NS}])
               AS win_start_ns,
             event_type, value
      FROM events
    ),
    sliding AS (
      SELECT 'sliding' AS kind, win_start_ns, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      FROM exploded
      GROUP BY 2, 3
    )
    SELECT * FROM tumbling UNION ALL SELECT * FROM sliding
    """,
    survey_ids=("§2.10",),
    doc="Event-time window aggregations, both batch twins of the "
    "streaming operators in one tagged result. Tumbling 1-hour windows "
    "— twin of streaming.windowed_counts (same grouping the "
    "watermarked stream produces), computed on the raw nano "
    "timestamps. Sliding windows (1h size / 30min slide) — each event "
    "expands to its two covering windows (explode), then grouped "
    "aggregation; the same shape Structured Streaming produces "
    "incrementally.",
)
def time_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumnRenamed("ts", "ts_ns")
    win = F.col("ts_ns") - (F.col("ts_ns") % _WIN_NS)
    tumbling = (
        e.groupBy(win.alias("win_start_ns"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.lit("tumbling").alias("kind"), "*")
    )
    anchor = F.col("ts_ns") - (F.col("ts_ns") % _SLIDE_NS)
    sliding = (
        e.select(
            F.explode(F.array(anchor, anchor - _SLIDE_NS)).alias("win_start_ns"),
            "event_type",
            "value",
        )
        .groupBy("win_start_ns", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.lit("sliding").alias("kind"), "*")
    )
    return tumbling.unionByName(sliding)


@register(
    "asof_join_events",
    """
    SELECT l.event_id, l.user_id, epoch_ns(l.ts) AS ts_ns,
           epoch_ns(r.ts) AS ts_ns_asof, r.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    survey_ids=("§2.3",),
    doc="Backward as-of join (each click ← latest prior purchase per "
    "user) — absent from the reference and from stock Spark; the "
    "union-ffill plan shuffles ONCE on the key instead of exploding an "
    "inequality join. Oracle: DuckDB's native ASOF LEFT JOIN.",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB reads TIMESTAMP(NANOS) at microsecond precision, so its
    # epoch_ns zeroes the sub-µs digits; truncate to match (ordering is
    # unaffected — event gaps ≫ 1µs and (user_id, ts) is unique).
    e = (
        load(spark, sf_dir, "events")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_ns", F.col("ts_ns") - F.col("ts_ns") % 1000)
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ns"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ns", "value"
    )
    return asof_join(
        clicks, purchases, by=["user_id"], on="ts_ns", value_cols=["ts_ns", "value"]
    )


_ATTR_WIN_NS = 30 * 60 * 1_000_000_000  # ±30-minute purchase attribution window


@register(
    "range_join_windows",
    f"""
    SELECT l.event_id, l.user_id, COUNT(*) AS n_windows
    FROM (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns
          FROM events WHERE event_type = 'click') l
    JOIN (SELECT user_id,
                 epoch_ns(ts) - {_ATTR_WIN_NS} AS lo,
                 epoch_ns(ts) + {_ATTR_WIN_NS} AS hi
          FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts_ns BETWEEN r.lo AND r.hi
    GROUP BY 1, 2
    """,
    survey_ids=("§2.3",),
    doc="Point-in-interval range join (clicks within ±30 min of a "
    "purchase, per user) — beyond the reference (equi-joins only) and "
    "beyond stock Spark (which nested-loops inequality joins): the "
    "bin-bucketed plan replicates each interval into ≤3 bins and "
    "hash-joins on (user, bin). Oracle: DuckDB's native inequality "
    "join (its IEJoin handles this directly).",
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nfl_data_pipeline_spark.operators.relational import range_join

    # µs-truncate to match DuckDB's nanos→µs read (see asof_join_events)
    e = (
        load(spark, sf_dir, "events")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_ns", F.col("ts_ns") - F.col("ts_ns") % 1000)
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ns"
    )
    windows = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("ts_ns") - _ATTR_WIN_NS).alias("lo"),
        (F.col("ts_ns") + _ATTR_WIN_NS).alias("hi"),
    )
    paired = range_join(
        clicks,
        windows,
        by=["user_id"],
        point_col="ts_ns",
        lo_col="lo",
        hi_col="hi",
        bin_width=_ATTR_WIN_NS,
    )
    return paired.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_windows")
    )



@register(
    "resample_fill",
    f"""
    WITH agg AS (
      SELECT event_type,
             epoch_ns(ts) - epoch_ns(ts) % {_HOUR_NS} AS bucket_ns,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(bucket_ns) AS lo, MAX(bucket_ns) AS hi FROM agg
    ),
    spine AS (
      SELECT t.event_type, s.bucket_ns
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, {_HOUR_NS})) AS bucket_ns
        FROM bounds
      ) s
    )
    SELECT spine.event_type, spine.bucket_ns,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n
    FROM spine LEFT JOIN agg
      ON spine.event_type = agg.event_type
     AND spine.bucket_ns = agg.bucket_ns
    """,
    survey_ids=("§2.10", "R6"),
    doc="Gap-filling resample: hourly counts per event_type with "
    "EXPLICIT zero rows for empty buckets — the dense spine a "
    "training-data pipeline needs before lag/rolling features (a "
    "missing bucket is data, not absence of a row). Spine = "
    "sequence(min,max) exploded × distinct keys; the explode "
    "replicates one tiny row per bucket, never the fact table.",
)
def resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumnRenamed("ts", "ts_ns")
    agg = e.groupBy(
        "event_type",
        (F.col("ts_ns") - F.col("ts_ns") % _HOUR_NS).alias("bucket_ns"),
    ).agg(F.count("*").alias("n"))
    bounds = agg.agg(
        F.min("bucket_ns").alias("lo"), F.max("bucket_ns").alias("hi")
    )
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(
                    F.sequence("lo", "hi", F.lit(_HOUR_NS))
                ).alias("bucket_ns")
            )
        )
    )
    return spine.join(agg, ["event_type", "bucket_ns"], "left").select(
        "event_type",
        "bucket_ns",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Event-sequence funnel — staged conversion over the events stream.
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, MIN(epoch_ns(ts)) AS t0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t1
        GROUP BY e.user_id
    )
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS users
    UNION ALL SELECT 'click', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 'purchase', (SELECT COUNT(*) FROM p)
    """,
    survey_ids=("W1", "A2", "J10"),
    doc="Ordered event-sequence funnel (view -> click after it -> "
    "purchase after that), counted per stage. The sequential "
    "dependency is expressed as a cascade of per-user MIN aggregates "
    "joined forward — every stage is a hash-agg + equi-join on "
    "user_id, so all four shuffles share one key and AQE/exchange "
    "reuse keeps the user_id clustering; no per-user iteration, no "
    "window over the full event history. At 100 TB the cascade "
    "touches events three times but each scan prunes to 3 columns "
    "and filters one event_type at the reader.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumnRenamed("ts", "ts_ns")
    ev = e.select("user_id", "event_type", "ts_ns")

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_ns") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_ns") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t2"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return stage(v, "view").unionAll(stage(c, "click")).unionAll(
        stage(p, "purchase")
    )


_CM_WIN = 60 * 60 * 1_000_000_000  # 1-hour co-moment buckets


@register(
    "comoment_corr",
    f"""
    WITH s AS (
      SELECT (epoch_ns(ts) - epoch_ns(ts) % {_CM_WIN}) AS bucket_ns,
             event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(15,6))) AS sum_x,
             SUM(CAST(user_id AS DECIMAL(15,6))) AS sum_y,
             SUM(CAST(value AS DECIMAL(15,6))
                 * CAST(value AS DECIMAL(15,6))) AS sum_xx,
             SUM(CAST(user_id AS DECIMAL(15,6))
                 * CAST(user_id AS DECIMAL(15,6))) AS sum_yy,
             SUM(CAST(value AS DECIMAL(15,6))
                 * CAST(user_id AS DECIMAL(15,6))) AS sum_xy
      FROM events
      -- TRY_CAST mirrors Spark's non-ANSI overflow-to-NULL: a pair
      -- whose value overflows DECIMAL(15,6) drops entirely (n and
      -- sums stay consistent) instead of erroring here / skewing n
      WHERE TRY_CAST(value AS DECIMAL(15,6)) IS NOT NULL
        AND TRY_CAST(user_id AS DECIMAL(15,6)) IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT bucket_ns, event_type, CAST(n AS BIGINT) AS n,
           CAST(sum_x AS DOUBLE) / n AS mean_x,
           CAST(sum_y AS DOUBLE) / n AS mean_y,
           (CAST(sum_xy AS DOUBLE)
              - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE) / n) / n
             AS cov_pop,
           CASE WHEN n * CAST(sum_xx AS DOUBLE)
                     - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) > 0
                 AND n * CAST(sum_yy AS DOUBLE)
                     - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE) > 0
                THEN (n * CAST(sum_xy AS DOUBLE)
                      - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
                     / (SQRT(n * CAST(sum_xx AS DOUBLE)
                             - CAST(sum_x AS DOUBLE)
                               * CAST(sum_x AS DOUBLE))
                        * SQRT(n * CAST(sum_yy AS DOUBLE)
                               - CAST(sum_y AS DOUBLE)
                                 * CAST(sum_y AS DOUBLE)))
           END AS corr
    FROM s
    ORDER BY bucket_ns, event_type
    """,
    survey_ids=("A11", "NS-rollup"),
    doc="Mergeable co-moment state + derived correlation "
    "(jobs/rollup.aggregate_comoments / derive_comoments): corr does "
    "not merge, but its sufficient statistics do — exact DECIMAL(15,6)"
    "-quantized sums of x, y, x², y², xy, so incrementally merged "
    "state is BIT-IDENTICAL to a one-shot aggregation (the continuous-"
    "aggregate pattern extended from sums to second moments; "
    "refresh_comoments_tx merges touched buckets atomically). This "
    "carrier derives per-(hour, event_type) means / population "
    "covariance / Pearson corr from the state in both engines.",
)
def comoment_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nfl_data_pipeline_spark.jobs.rollup import (
        aggregate_comoments,
        derive_comoments,
    )

    e = load(spark, sf_dir, "events")
    state = aggregate_comoments(e, "value", "user_id", _CM_WIN)
    return derive_comoments(state).orderBy("bucket_ns", "event_type")
