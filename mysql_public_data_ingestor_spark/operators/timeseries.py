"""Time-series resampling over ``events``: fixed-grid densification
(gap filling) with forward fill — the hypertable-rollup / downsample
shape a metrics pipeline needs.

Scale: the grid is generated *distributed* (per-key ``sequence`` +
``explode``, no driver-side date loop), the join back to observed
buckets is co-partitioned on (key, bucket), and the forward fill is a
per-key ordered window — one shuffle on the key, no global ordering
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import exact_sum
from ..registry import register
from ..tables import Tables


@register(
    "events_hourly_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_start,
             sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS hour_value,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(hour_start) AS lo, max(hour_start) AS hi
      FROM hourly GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ), joined AS (
      SELECT g.user_id, g.hour_start, h.hour_value,
             coalesce(h.n_events, 0) AS n_events
      FROM grid g LEFT JOIN hourly h USING (user_id, hour_start)
    )
    SELECT user_id, hour_start,
           last_value(hour_value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY hour_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           n_events
    FROM joined
    """,
)
def events_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each user's event stream to a full hourly grid and
    forward-fill the last observed hourly value into the gaps.

    Plan: hourly rollup (one shuffle on (user, hour)) -> per-user
    bounds -> distributed grid via sequence/explode -> left join of
    grid to observations -> per-user ordered window with
    last(ignorenulls). The grid row count is sum over users of their
    active span — linear in keys x span, generated executor-side.
    """
    t = Tables(spark, sf_dir)
    hourly = (
        t.events.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            exact_sum(F.col("value"), 6).alias("hour_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_start"),
    )
    joined = grid.join(hourly, ["user_id", "hour_start"], "left").select(
        "user_id",
        "hour_start",
        "hour_value",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_start",
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        "n_events",
    )
