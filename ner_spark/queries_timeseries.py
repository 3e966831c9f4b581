"""Time-series driver queries: as-of join and binned range join over events.

Each Spark query uses the shuffle-minimal operator from
``operators/asof.py``; the DuckDB oracle states the same semantics in the
naive relational form (inequality join + row_number / group by), which is
exactly the shape the operators exist to avoid at scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.asof import asof_join, range_join_binned
from .queries import _t, query


@query(
    "events_asof_join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT c.event_id, c.user_id, c.ts,
             p.value AS purchase_value, p.ts AS purchase_ts,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM clicks c LEFT JOIN purch p
        ON c.user_id = p.user_id AND p.ts <= c.ts
    )
    SELECT event_id, user_id, ts, purchase_value, purchase_ts,
           CASE WHEN purchase_ts IS NULL THEN NULL
                ELSE epoch_us(ts) - epoch_us(purchase_ts) END AS gap_us
    FROM pairs WHERE rn = 1
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join: each click attributed to the user's most recent prior (or
    simultaneous) purchase. Union + one-shuffle forward-fill — the
    distributed ASOF formulation (operators/asof.py), vs the oracle's
    inequality-join + row_number definition."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("p_ts"), "value")
        .withColumnRenamed("value", "purchase_value")
        .withColumn("purchase_ts", F.col("p_ts"))
    )
    out = asof_join(
        clicks,
        purch,
        keys=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        values=["purchase_value", "purchase_ts"],
        tie_col="event_id",
        suffix="",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        "purchase_ts",
        F.expr("timestampdiff(MICROSECOND, purchase_ts, ts)").alias("gap_us"),
    )


@query(
    "events_range_join",
    """
    WITH win AS (
      SELECT event_id AS window_id, user_id, ts AS w_start,
             ts + INTERVAL 10 MINUTE AS w_end
      FROM events WHERE event_type = 'error'
    ),
    probe AS (
      SELECT user_id, ts, value FROM events WHERE event_type <> 'error'
    )
    SELECT w.window_id, w.user_id,
           count(*) AS n_in_window,
           CAST(round(sum(CAST(p.value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_value
    FROM win w JOIN probe p
      ON p.user_id = w.user_id AND p.ts >= w.w_start AND p.ts < w.w_end
    GROUP BY w.window_id, w.user_id
    """,
)
def events_range_join(spark, sf_dir):
    """Interval-overlap join: activity landing inside each error's 10-minute
    window, per user. Bucket-binned equi-join (operators/asof.py) — the
    oracle's range-predicate join would nested-loop at scale."""
    ev = _t(spark, sf_dir, "events")
    win = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    probe = ev.filter(F.col("event_type") != "error").select("user_id", "ts", "value")
    joined = range_join_binned(
        win, probe, keys=["user_id"], start="w_start", end="w_end", probe_ts="ts"
    )
    return joined.groupBy("window_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "events_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT u.user_id, s1.t1 AS signup_ts, s2.t2 AS first_click_ts,
           s3.t3 AS first_purchase_ts,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     WHEN s1.t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage
    FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
           LEFT JOIN s2 ON u.user_id = s2.user_id
           LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
)
def events_funnel(spark, sf_dir):
    """Sequential funnel mining (signup -> first later click -> first later
    purchase, per user) as three chained conditional window-minima over ONE
    ``partitionBy(user_id)`` window: a single exchange and zero joins — the
    oracle states the same chain as three inequality joins, which would
    re-shuffle the fact table once per funnel step at scale."""
    w = Window.partitionBy("user_id")
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    x1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    x2 = x1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
        )
    ).over(w)
    x3 = x2.withColumn("t3", t3)
    return x3.groupBy("user_id").agg(
        F.min("t1").alias("signup_ts"),
        F.min("t2").alias("first_click_ts"),
        F.min("t3").alias("first_purchase_ts"),
        F.max(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("funnel_stage"),
    )


@query(
    "events_json_extract",
    """
    SELECT event_id, event_type,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS INT)
           END AS k_val,
           CAST(json_valid(props) AND json_extract_string(props, '$.k') IS NOT NULL
                AS BOOLEAN) AS is_valid
    FROM events
    """,
)
def events_json_extract(spark, sf_dir):
    """Semi-structured extraction from the JSON props column.
    ``get_json_object`` runs JVM-side inside codegen; malformed or
    key-missing payloads degrade to NULL + is_valid=false instead of
    failing the job (the quarantine split is then a plain filter)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        "event_type",
        k.cast("int").alias("k_val"),
        k.isNotNull().alias("is_valid"),
    )


@query(
    "events_forward_fill",
    """
    SELECT event_id, user_id, ts,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type <> 'error' THEN value END AS v
      FROM events
    )
    """,
)
def events_forward_fill(spark, sf_dir):
    """Per-key forward fill (carry last observation forward): error events
    contribute no reading, so their value fills from the user's previous
    non-error event. Window is partitioned by the natural key with a
    deterministic (ts, event_id) order — never a global sort."""
    e = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# Exact truncated EWMA (dyadic weights)
# ---------------------------------------------------------------------------

_EWMA_TAPS = 8  # weights 2^7..2^0 over the last 8 observations

_EWMA_SQL = """
    WITH v AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 1000) AS BIGINT) AS v_milli
      FROM events WHERE value IS NOT NULL
    ),
    lagged AS (
      SELECT event_id, user_id, v_milli,
             lag(v_milli, 1) OVER w AS l1, lag(v_milli, 2) OVER w AS l2,
             lag(v_milli, 3) OVER w AS l3, lag(v_milli, 4) OVER w AS l4,
             lag(v_milli, 5) OVER w AS l5, lag(v_milli, 6) OVER w AS l6,
             lag(v_milli, 7) OVER w AS l7
      FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, v_milli,
           CAST(128*v_milli + 64*coalesce(l1,0) + 32*coalesce(l2,0)
              + 16*coalesce(l3,0) + 8*coalesce(l4,0) + 4*coalesce(l5,0)
              + 2*coalesce(l6,0) + coalesce(l7,0) AS BIGINT) AS num,
           CAST(128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
              + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
              + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
              + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
              + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
              + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
              + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS den,
           round(CAST(128*v_milli + 64*coalesce(l1,0) + 32*coalesce(l2,0)
              + 16*coalesce(l3,0) + 8*coalesce(l4,0) + 4*coalesce(l5,0)
              + 2*coalesce(l6,0) + coalesce(l7,0) AS DOUBLE)
             / (128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
              + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
              + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
              + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
              + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
              + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
              + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END), 4) AS ewma
    FROM lagged
"""


@query("events_ewma_dyadic", _EWMA_SQL)
def events_ewma_dyadic(spark, sf_dir):
    """Per-user exponentially-weighted moving average with EXACT arithmetic:
    alpha=1/2 truncated to 8 taps makes every weight a power of two, so the
    weighted sum is a BIGINT (milli-scaled values * 2^7 ~ 1e8 per tap, far
    inside int64) and the present-tap weight mass renormalizes short
    prefixes — the one float operation is the final division, identical
    IEEE-754 on both engines. The recursive EWMA form would thread a float
    through every row (order-dependent drift, no parallel prefix); the
    truncated convolution is 8 lag() taps over ONE user-partitioned window
    pass — no extra shuffle beyond the per-user repartition, and the <2^-8
    truncation tail is the documented approximation.
    """
    v = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("v_milli")] + [
        F.lag("v_milli", j).over(w) for j in range(1, _EWMA_TAPS)
    ]
    weights = [1 << (_EWMA_TAPS - 1 - j) for j in range(_EWMA_TAPS)]
    num = sum(
        (F.coalesce(c, F.lit(0)) * F.lit(wt) for c, wt in zip(lags, weights)),
        F.lit(0),
    )
    den = sum(
        (F.when(c.isNotNull(), F.lit(wt)).otherwise(F.lit(0)) for c, wt in zip(lags, weights)),
        F.lit(0),
    )
    return v.select(
        "event_id",
        "user_id",
        "v_milli",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
    ).select(
        "event_id",
        "user_id",
        "v_milli",
        "num",
        "den",
        F.round(F.col("num").cast("double") / F.col("den"), 4).alias("ewma"),
    )
