"""Event-analytics extensions: as-of join, exact percentiles, vector
centroids, and funnel conversion.

Scale notes:
- The as-of join uses the union+sorted-window formulation (tag both streams,
  one shuffle on user_id, carry the last left-side timestamp forward) —
  the standard way to make an as-of join a *single* shuffle instead of a
  range self-join; at 100 TB it scales with the event volume per user.
- Percentiles are exact (sort-based) for oracle parity; the documented
  scale path is `approx_percentile` (t-digest-style sketch, map-combinable)
  which swaps in without changing the query shape.
- Centroids come from posexplode → (label, pos) partial-agg; the shuffle
  key space is |labels| × dim, independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.ranks import dist_ntile
from ..functions.stable import davg, dsum, sql_davg, sql_dsum
from ..registry import register

# ---------------------------------------------------------------------------
# as-of join: attribute each purchase to the user's most recent prior click.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
  FROM events
  WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, ts, event_id, kind,
         last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, kind, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
  FROM tagged
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, click_ts,
       cast(epoch_us(ts) - epoch_us(click_ts) as bigint) AS gap_us
FROM carried WHERE kind = 1
"""


@register("q_events_asof_attribution", oracle=_ASOF_ORACLE)
def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (attribution) join via union + sorted window — one shuffle.

    A naive formulation is a range self-join (clicks x purchases per user,
    quadratic in events-per-user). Tagging both streams and carrying the
    last click timestamp forward over a (ts, kind, event_id) sort gives
    identical semantics — clicks at the same instant sort before purchases
    — with a single user_id shuffle.
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "click_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).cast("bigint").alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# exact percentiles of event value per type (linear interpolation — the
# same definition in Spark `percentile` and DuckDB `quantile_cont`).
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT event_type,
       round(cast(quantile_cont(value, 0.5) as double), 6) AS p50,
       round(cast(quantile_cont(value, 0.9) as double), 6) AS p90,
       round(cast(quantile_cont(value, 0.99) as double), 6) AS p99,
       count(*) AS n
FROM events
GROUP BY event_type
"""


@register("q_value_percentiles", oracle=_PCT_ORACLE)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles. At 100 TB the scale path is either
    (a) `approx_percentile(value, array(...), 10000)` — sketch-based,
    partial-agg composable, no per-group sort, same query shape — or
    (b) NO scan at all: serve from the continuously-maintained
    fixed-width histogram via ``stats.served_hist_quantiles`` (global)
    / ``served_group_quantiles`` (this query's per-type grain), whose
    interpolation q_value_hist_quantiles / q_doclen_hist_by_source
    grade as calibration audits (pytest pins the served values within
    one bin width of these exact ones)."""
    ev = table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("p"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# per-label embedding centroids (elementwise mean), long format.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = f"""
SELECT label, pos, {sql_davg('val', 'centroid')}, count(*) AS n
FROM (
  SELECT label,
         unnest(cast(embedding as double[])) AS val,
         unnest(range(len(embedding))) AS pos
  FROM embeddings
)
GROUP BY label, pos
"""


@register("emb_label_centroids", oracle=_CENTROID_ORACLE)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid of the embedding column (e.g. for IVF codebook
    training or class prototypes). posexplode → (label, pos) aggregation:
    map-side partial sums; shuffle cardinality = |labels| × dim regardless
    of input rows."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
        )
        .groupBy("label", "pos")
        .agg(davg(F.col("val")).alias("centroid"), F.count(F.lit(1)).alias("n"))
        .select("label", F.col("pos").cast("bigint").alias("pos"), "centroid", "n")
    )


# ---------------------------------------------------------------------------
# funnel: signup → first click after signup → first purchase after that.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH signups AS (
  SELECT user_id, min(ts) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), clicks AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN signups s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts >= s.t_signup
  GROUP BY e.user_id
), purchases AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM signups) AS n_signup,
       (SELECT count(*) FROM clicks) AS n_click_after_signup,
       (SELECT count(*) FROM purchases) AS n_purchase_after_click
"""


@register("q_events_funnel", oracle=_FUNNEL_ORACLE)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion. Each stage joins on user_id against the
    previous stage's (small, per-user) relation; all three joins share the
    user_id partitioning so AQE plans them without extra shuffles."""
    ev = table(spark, sf_dir, "events")
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(signups, "user_id")
        .where(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        signups.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).alias("n_click_after_signup")))
        .crossJoin(purchases.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


# ---------------------------------------------------------------------------
# cohort retention: week-of-first-event cohorts × week offset.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         cast(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 as int) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
), sizes AS (
  SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY cohort_week
)
SELECT a.cohort_week, a.week_offset,
       count(*) AS n_active,
       max(s.n_cohort) AS n_cohort,
       round(count(*) * 1.0 / max(s.n_cohort), 6) AS retention
FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY a.cohort_week, a.week_offset
"""


@register("q_events_retention", oracle=_RETENTION_ORACLE)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention. firsts/sizes are per-user aggregates (small);
    the distinct-activity shuffle is keyed on (user, cohort, offset) —
    partial-agg-friendly. sizes is broadcast into the final join."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        activity.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.max("n_cohort").alias("n_cohort"),
            F.round(F.count(F.lit(1)) * F.lit(1.0) / F.max("n_cohort"), 6).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# composed end-to-end curation: classify → quality-score → exact-dedup
# (keep canonical) → per-(lang, sentiment) corpus stats. One declarative
# plan — Catalyst fuses the stages; nothing materializes in between.
# ---------------------------------------------------------------------------


def _curate_oracle() -> str:
    from ..functions import sentiment as S
    from ..functions.hashing import sql_md5_long
    from ..functions.stable import sql_davg

    return f"""
WITH {S.SQL_CLASSIFIED_CTE},
scored AS (
  SELECT *, {S.SQL_QUALITY_EXPR} AS quality FROM labeled
), hashed AS (
  SELECT *, {sql_md5_long('text')} AS text_hash FROM scored
), canon AS (
  SELECT *, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS _rk
  FROM hashed
)
SELECT lang, sentiment,
       count(*) AS n_docs,
       {sql_davg('quality', 'avg_quality')},
       {sql_davg('confidence', 'avg_confidence')}
FROM canon WHERE _rk = 1
GROUP BY lang, sentiment
"""


@register("pipeline_curate_stats", oracle=_curate_oracle())
def pipeline_curate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import sentiment as S
    from ..functions.hashing import md5_long
    from .sentiment_ops import classified

    lab = classified(spark, sf_dir)
    scored = lab.withColumn(
        "quality", S.quality_score(F.col("text"), F.col("sentiment"))
    ).withColumn("text_hash", md5_long(F.col("text")))
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    canon = scored.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    return canon.groupBy("lang", "sentiment").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.col("quality")).alias("avg_quality"),
        davg(F.col("confidence")).alias("avg_confidence"),
    )


# ---------------------------------------------------------------------------
# q_events_gapfill — dense date spine + zero-fill + carry-forward: the
# time-series normalization every trend consumer needs. The spine comes
# from one min/max aggregate row exploded into a sequence — never a
# driver-side loop; the carry-forward window runs over ~|days| rows.
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         count(*) AS n_events,
         {sql_dsum('value', 'total_value')}
  FROM events GROUP BY 1
), bounds AS (
  SELECT min(day) AS mn, max(day) AS mx FROM daily
), spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT s.day,
       coalesce(d.n_events, 0) AS n_events,
       coalesce(d.total_value, 0.0) AS total_value,
       last_value(d.total_value IGNORE NULLS) OVER (
         ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS carried_value,
       d.day IS NULL AS is_gap
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@register("q_events_gapfill", oracle=_GAPFILL_ORACLE)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
    )
    spine = (
        daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    joined = spine.alias("s").join(
        daily.alias("d"), F.col("s.day") == F.col("d.day"), "left"
    )
    # window over the ~|days| spine — tiny relation, single partition is fine
    # and documented (a year of days is 365 rows regardless of input TB).
    w = Window.orderBy(F.col("s.day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col("s.day").alias("day"),
        F.coalesce(F.col("d.n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("d.total_value"), F.lit(0.0)).alias("total_value"),
        F.last(F.col("d.total_value"), ignorenulls=True).over(w).alias("carried_value"),
        F.col("d.day").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# q_events_anomaly — two-pass z-score standardization: per-type moments
# from decimal-exact sums, broadcast back, flag |z| > 3. The stats side is
# |event_type| rows; the fact side is touched once.
# ---------------------------------------------------------------------------

_ANOM_ORACLE = """
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         cast(sum(cast(value as decimal(30,10))) as double) AS s1,
         cast(sum(cast(value * value as decimal(30,10))) as double) AS s2
  FROM events GROUP BY event_type
), z AS (
  SELECT e.event_type, e.value,
         (e.value - s.s1 / s.n)
           / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) AS zscore
  FROM events e JOIN stats s ON e.event_type = s.event_type
)
SELECT event_type,
       count(*) AS n,
       cast(sum(CASE WHEN abs(zscore) > 3 THEN 1 ELSE 0 END) as bigint)
         AS n_anomalies,
       round(max(abs(zscore)), 6) AS max_abs_z
FROM z
GROUP BY event_type
"""


@register("q_events_anomaly", oracle=_ANOM_ORACLE)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stable import dsum

    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("st")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (
        ev.join(F.broadcast(stats), ev.event_type == F.col("st"))
        .withColumn("zscore", (F.col("value") - mean) / std)
    )
    return z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.abs("zscore") > 3, 1).otherwise(0)).alias("n_anomalies"),
        F.round(F.max(F.abs("zscore")), 6).alias("max_abs_z"),
    )


# ---------------------------------------------------------------------------
# q_user_overlap — audience overlap: Jaccard between per-event-type user
# sets. Distinct (type, user) first (map-side combinable), then a
# |types|²-keyed self-join of small per-type sets.
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, count(*) AS n FROM tu GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_common
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_common, sa.n AS n_a, sb.n AS n_b,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
"""


@register("q_user_overlap", oracle=_OVERLAP_ORACLE)
def q_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                * F.lit(1.0)
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q_order_deciles — ntile decile stats over order value.
# ---------------------------------------------------------------------------

_DECILE_ORACLE = f"""
WITH d AS (
  SELECT o_totalprice, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, count(*) AS n,
       round(min(o_totalprice), 6) AS lo,
       round(max(o_totalprice), 6) AS hi,
       {sql_dsum('o_totalprice', 'total')}
FROM d GROUP BY decile
"""


@register("q_order_deciles", oracle=_DECILE_ORACLE)
def q_order_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile stats WITHOUT the single-partition global-ntile window.

    ntile needs every row's global rank; functions/ranks.dist_ntile is the
    TeraSort-rank device for that (range-repartition on the sort key, per-
    partition row index, broadcast per-partition count offsets, closed-form
    bucket). This query originally carried an inline copy of that device;
    it now routes through the hoisted-and-hardened helper (r6 advice): the
    lazy localCheckpoint there pins ONE RangePartitioner boundary sample
    across both plan branches, where the inline copy silently depended on
    spark.sql.exchange.reuse staying enabled to not misrank. The DuckDB
    oracle keeps the declarative ntile form, so the exact bucket semantics
    (first n%10 buckets one row larger) are pinned by hash.
    """
    orders = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = dist_ntile(
        orders, "o_totalprice", "o_orderkey", 10, "decile", keep_value=True
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
        dsum(F.col("o_totalprice")).alias("total"),
    )


# ---------------------------------------------------------------------------
# q_events_seasonality — hour-of-day × day-of-week activity profile.
# ---------------------------------------------------------------------------

_SEASON_ORACLE = f"""
SELECT cast(isodow(ts) as int) AS dow,
       cast(hour(ts) as int) AS hod,
       count(*) AS n_events,
       {sql_davg('value', 'avg_value')}
FROM events
GROUP BY 1, 2
"""


@register("q_events_seasonality", oracle=_SEASON_ORACLE)
def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        # weekday() is 0=Monday; +1 matches DuckDB's isodow (1=Monday)
        F.expr("cast(weekday(ts) + 1 as int)").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        davg(F.col("value")).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# q_nation_segment_pivot — wide pivot: revenue by nation × market segment
# using the DataFrame pivot API (values enumerated, so the plan is a
# single partial-agg pass, no second job to discover categories).
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

_PIVOT_ORACLE = f"""
SELECT n_name,
       {", ".join(sql_dsum(f"CASE WHEN c_mktsegment = '{s}' THEN o_totalprice ELSE 0.0 END", s.lower()) for s in _SEGMENTS)}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("q_nation_segment_pivot", oracle=_PIVOT_ORACLE)
def q_nation_segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey).join(
        broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    pivoted = (
        joined.groupBy("n_name")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(dsum(F.col("o_totalprice")))
    )
    return pivoted.select(
        "n_name",
        *[F.coalesce(F.col(s), F.lit(0.0)).alias(s.lower()) for s in _SEGMENTS],
    )


# ---------------------------------------------------------------------------
# q_churned_buyers — set operation: customers who ordered in 1996 but not
# in 1997 (EXCEPT), counted per market segment.
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= timestamp '1996-01-01' AND o_orderdate < timestamp '1997-01-01'
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= timestamp '1997-01-01' AND o_orderdate < timestamp '1998-01-01'
), churned AS (
  SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97
)
SELECT c_mktsegment, count(*) AS n_churned
FROM churned JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("q_churned_buyers", oracle=_SETOPS_ORACLE)
def q_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    def buyers(y0: str, y1: str) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    churned = buyers("1996-01-01", "1997-01-01").exceptAll(
        buyers("1997-01-01", "1998-01-01")
    )
    return (
        churned.join(broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )


# ---------------------------------------------------------------------------
# q_nation_segment_unpivot — the inverse relational operator: UNPIVOT
# (melt) the wide nation × segment revenue matrix back to long form via
# the DataFrame.unpivot API (Spark's typed melt — one map-side expand,
# no shuffle beyond the pivot's own aggregation). Wide→long is how a
# pivoted report re-enters relational processing (joins, filters,
# window functions all want long form); the pair of operators makes the
# engine closed under both directions.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = f"""
WITH w AS ({_PIVOT_ORACLE})
{" UNION ALL ".join(
    f"SELECT n_name, '{s.lower()}' AS segment, {s.lower()} AS revenue FROM w"
    for s in _SEGMENTS
)}
"""


@register("q_nation_segment_unpivot", oracle=_UNPIVOT_ORACLE)
def q_nation_segment_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the pivoted nation × segment matrix to (n_name, segment,
    revenue) long form with DataFrame.unpivot — zero-revenue cells kept
    (the pivot coalesced them), so the long relation is dense:
    |nations| × |segments| rows."""
    wide = q_nation_segment_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["n_name"],
        values=[s.lower() for s in _SEGMENTS],
        variableColumnName="segment",
        valueColumnName="revenue",
    )
