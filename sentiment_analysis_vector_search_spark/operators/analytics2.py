"""Second analytics suite: customer-value segmentation and behavioral
transition analysis — engine staples a reference user would reach for
next once trends/funnels/retention (analytics_ext) exist.

- ``q_customer_rfm`` — RFM (recency / frequency / monetary) customer
  segmentation: per-customer order recency vs the corpus reference date,
  order count, decimal-exact spend, each scored into exact quintiles.
  The quintiles use the same distributed TeraSort-rank machinery as
  ``q_order_deciles`` (analytics_ext.py) — range-repartition + in-
  partition row index + broadcast per-partition offsets — melted into
  ONE grouped pass (:func:`ranks.dist_group_rank` keyed by metric id,
  r14), so there is NO single-partition global ntile window anywhere;
  the DuckDB oracle keeps the declarative ntile form, pinning the exact
  bucket semantics by hash.
- ``q_events_transitions`` — first-order event-type transition matrix
  (the Markov chain of user behavior): per-user lag window → (prev, next)
  pair counts → per-source-state transition probabilities. One keyed
  shuffle (user_id), one small groupBy; the output is |types|^2-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import sql_md5_long
from ..functions.stable import dsum, sql_dsum
from ..registry import register

# ---------------------------------------------------------------------------
# q_customer_rfm
# ---------------------------------------------------------------------------

_RFM_REF_DATE = "2001-08-01"  # corpus max(o_orderdate): recency anchor
_RFM_K = 5


# Hoisted to functions/ranks.py in r6 (sinks.zorder_by needs it too) and
# hardened there per the r5 advice: the range-partitioned frame is now
# localCheckpointed so the offsets branch and the join branch can never
# see different RangePartitioner boundaries. Kept under the old name —
# this module's queries and tests are its original callers.
from ..functions.ranks import dist_group_rank as _dist_group_rank  # noqa: E402
from ..functions.ranks import dist_ntile as _dist_ntile  # noqa: E402


_RFM_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS custkey,
         date_diff('day', max(o_orderdate), timestamp '{_RFM_REF_DATE}')
           AS recency_days,
         count(*) AS frequency,
         {sql_dsum('o_totalprice', 'monetary')}
  FROM orders
  GROUP BY o_custkey
)
SELECT custkey, recency_days, frequency, monetary,
       ntile({_RFM_K}) OVER (ORDER BY -recency_days, custkey) AS r_score,
       ntile({_RFM_K}) OVER (ORDER BY frequency, custkey) AS f_score,
       ntile({_RFM_K}) OVER (ORDER BY monetary, custkey) AS m_score
FROM base
"""


# ntile(k) bucket from a (rk, n_g) grouped rank — the identical closed
# form dist_ntile applies to its global (rk, n_total), parameterized on
# the per-group count so ONE grouped rank pass buckets all three RFM
# metrics. First (n%k) buckets get one extra row, matching ntile.
def _ntile_bucket_expr(k: int) -> str:
    return (
        f"cast(CASE WHEN rk <= (n_g % {k}) * (n_g DIV {k} + 1)"
        f" THEN (rk - 1) DIV (n_g DIV {k} + 1) + 1"
        f" ELSE (n_g % {k}) + (rk - 1 - (n_g % {k}) * (n_g DIV {k} + 1))"
        f" DIV (n_g DIV {k}) + 1 END as int)"
    )


@register("q_customer_rfm", oracle=_RFM_ORACLE)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM metrics + exact quintile scores (5 = best:
    most recent / most frequent / highest spend).

    r14: the three independent ``dist_ntile`` passes (one per metric,
    each paying its own range shuffle AND its own localCheckpoint — 4
    checkpoints per construct, ~1.0 s of Catalyst planning per bench rep,
    the r13 verdict's worst driver-side number) are melted into ONE
    ``dist_group_rank`` pass: 3 rows per customer keyed by metric id,
    one range shuffle over (metric, value, custkey), one checkpoint, and
    the ntile bucket recovered from (rk, n_g) by the same closed form.
    All three metric values are exactly representable as doubles
    (recency/frequency are small integers, monetary is already the
    double dsum emits), so the melted sort order per metric is identical
    to the per-metric sorts — results are hash-identical to the oracle's
    declarative ntile form (driver_sim-checked at sf0.01 + sf0.1).
    """
    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_REF_DATE).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    # ONE cut on base (down from the r13 4-checkpoint construct tax):
    # the melted pass is base's only DataFrame consumer, but
    # repartitionByRange inside dist_group_rank evaluates its input
    # TWICE (boundary-sampling pass + shuffle pass) — without the cut
    # the orders groupBy runs once per pass (A/B-measured +0.3 s exec).
    base = base.localCheckpoint(eager=False)
    melted = base.select(
        "custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("m"),
                    (-F.col("recency_days")).cast("double").alias("v"),
                ),
                F.struct(
                    F.lit(2).alias("m"),
                    F.col("frequency").cast("double").alias("v"),
                ),
                F.struct(F.lit(3).alias("m"), F.col("monetary").alias("v")),
            )
        ).alias("mv"),
    ).select("custkey", F.col("mv.m").alias("m"), F.col("mv.v").alias("v"))
    ranked = _dist_group_rank(melted, "m", "v", "custkey")
    bucket = F.expr(_ntile_bucket_expr(_RFM_K))
    # One pivot aggregation recovers BOTH the three quintile scores and
    # the three metric values (v is an exact double image of each
    # metric: recency/frequency are small integers, monetary is the
    # double dsum emits — casting back is value-exact), so no join back
    # to base is needed at all.
    return (
        ranked.select("custkey", "m", "v", bucket.alias("b"))
        .groupBy("custkey")
        .agg(
            (-F.max(F.when(F.col("m") == 1, F.col("v"))))
            .cast("int")
            .alias("recency_days"),
            F.max(F.when(F.col("m") == 2, F.col("v")))
            .cast("bigint")
            .alias("frequency"),
            F.max(F.when(F.col("m") == 3, F.col("v"))).alias("monetary"),
            F.max(F.when(F.col("m") == 1, F.col("b"))).alias("r_score"),
            F.max(F.when(F.col("m") == 2, F.col("b"))).alias("f_score"),
            F.max(F.when(F.col("m") == 3, F.col("b"))).alias("m_score"),
        )
        .select(
            "custkey", "recency_days", "frequency", "monetary",
            "r_score", "f_score", "m_score",
        )
    )


# ---------------------------------------------------------------------------
# q_events_transitions
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH steps AS (
  SELECT user_id, event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
"""


def transitions_single_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: (prev, next) counts and
    per-source-state probabilities. The per-state normalization window
    runs over the |types|^2-bounded pair relation, never the events.

    UNREGISTERED since r8: the registered ``q_events_transitions`` is the
    skew-safe :func:`transitions_two_phase` (the single global per-user
    lag window here concentrates a hot user's whole event history in one
    task). Kept as the reference twin for the pytest equality pin."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    pairs = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wp), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# q_cohort_ltv — quarterly-cohort lifetime value: customers cohorted by
# first-order quarter, revenue tracked by cohort age. The money-side
# complement of q_events_retention's activity matrix. The cumulative sum
# runs over the (cohorts x ages)-bounded rollup, never the fact table,
# and stays an UNROUNDED ordered-window fold over decimal-exact partials:
# round(x, 6) on a double above ~1e9 is not cross-engine stable (the
# scaled value crosses 2^53, where Spark and DuckDB round differently),
# and cumulative revenue crosses that magnitude at sf0.1+.
# ---------------------------------------------------------------------------

_LTV_ORACLE = f"""
WITH firsts AS (
  SELECT o_custkey AS custkey,
         date_trunc('quarter', min(o_orderdate)) AS cohort_q
  FROM orders GROUP BY o_custkey
), cohort_sizes AS (
  SELECT cohort_q, count(*) AS cohort_customers FROM firsts GROUP BY cohort_q
), aged AS (
  SELECT f.cohort_q,
         (date_part('year', o.o_orderdate) * 4 + date_part('quarter', o.o_orderdate))
         - (date_part('year', f.cohort_q) * 4 + date_part('quarter', f.cohort_q))
           AS age_q,
         o.o_totalprice
  FROM orders o JOIN firsts f ON f.custkey = o.o_custkey
), rolled AS (
  SELECT cohort_q, cast(age_q as int) AS age_q, {sql_dsum('o_totalprice', 'rev')}
  FROM aged GROUP BY cohort_q, cast(age_q as int)
)
SELECT r.cohort_q, r.age_q, s.cohort_customers, r.rev,
       sum(r.rev) OVER (PARTITION BY r.cohort_q ORDER BY r.age_q
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cum_rev
FROM rolled r JOIN cohort_sizes s ON s.cohort_q = r.cohort_q
"""


@register("q_cohort_ltv", oracle=_LTV_ORACLE)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # Lazy lineage cut (r13): firsts feeds the cohort-size aggregate AND
    # the aging join; without it the per-customer first-order groupBy over
    # orders executed twice. Customer-grain — small at any SF.
    firsts = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.date_trunc("quarter", F.min("o_orderdate")).alias("cohort_q")
    ).localCheckpoint(eager=False)
    sizes = firsts.groupBy("cohort_q").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    qidx = lambda c: F.year(c) * 4 + F.quarter(c)  # noqa: E731
    aged = orders.join(firsts, orders.o_custkey == firsts.custkey).select(
        "cohort_q",
        (qidx(F.col("o_orderdate")) - qidx(F.col("cohort_q"))).cast("int").alias("age_q"),
        "o_totalprice",
    )
    rolled = aged.groupBy("cohort_q", "age_q").agg(
        dsum(F.col("o_totalprice")).alias("rev")
    )
    w = (
        Window.partitionBy("cohort_q")
        .orderBy("age_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rolled.join(sizes, "cohort_q")
        .select(
            # timestamp, not date: Spark DateType surfaces as datetime.date
            # while DuckDB DATE becomes a midnight datetime64 — the value
            # hash sees different strings (same convention as sent_trends).
            F.col("cohort_q").cast("timestamp").alias("cohort_q"),
            "age_q",
            "cohort_customers",
            "rev",
            F.sum("rev").over(w).alias("cum_rev"),
        )
    )


# ---------------------------------------------------------------------------
# q_events_chi2 — in-database statistical testing: Pearson chi-square
# independence statistic for event_type x day-of-week (is behavior
# day-dependent?). The statistic sum((obs - exp)^2 / exp) is pure
# rational arithmetic — no transcendentals, so cross-engine parity is
# exact under 6dp rounding (the engine's standing no-log rule). The
# contingency table is |types| x 7 — the two margin relations and the
# final sum are all bounded; the only corpus-sized stage is one groupBy.
# p-value lookup is a client-side table concern (needs the incomplete
# gamma function), deliberately out of engine scope; dof ships with the
# statistic.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (
  SELECT event_type, cast(dayofweek(ts) as int) AS dow, count(*) AS o
  FROM events GROUP BY event_type, cast(dayofweek(ts) as int)
), margins AS (
  SELECT event_type, dow, o,
         sum(o) OVER (PARTITION BY event_type) AS row_tot,
         sum(o) OVER (PARTITION BY dow) AS col_tot,
         sum(o) OVER () AS n
  FROM obs
)
SELECT count(*) AS n_cells,
       cast((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) as bigint)
         AS dof,
       round(sum((o - row_tot * col_tot * 1.0 / n)
                 * (o - row_tot * col_tot * 1.0 / n)
                 / (row_tot * col_tot * 1.0 / n)), 6) AS chi2
FROM margins
"""


@register("q_events_chi2", oracle=_CHI2_ORACLE)
def q_events_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") * F.lit(1.0) / F.col("n")
    return margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("bigint").alias("dof"),
        F.round(F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp), 6).alias(
            "chi2"
        ),
    )


# ---------------------------------------------------------------------------
# q_forecast_backtest — forecast evaluation in-engine: a seasonal-naive
# day-of-week forecast trained on the first three weeks (Jan 1-21, which
# is exactly 3 occurrences of each weekday) and backtested on the fourth
# (Jan 22-28), reporting per-event-type MAE. This is the evaluation
# HARNESS a forecasting pipeline needs regardless of model — swap the
# fc expression for a model UDF and the spine/join/MAE plumbing stands.
# All arithmetic is rational (counts / 3, / 7) — exact cross-engine.
# The spine is |types| x 7 (a bounded broadcast cross join), the only
# corpus-sized stage is one daily-count groupBy.
# ---------------------------------------------------------------------------

_FC_TRAIN_END = "2024-01-22"
_FC_TEST_END = "2024-01-29"

_FC_ORACLE = f"""
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, dayofweek(ts) AS dow, count(*) AS n
  FROM events
  GROUP BY event_type, cast(ts as date), dayofweek(ts)
), spine AS (
  SELECT t.event_type, w.dow
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (SELECT DISTINCT dayofweek(ts) AS dow FROM events) w
), fc AS (
  SELECT s.event_type, s.dow,
         coalesce(sum(d.n), 0) / 3.0 AS predicted
  FROM spine s
  LEFT JOIN daily d ON d.event_type = s.event_type AND d.dow = s.dow
                    AND d.d < date '{_FC_TRAIN_END}'
  GROUP BY s.event_type, s.dow
), actual AS (
  SELECT s.event_type, s.dow, coalesce(sum(d.n), 0) AS n
  FROM spine s
  LEFT JOIN daily d ON d.event_type = s.event_type AND d.dow = s.dow
                    AND d.d >= date '{_FC_TRAIN_END}' AND d.d < date '{_FC_TEST_END}'
  GROUP BY s.event_type, s.dow
)
SELECT f.event_type,
       round(sum(abs(a.n - f.predicted)) / 7.0, 6) AS mae,
       cast(sum(a.n) as bigint) AS actual_total,
       round(sum(f.predicted), 6) AS forecast_total
FROM fc f JOIN actual a ON a.event_type = f.event_type AND a.dow = f.dow
GROUP BY f.event_type
"""


@register("q_forecast_backtest", oracle=_FC_ORACLE)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("d"),
        F.dayofweek("ts").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    # (lazy cut: daily feeds the type spine, the train leg and the test
    # leg — one events aggregation instead of three, r13)
    types = daily.select("event_type").distinct()
    dows = ev.select(F.dayofweek("ts").alias("dow")).distinct()
    spine = types.crossJoin(F.broadcast(dows))

    train = daily.where(F.col("d") < F.lit(_FC_TRAIN_END).cast("date"))
    fc = (
        spine.join(train, ["event_type", "dow"], "left")
        .groupBy("event_type", "dow")
        .agg((F.coalesce(F.sum("n"), F.lit(0)) / F.lit(3.0)).alias("predicted"))
    )
    test = daily.where(
        (F.col("d") >= F.lit(_FC_TRAIN_END).cast("date"))
        & (F.col("d") < F.lit(_FC_TEST_END).cast("date"))
    )
    actual = (
        spine.join(test, ["event_type", "dow"], "left")
        .groupBy("event_type", "dow")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n"))
    )
    return (
        fc.join(actual, ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.round(F.sum(F.abs(F.col("n") - F.col("predicted"))) / F.lit(7.0), 6).alias("mae"),
            F.sum("n").cast("bigint").alias("actual_total"),
            F.round(F.sum("predicted"), 6).alias("forecast_total"),
        )
    )


# ---------------------------------------------------------------------------
# ab_test_lift — experimentation analytics: deterministic md5 arm
# assignment over users (the same engine-portable hash device as
# split_train_holdout), per-arm conversion, lift, and the
# two-proportion z-statistic. "Converted" = the user's purchase count
# exceeds the global per-user average (crossed in as a broadcast scalar,
# the q11 device) — an interior rate at ANY scale factor, where a plain
# "ever purchased" flag saturates to 1.0 on this corpus and the pooled
# variance (and z denominator) degenerates to zero. sqrt is IEEE-754 CORRECTLY ROUNDED
# on both engines (unlike ln/exp, which the engine bans — see
# functions/stable.py), so the z-score is parity-exact under 6dp
# rounding; the p-value lookup (needs erf) stays a client-side table
# concern, like q_events_chi2's. One events scan → per-user flags →
# bounded two-row arm rollup.
# ---------------------------------------------------------------------------

_AB_ORACLE = f"""
WITH pc AS (
  SELECT user_id,
         {sql_md5_long('cast(user_id as varchar)')} % 2 AS arm,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
  FROM events
  GROUP BY user_id
), users AS (
  SELECT user_id, arm,
         CASE WHEN purchases > (SELECT sum(purchases) * 1.0 / count(*) FROM pc)
              THEN 1 ELSE 0 END AS converted
  FROM pc
), arms AS (
  SELECT arm, count(*) AS n, cast(sum(converted) as bigint) AS conv,
         round(sum(converted) * 1.0 / count(*), 6) AS rate
  FROM users GROUP BY arm
), wide AS (
  SELECT
    max(CASE WHEN arm = 0 THEN n END) AS n0,
    max(CASE WHEN arm = 0 THEN conv END) AS c0,
    max(CASE WHEN arm = 1 THEN n END) AS n1,
    max(CASE WHEN arm = 1 THEN conv END) AS c1
  FROM arms
)
SELECT n0, c0, round(c0 * 1.0 / n0, 6) AS rate0,
       n1, c1, round(c1 * 1.0 / n1, 6) AS rate1,
       round(c1 * 1.0 / n1 - c0 * 1.0 / n0, 6) AS lift,
       round((c1 * 1.0 / n1 - c0 * 1.0 / n0)
             / sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                    * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6) AS z_score
FROM wide
"""


@register("ab_test_lift", oracle=_AB_ORACLE)
def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    ev = table(spark, sf_dir, "events")
    # Lazy lineage cut (r13): pc feeds the global-average scalar AND the
    # arm rollup; without it the per-user groupBy over events ran twice.
    pc = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchases"
        )
    ).localCheckpoint(eager=False)
    avg_row = pc.agg(
        (F.sum("purchases") * F.lit(1.0) / F.count(F.lit(1))).alias("avg_p")
    )
    users = pc.crossJoin(F.broadcast(avg_row)).select(
        (md5_long(F.col("user_id").cast("string")) % 2).alias("arm"),
        F.when(F.col("purchases") > F.col("avg_p"), 1).otherwise(0).alias("converted"),
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    r0 = F.col("c0") * F.lit(1.0) / F.col("n0")
    r1 = F.col("c1") * F.lit(1.0) / F.col("n1")
    pool = (F.col("c0") + F.col("c1")) * F.lit(1.0) / (F.col("n0") + F.col("n1"))
    return wide.select(
        "n0",
        "c0",
        F.round(r0, 6).alias("rate0"),
        "n1",
        "c1",
        F.round(r1, 6).alias("rate1"),
        F.round(r1 - r0, 6).alias("lift"),
        F.round(
            (r1 - r0)
            / F.sqrt(
                pool * (F.lit(1) - pool) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
            ),
            6,
        ).alias("z_score"),
    )


@register("q_events_transitions", oracle=_TRANSITIONS_ORACLE)
def transitions_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGISTERED ``q_events_transitions`` since r8 (staged r7,
    pytest-pinned equal to :func:`transitions_single_window`, the
    previous registration): the per-user lag chain runs per (user_id,
    day-chunk), and boundary-crossing pairs are recovered at day-chunk
    grain — each chunk contributes (previous chunk's last event type →
    its first event type), computed with min_by/max_by over the unique
    (ts, event_id) order. Within-chunk pairs + boundary pairs are
    EXACTLY the global consecutive pairs (chunks are time-contiguous per
    user), pinned by pytest equality against the single-window twin. Same
    device as q_events_sessions' r7 split: a hot user's event volume
    divides across days; the merge window sees rows = active days.
    """
    ev = table(spark, sf_dir, "events")
    chunked = ev.withColumn("chunk", F.date_trunc("day", "ts"))
    w_local = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    within = chunked.select(
        F.lag("event_type").over(w_local).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    order_key = F.struct("ts", "event_id")
    bounds = chunked.groupBy("user_id", "chunk").agg(
        F.min_by("event_type", order_key).alias("first_type"),
        F.max_by("event_type", order_key).alias("last_type"),
    )
    w_merge = Window.partitionBy("user_id").orderBy("chunk")
    crossing = bounds.select(
        F.lag("last_type").over(w_merge).alias("prev_type"),
        F.col("first_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    pairs = (
        within.unionByName(crossing)
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wp), 6).alias("p"),
    )
