"""Second analytics suite: customer-value segmentation and behavioral
transition analysis — engine staples a reference user would reach for
next once trends/funnels/retention (analytics_ext) exist.

- ``q_customer_rfm`` — RFM (recency / frequency / monetary) customer
  segmentation: per-customer order recency vs the corpus reference date,
  order count, decimal-exact spend, each scored into exact quintiles.
  The quintiles use the same distributed TeraSort-rank machinery as
  ``q_order_deciles`` (analytics_ext.py) — range-repartition + in-
  partition row index + broadcast per-partition offsets — generalized to
  k buckets in :func:`_dist_ntile`, so there is NO single-partition
  global ntile window anywhere; the DuckDB oracle keeps the declarative
  ntile form, pinning the exact bucket semantics by hash.
- ``q_events_transitions`` — first-order event-type transition matrix
  (the Markov chain of user behavior): per-user lag window → (prev, next)
  pair counts → per-source-state transition probabilities. One keyed
  shuffle (user_id), one small groupBy; the output is |types|^2-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.stable import dsum, sql_dsum
from ..registry import register

# ---------------------------------------------------------------------------
# q_customer_rfm
# ---------------------------------------------------------------------------

_RFM_REF_DATE = "2001-08-01"  # corpus max(o_orderdate): recency anchor
_RFM_K = 5


def _dist_ntile(
    df: DataFrame, value_col: str, tie_col: str, k: int, out_col: str
) -> DataFrame:
    """Exact ntile(k) over (value_col, tie_col) without a one-partition
    global window: range-repartition on the sort key (Spark's distributed
    sort), in-partition row index from monotonically_increasing_id,
    broadcast per-partition count offsets, then the closed-form ntile
    bucket from the global rank. Returns (tie_col, out_col). Same device
    as q_order_deciles (analytics_ext.py), parameterized over k."""
    spark = df.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)
    parts = (
        df.select(value_col, tie_col)
        .repartitionByRange(n_part, value_col, tie_col)
        .sortWithinPartitions(value_col, tie_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        parts.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("c"), F.min("_mid").alias("base"))
        .select(
            F.col("_pid").alias("pid"),
            "base",
            F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
            F.sum("c").over(Window.partitionBy()).alias("n_total"),
        )
    )
    return (
        parts.join(F.broadcast(offs), parts["_pid"] == offs["pid"])
        .withColumn("rk", F.col("off") + (F.col("_mid") - F.col("base")) + 1)
        .withColumn(
            out_col,
            # ntile(k) semantics: the first (n%k) buckets get one extra row.
            F.expr(
                f"cast(CASE WHEN rk <= (n_total % {k}) * (n_total DIV {k} + 1)"
                f" THEN (rk - 1) DIV (n_total DIV {k} + 1) + 1"
                f" ELSE (n_total % {k}) + (rk - 1 - (n_total % {k}) * (n_total DIV {k} + 1))"
                f" DIV (n_total DIV {k}) + 1 END as int)"
            ),
        )
        .select(tie_col, out_col)
    )


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


@register("q_customer_rfm", oracle=_RFM_ORACLE)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM metrics + exact quintile scores (5 = best:
    most recent / most frequent / highest spend)."""
    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_REF_DATE).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    r = _dist_ntile(
        base.withColumn("_neg_rec", -F.col("recency_days")),
        "_neg_rec",
        "custkey",
        _RFM_K,
        "r_score",
    )
    f = _dist_ntile(base, "frequency", "custkey", _RFM_K, "f_score")
    m = _dist_ntile(base, "monetary", "custkey", _RFM_K, "m_score")
    return base.join(r, "custkey").join(f, "custkey").join(m, "custkey").select(
        "custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
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


@register("q_events_transitions", oracle=_TRANSITIONS_ORACLE)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: (prev, next) counts and
    per-source-state probabilities. The per-state normalization window
    runs over the |types|^2-bounded pair relation, never the events."""
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
