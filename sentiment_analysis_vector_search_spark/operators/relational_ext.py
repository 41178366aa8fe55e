"""Extended relational suite: selective scans, semi/anti joins, having
filters, multi-predicate pushdown, and rollup aggregates (TPC-H Q6/Q10/
Q14/Q18/Q19/Q22 shapes adapted to the available schema).

Scale notes: every query here either (a) filters *before* its joins so the
shuffled volume is the selective subset, (b) broadcasts the dimension side,
or (c) aggregates to a small relation before any window/sort. Rollup uses
partial-agg-friendly sums so the map-side combine handles the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import table
from ..functions.stable import (
    davg,
    dsum,
    sql_davg,
    sql_dec2double,
    sql_dsum,
    sql_vardec,
)
from ..registry import register

# ---------------------------------------------------------------------------
# q6: forecasting revenue change — pure selective scan, no join (TPC-H Q6).
# All three predicates + 2-column projection push into the parquet scan;
# at 100 TB this reads only the row groups whose min/max stats overlap.
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
       count(*) as n_items
FROM lineitem
WHERE l_shipdate >= timestamp '1996-01-01'
  AND l_shipdate < timestamp '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q10: returned-item reporting — selective fact join + broadcast dims +
# top-k by revenue (TPC-H Q10). Orders are date-filtered and lineitems
# returnflag-filtered *before* the orderkey shuffle.
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= timestamp '1996-10-01'
  AND o_orderdate < timestamp '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q14: promotion effect — broadcast part join, conditional-sum ratio
# (TPC-H Q14). Single month of lineitem; part is the broadcast side.
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT round(
         100.0 * cast(sum(cast((case when p_type = 'PROMO' then l_extendedprice * (1 - l_discount) else 0.0 end) as decimal(30,10))) as double)
         / cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(30,10))) as double), 6) as promo_revenue_pct,
       count(*) as n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= timestamp '1996-09-01'
  AND l_shipdate < timestamp '1996-10-01'
"""


@register("q14_promo_effect", oracle=_Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * dsum(promo_rev) / dsum(rev), 6).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q18: large-volume customers — groupBy-having as a self-semi-join
# (TPC-H Q18). The having-filter aggregates lineitem down to qualifying
# orderkeys first (tiny), which then drives a broadcast semi-join.
# ---------------------------------------------------------------------------

_Q18_QTY = 250

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(cast(l_quantity as decimal(30,10))) > {_Q18_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum('l_quantity', 'total_qty')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_orders", oracle=_Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..stats import dim_hint

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    # Stats-informed customer side (r7 verdict #6): broadcast only while
    # ANALYZE says the table fits; past the threshold the join degrades
    # to shuffle (+AQE). The `big` semi-join side stays unconditionally
    # broadcast — it is a >threshold aggregate, tiny by construction.
    cust = dim_hint(
        spark, sf_dir,
        table(spark, sf_dir, "customer"), "customer", "orders", "o_custkey",
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,10)")).alias("qty"))
        .where(F.col("qty") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(broadcast(big.withColumnRenamed("l_orderkey", "big_orderkey")),
                F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19: discounted revenue — disjunctive multi-predicate join (TPC-H Q19).
# The OR-of-ANDs predicate is applied on the *joined* row but every
# single-table conjunct (brand list, quantity range, size range) still
# pushes to the scans; part is broadcast.
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       count(*) as n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_disjunctive_filter", oracle=_Q19_ORACLE)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q22: dormant high-balance customers — anti-join (TPC-H Q22 shape).
# The NOT EXISTS side is the big orders table, expressed as a left_anti
# join on custkey; the scalar avg is computed once and broadcast as a
# cross-joined literal row (no driver collect).
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT {sql_davg('c_acctbal', 'ab')} FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       count(*) as n_customers,
       {sql_dsum('c_acctbal', 'total_bal')}
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= timestamp '1999-01-01')
GROUP BY c_mktsegment
"""


@register("q22_dormant_customers", oracle=_Q22_ORACLE)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal")).alias("ab"))
    )
    return (
        cust.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# rollup: revenue by region → nation → ship-year with subtotal rows.
# Partial-agg composable sums mean the rollup fan-out (3 grouping sets)
# still combines map-side; dims all broadcast.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT coalesce(r_name, 'ALL') as region,
       coalesce(n_name, 'ALL') as nation,
       coalesce(cast(cast(year(o_orderdate) as int) as varchar), 'ALL') as order_year,
       {sql_dsum('o_totalprice', 'revenue')},
       count(*) as n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name, cast(year(o_orderdate) as int))
"""


@register("q_revenue_rollup", oracle=_ROLLUP_ORACLE)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-level formulation (same device as q_cube_revenue,
    # relational_tpch2.py): Spark compiles ROLLUP as Expand-then-aggregate,
    # replicating every FACT row once per grouping set (4x the join output
    # feeding the partial aggregate — a real cost at 100 TB). Aggregate the
    # base (region, nation, year) groups first — a few hundred rows at any
    # scale — and roll up over THAT relation; the exact decimal partial
    # sums re-combine, so the result is value-identical to the raw ROLLUP
    # the oracle runs.
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    base = joined.groupBy(
        "r_name", "n_name", F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("rev_d"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.rollup("r_name", "n_name", "yr")
        .agg(
            F.sum("rev_d").cast("double").alias("revenue"),
            F.sum("n").alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("order_year"),
            "revenue",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# distinct supplier breadth per part (Q16 shape without partsupp): how many
# distinct suppliers ship each part brand/type, from the fact table itself.
# countDistinct shuffles on (brand, type) after map-side partial distinct.
# ---------------------------------------------------------------------------

_SUPPCNT_ORACLE = """
SELECT p_brand, p_type,
       count(distinct l_suppkey) as supplier_cnt,
       count(*) as n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 10
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 50
"""


@register("q16_supplier_breadth", oracle=_SUPPCNT_ORACLE)
def q16_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(F.col("p_size") >= 10)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# running revenue: cumulative window over date-preaggregated rows.
# The window runs over ~|segment|×|days| pre-aggregated rows, not raw
# orders — date-bucket first, then window, the 100 TB-safe ordering.
# ---------------------------------------------------------------------------

_RUNTOTAL_ORACLE = f"""
WITH daily AS (
  SELECT c_mktsegment, date_trunc('day', o_orderdate) AS day,
         {sql_dsum('o_totalprice', 'day_revenue')},
         count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, date_trunc('day', o_orderdate)
)
SELECT c_mktsegment, day, day_revenue, n_orders,
       {sql_dec2double(
           f"sum({sql_vardec('day_revenue')}) OVER ("
           " PARTITION BY c_mktsegment ORDER BY day"
           " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
       )} AS cum_revenue
FROM daily
"""


@register("q_running_revenue", oracle=_RUNTOTAL_ORACLE)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    daily = (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            dsum(F.col("o_totalprice")).alias("day_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Cumulative sum stays DECIMAL(30,10) inside the window — summing the
    # re-rounded doubles diverges from the oracle on HALF_UP boundary digits
    # (segment-tree accumulation order differs between engines). The oracle
    # mirrors Spark's cast semantics via the varchar bridge (stable.py).
    # NO round() after the double cast: the exact decimal→double cast is
    # already identical on both engines, while round(d, 6) at cumulative
    # magnitudes (~4e9 at sf0.1 → 4e15 six-dp steps, at the 2^53 edge)
    # lands Spark's BigDecimal rounding and DuckDB's scaled-multiply
    # rounding on ADJACENT doubles — a hash mismatch that only appears
    # at scale.
    return daily.withColumn(
        "cum_revenue",
        F.sum(F.col("day_revenue").cast("decimal(30,10)")).over(w).cast("double"),
    )


# ---------------------------------------------------------------------------
# q4: order-priority checking (TPC-H Q4 shape adapted: the commit/receipt
# columns don't exist, so the EXISTS condition is "some lineitem shipped
# after the order date") — a *non-equi* correlated EXISTS, planned as a
# left-semi join on the equi key with the range predicate in the join
# condition.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= timestamp '1997-01-01'
  AND o_orderdate < timestamp '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_priority_exists", oracle=_Q4_ORACLE)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q17: small-quantity-order revenue (TPC-H Q17): correlated scalar
# subquery (per-part average quantity) decorrelated into a groupBy +
# broadcast join — the manual decorrelation every optimizer performs,
# written explicitly so the shuffle structure is visible.
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
WITH part_avg AS (
  SELECT l_partkey AS pk, {sql_davg('l_quantity', 'avg_qty')}
  FROM lineitem GROUP BY l_partkey
)
SELECT round(cast(sum(cast(l_extendedprice as decimal(30,10))) as double) / 7.0, 6) AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#12' AND l_quantity < 0.5 * avg_qty
"""


@register("q17_small_quantity", oracle=_Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, F.col("pk") == li.l_partkey)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q_sql_text_api — the SQL-text entry path: views registered in the
# session catalog, the query given as ANSI SQL to spark.sql(). Same
# Catalyst plan as the DataFrame API — this pins that a SQL-speaking user
# of the engine gets identical results and plan shapes.
# ---------------------------------------------------------------------------

_SQLAPI_QUERY = f"""
SELECT n_name,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice', 'revenue')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 10
"""


@register("q_sql_text_api", oracle=_SQLAPI_QUERY)
def q_sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQLAPI_QUERY)


# ---------------------------------------------------------------------------
# q_revenue_moving_avg — 7-day moving window via a RANGE frame (value-based
# window, covers calendar gaps correctly unlike a ROWS frame). Runs over
# date-preaggregated rows; partitioned by segment.
# ---------------------------------------------------------------------------

_MOVAVG_ORACLE = f"""
WITH daily AS (
  SELECT c_mktsegment, date_trunc('day', o_orderdate) AS day,
         {sql_dsum('o_totalprice', 'day_revenue')}
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, day, day_revenue,
       round({sql_dec2double(f"sum({sql_vardec('day_revenue')}) OVER w")}
             / count(*) OVER w, 6) AS ma7,
       count(*) OVER w AS n_days_in_window
FROM daily
WINDOW w AS (
  PARTITION BY c_mktsegment ORDER BY day
  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
)
"""


@register("q_revenue_moving_avg", oracle=_MOVAVG_ORACLE)
def q_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    daily = (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice")).alias("day_revenue"))
    )
    # RANGE frame over epoch-seconds: value-based, so calendar gaps shrink
    # the window exactly as the SQL INTERVAL frame does.
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.unix_timestamp("day"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "c_mktsegment",
        "day",
        "day_revenue",
        F.round(
            F.sum(F.col("day_revenue").cast("decimal(30,10)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("ma7"),
        F.count(F.lit(1)).over(w).alias("n_days_in_window"),
    )
