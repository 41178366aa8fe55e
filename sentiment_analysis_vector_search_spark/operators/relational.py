"""Core relational analytics suite (TPC-H-style) over the star schema.

Demonstrates the engine's scan → filter → join → aggregate → window paths
with cluster-scale plan shapes: dimension joins are broadcast, aggregates
are partial-agg friendly, filters/projections push into the parquet scan,
and top-k uses deterministic tie-breaks so results are reproducible across
arbitrary partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import fan_out, table
from ..functions.stable import davg, dsum, sql_davg, sql_dsum
from ..registry import register

# ---------------------------------------------------------------------------
# q1: pricing summary — full-scan groupBy aggregate (TPC-H Q1 shape).
# Scale: partial aggregation map-side; only 6 groups so the shuffle is tiny
# regardless of input size. Filter + 7-column projection push into the scan.
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       count(*) as count_order
FROM lineitem
WHERE l_shipdate <= timestamp '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out over the NARROW projection (r13): the decimal partial
    # aggregation is the query's real cost and a 1-row-group scan runs it
    # on one core. r3 rejected fan_out because it repartitioned the FULL
    # row (a data-sized wide shuffle); filtering + projecting to the six
    # aggregated columns first makes the spread shuffle narrow — measured
    # isolated at sf0.1: 1.62 s -> 0.89 s median. fan_out stays a NO-OP
    # on real multi-split layouts, where the partial agg alone is right.
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    # averages derive from the decimal-exact sums (identical values to a
    # separate davg, at half the decimal-aggregation work per row).
    narrow = li.where(
        F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    return (
        fan_out(spark, narrow)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.round(dsum(F.col("l_quantity")) / n, 6).alias("avg_qty"),
            F.round(dsum(F.col("l_extendedprice")) / n, 6).alias("avg_price"),
            F.round(dsum(F.col("l_discount")) / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "avg_disc",
            "count_order",
        )
    )


# ---------------------------------------------------------------------------
# q3: shipping priority — selective join + top-k with deterministic ties.
# Scale: customer is broadcast (small dim); orders⋈lineitem shuffles on
# o_orderkey/l_orderkey only after both sides are filtered.
# ---------------------------------------------------------------------------

_Q3_DATE = "1997-03-15"

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < timestamp '{_Q3_DATE}'
  AND l_shipdate > timestamp '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..stats import (
        estimated_equality_rows,
        hint_broadcast_if_small,
        table_stats,
    )

    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    # Stats-informed hint (r6 verdict #5): the customer side is only
    # broadcast-safe while |customers| / ndv(mktsegment) rows fit executor
    # memory — true at every TPC-H SF today, but a hard-coded broadcast()
    # is what OOMs when a "dimension" grows. The gate reads the memoized
    # ANALYZE TABLE stats (one scan per session) and estimates the
    # equality-filter survivors CBO-style; past the threshold the join
    # degrades to Spark's shuffle strategies instead of failing.
    cst = table_stats(spark, sf_dir, "customer")
    cust_hinted = hint_broadcast_if_small(
        cust, estimated_equality_rows(cst, "c_mktsegment")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_hinted, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5: local supplier volume — 6-way join; all dims broadcast, single
# fact-fact shuffle on orderkey.
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= timestamp '1996-01-01'
  AND o_orderdate < timestamp '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier", oracle=_Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..stats import dim_hint

    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    # Stats-informed dim sides (r7 verdict #6): customer and supplier are
    # the two dims that GROW with SF — a hard-coded broadcast() OOMs at
    # the SF where they outgrow executor memory. The gate reads memoized
    # ANALYZE stats; past the byte threshold the join degrades to shuffle
    # (+AQE skew split). nation/region stay unconditionally broadcast:
    # constant-cardinality tables by TPC-H construction.
    cust = dim_hint(
        spark, sf_dir,
        table(spark, sf_dir, "customer"), "customer", "orders", "o_custkey",
    )
    supp = dim_hint(
        spark, sf_dir,
        table(spark, sf_dir, "supplier"), "supplier", "lineitem", "l_suppkey",
    )
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# top customers per market segment — agg + window rank (deterministic ties).
# Scale: window partitioned by segment over the *aggregated* (small) relation.
# ---------------------------------------------------------------------------

_TOPCUST_ORACLE = f"""
WITH totals AS (
  SELECT c_mktsegment, c_custkey, c_name,
         {sql_dsum('o_totalprice', 'total_spent')}
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey, c_name
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY c_mktsegment ORDER BY total_spent DESC, c_custkey
  ) as rk
  FROM totals
)
SELECT c_mktsegment, c_custkey, c_name, total_spent, rk
FROM ranked WHERE rk <= 3
"""


@register("q_top_customers_window", oracle=_TOPCUST_ORACLE)
def q_top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    totals = (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(dsum(F.col("o_totalprice")).alias("total_spent"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spent"), F.asc("c_custkey")
    )
    return totals.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)


# ---------------------------------------------------------------------------
# market share of one brand per ship-year — conditional aggregation.
# ---------------------------------------------------------------------------

_MKTSHARE_ORACLE = f"""
SELECT cast(year(l_shipdate) as int) as ship_year,
       {sql_dsum("case when p_brand = 'Brand#12' then l_extendedprice * (1 - l_discount) else 0.0 end", 'brand_revenue')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')},
       round(
         cast(sum(cast((case when p_brand = 'Brand#12' then l_extendedprice * (1 - l_discount) else 0.0 end) as decimal(30,10))) as double)
         / cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(30,10))) as double), 6) as brand_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate)
"""


@register("q_market_share", oracle=_MKTSHARE_ORACLE)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    brand_rev = F.when(F.col("p_brand") == "Brand#12", rev).otherwise(F.lit(0.0))
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            dsum(brand_rev).alias("brand_revenue"),
            dsum(rev).alias("total_revenue"),
            F.round(dsum(brand_rev) / dsum(rev), 6).alias("brand_share"),
        )
    )


# ---------------------------------------------------------------------------
# events: daily windowed aggregate — date_trunc buckets, conditional counts.
# Scale: pre-aggregates by (day, type) before any wide operation; at 100 TB
# this is a classic map-side-combinable rollup.
# ---------------------------------------------------------------------------

_EVWINDOW_ORACLE = f"""
SELECT date_trunc('day', ts) as day,
       event_type,
       count(*) as n_events,
       count(distinct user_id) as n_users,
       {sql_dsum('value', 'total_value')},
       {sql_davg('value', 'avg_value')}
FROM events
GROUP BY date_trunc('day', ts), event_type
"""


@register("q_events_window", oracle=_EVWINDOW_ORACLE)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(F.col("value")).alias("total_value"),
            davg(F.col("value")).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# events: sessionization — lag-gap session boundaries (30 min), per-user
# session stats. Reference parity: sessionization is the per-date trend
# backbone (Context_analyzer_RoBERTa_fun.py:687).
#
# Skew-safe two-phase shape (r6 verdict #4): a single
# Window.partitionBy(user_id) serializes a hot user's ENTIRE event
# history through one task — the one remaining per-key-window scale
# limit SCALING.md only documented. Phase 1 runs the lag-gap window per
# (user_id, day-chunk), so a hot key's work splits across its days;
# phase 2 merges at day-chunk grain (per-user row count = #active days,
# bounded by the calendar, not by event volume): a chunk's first session
# is un-counted when the gap from the previous chunk's last event is
# within the session gap. Algebra: global n_sessions = sum of per-chunk
# session starts - (# chunk boundaries whose crossing gap <= threshold).
# Correct for sessions spanning ANY number of chunk boundaries, because
# the boundary-adjacent events are exactly the previous chunk's last and
# the current chunk's first (chunks are time-contiguous per user).
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSIONS_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > {_SESSION_GAP_MIN * 60} * 1000000
              THEN 1 ELSE 0 END as new_session
  FROM events
)
SELECT user_id,
       cast(sum(new_session) as bigint) as n_sessions,
       count(*) as n_events,
       round(count(*) * 1.0 / sum(new_session), 6) as avg_events_per_session
FROM marked
GROUP BY user_id
"""


@register("q_events_sessions", oracle=_SESSIONS_ORACLE)
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    gap_us_limit = _SESSION_GAP_MIN * 60 * 1_000_000
    # Phase 1: lag-gap window per (user, day-chunk) — the hot-key split.
    # Chunk assignment is a pure function of ts, so within-chunk
    # (ts, event_id) order agrees with the global per-user order.
    chunked = ev.withColumn("chunk", F.date_trunc("day", "ts"))
    w_local = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_local)
    local_start = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > gap_us_limit),
        F.lit(1),
    ).otherwise(F.lit(0))
    # The groupBy keys equal the window partition keys: Catalyst reuses the
    # phase-1 exchange, so this adds no shuffle.
    per_chunk = (
        chunked.withColumn("local_start", local_start)
        .groupBy("user_id", "chunk")
        .agg(
            F.sum("local_start").alias("local_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    # Phase 2: boundary merge over day-chunk-grain rows (per-user cardinality
    # = active days — bounded, so this window cannot concentrate event-grain
    # volume on one task even for the hottest key).
    w_merge = Window.partitionBy("user_id").orderBy("chunk")
    prev_last = F.lag("last_ts").over(w_merge)
    merged_boundary = F.when(
        prev_last.isNotNull()
        & (
            (F.unix_micros(F.col("first_ts")) - F.unix_micros(prev_last))
            <= gap_us_limit
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        per_chunk.withColumn("merged", merged_boundary)
        .groupBy("user_id")
        .agg(
            (F.sum("local_sessions") - F.sum("merged"))
            .cast("bigint")
            .alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(
                F.sum("n_events")
                * F.lit(1.0)
                / (F.sum("local_sessions") - F.sum("merged")),
                6,
            ).alias("avg_events_per_session"),
        )
    )


# ---------------------------------------------------------------------------
# events: JSON property extraction (regex-based: engine-portable, no UDF) +
# aggregate. At scale this stays entirely in whole-stage codegen.
# ---------------------------------------------------------------------------

_K_EXPR = "cast(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) as int)"

_EVJSON_ORACLE = f"""
SELECT event_type,
       {sql_dsum(_K_EXPR, 'sum_k')},
       {sql_davg(_K_EXPR, 'avg_k')},
       count(*) as n
FROM events
GROUP BY event_type
"""


@register("q_events_json", oracle=_EVJSON_ORACLE)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    return ev.groupBy("event_type").agg(
        dsum(k).alias("sum_k"),
        davg(k).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q7: volume shipping between two nations (TPC-H Q7 shape) — the
# dual-direction join: lineitem brings the supplier nation, its order
# brings the customer nation, and only the two (A,B)/(B,A) pairs survive.
# Scale: both nation-annotated dims (supplier⋈nation, customer⋈nation) are
# broadcast; the fact tables join once on orderkey; the pair filter prunes
# before the final tiny aggregate.
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         cast(year(l_shipdate) as int) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
     OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_trade", oracle=_Q7_ORACLE)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # dims annotated with their nation BEFORE touching facts: supplier and
    # customer stay broadcast-sized, and the only fact-fact shuffle is
    # lineitem⋈orders on the order key.
    sup_n = broadcast(
        sup.join(broadcast(n1), sup.s_nationkey == n1.n1_key).select(
            "s_suppkey", "supp_nation"
        )
    )
    cust_n = broadcast(
        cust.join(broadcast(n2), cust.c_nationkey == n2.n2_key).select(
            "c_custkey", "cust_nation"
        )
    )
    pair = (
        (F.col("supp_nation") == _Q7_NATION_A) & (F.col("cust_nation") == _Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == _Q7_NATION_B) & (F.col("cust_nation") == _Q7_NATION_A)
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(sup_n, li.l_suppkey == sup_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q13: customer order-count distribution (TPC-H Q13 shape) — LEFT OUTER
# join so zero-order customers count, then a double aggregation: orders
# per customer, customers per order-count. Scale: the outer join shuffles
# on custkey once; both aggregates are partial-agg friendly, and the final
# histogram relation is at most |distinct order counts| rows.
# ---------------------------------------------------------------------------

_Q13_EXCLUDED_PRIORITY = "1-URGENT"  # stand-in for Q13's comment filter

_Q13_ORACLE = f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '{_Q13_EXCLUDED_PRIORITY}'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_count_dist", oracle=_Q13_ORACLE)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
