"""Graph analytics over relationally-derived edge lists.

``q_nation_pagerank`` ranks nations by trade-flow centrality: the edge
list is the supplier-nation → customer-nation revenue graph (the same
join spine as TPC-H Q7, un-filtered), out-normalized per source nation,
then run through 3 damped power iterations (functions/graph.pagerank).
The interesting part at 100 TB is the EDGE DERIVATION — the fact-fact
lineitem⋈orders shuffle with stats-gated dim sides — because the graph
itself aggregates to #nations² rows; on a billion-node graph the same
pagerank() plan holds with the rank vector shuffling instead of
broadcasting (it is a plain equi-join either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..catalog import table
from ..functions.graph import pagerank, sql_pagerank_ctes
from ..functions.stable import sql_dec2double, sql_vardec
from ..registry import register

_PR_ITERS = 3

_SUM_TERM = sql_dec2double(f"sum({sql_vardec('e.w * {prev}.r')})")

_PR_ORACLE = f"""
WITH rev AS (
  SELECT sn.n_name AS src, cn.n_name AS dst,
         sum({sql_vardec('l_extendedprice * (1 - l_discount)')}) AS rev_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  GROUP BY sn.n_name, cn.n_name
), outm AS (
  SELECT src, sum(rev_dec) AS out_dec FROM rev GROUP BY src
), edges AS (
  SELECT rev.src, rev.dst,
         {sql_dec2double('rev.rev_dec')} / {sql_dec2double('outm.out_dec')} AS w
  FROM rev JOIN outm ON rev.src = outm.src
), nodes AS (
  SELECT n_name AS node FROM nation
), nn AS (
  SELECT cast(count(*) as double) AS n FROM nation
),
{sql_pagerank_ctes(_PR_ITERS, _SUM_TERM)}
SELECT node AS n_name, r AS pagerank,
       row_number() OVER (ORDER BY r DESC, node) AS rk
FROM r{_PR_ITERS}
"""


@register("q_nation_pagerank", oracle=_PR_ORACLE)
def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-flow PageRank over the supplier→customer nation graph.

    Scale shape: one lineitem⋈orders fact shuffle builds the weighted
    edge list (dims stats-gated via dim_hint, nation unconditionally
    broadcast); edge weights out-normalize through EXACT decimal sums
    (sum of per-row 10dp decimals, then one decimal-decimal division
    bridged to double — order-independent at any partitioning); the
    3 power iterations run on the aggregated #nations²-bounded edge
    relation behind a lineage cut, so the fact join executes once.
    Raw double ranks — no final round, the driver canonicalizes."""
    from ..stats import dim_hint

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    sup = dim_hint(
        spark, sf_dir,
        table(spark, sf_dir, "supplier"), "supplier", "lineitem", "l_suppkey",
    )
    cust = dim_hint(
        spark, sf_dir,
        table(spark, sf_dir, "customer"), "customer", "orders", "o_custkey",
    )
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("src"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("dst"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("src", "dst")
        .agg(F.sum(vol).alias("rev_dec"))
        .localCheckpoint(eager=False)  # two consumers (outm + edges) of the
        # #nations²-bounded aggregate: the fact join must execute once
    )
    outm = rev.groupBy("src").agg(F.sum("rev_dec").alias("out_dec"))
    edges = rev.join(outm, "src").select(
        "src",
        "dst",
        (F.col("rev_dec").cast("double") / F.col("out_dec").cast("double")).alias("w"),
    )
    nodes = nation.select(F.col("n_name").alias("node"))
    ranks = pagerank(nodes, edges, iters=_PR_ITERS)
    w = Window.orderBy(F.desc("pagerank"), F.asc("n_name"))  # #nations rows only
    return (
        ranks.select(F.col("node").alias("n_name"), F.col("r").alias("pagerank"))
        .withColumn("rk", F.row_number().over(w))
    )
