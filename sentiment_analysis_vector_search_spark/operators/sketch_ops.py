"""Sketch-backed analytics as graded queries.

``q_events_kmv_distinct`` runs the K-Minimum-Values cardinality sketch
(Bar-Yossef et al.; the mergeable estimator behind stats.column_kmv's
incremental ANALYZE) as a first-class query, next to the exact answer:
per event type, the KMV estimate of distinct users, the exact distinct
count, and the relative error — the sketch-calibration audit a table
owner runs before trusting sketch-backed planning stats.

Unlike approx_count_distinct (HLL++, whose binary registers are not
reproducible across engines), KMV over the md5 hash family is fully
DETERMINISTIC: the k smallest hash values of a set are a pure function
of the set, so the DuckDB oracle reproduces the estimate bit-for-bit —
a sketch you can hash-verify, merge across partitions (keep the k
smallest of the union), and re-derive after any repartition.

Scale shape: one distinct-shuffle at (event_type, user_id) grain, then
a two-phase salted bottom-K so no window ever sees a data-sized
partition (the emb_outlier_scores device); the estimate arithmetic is
per-group over k rows. The exact count rides the same distinct
relation — at 100 TB you would DROP the exact column (it is the
expensive part; the sketch is the cheap one) — kept here because the
calibration audit is the point of the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions.hashing import md5_long, sql_md5_long
from ..registry import register

_KMV_K = 64
_H_SPACE = float(1 << 60)  # md5_long is 60 bits: u = h / 2^60 in [0, 1)
_KMV_SALTS = 8

_KMV_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, user_id,
         {sql_md5_long("'kmv:' || cast(user_id as varchar)")} / {_H_SPACE} AS u
  FROM events
), ranked AS (
  SELECT event_type, u,
         row_number() OVER (PARTITION BY event_type ORDER BY u, user_id) AS rk
  FROM hashed
), sk AS (
  SELECT event_type, count(*) AS n_seen, max(u) AS kth
  FROM ranked WHERE rk <= {_KMV_K} GROUP BY event_type
), ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM events
  GROUP BY event_type
)
SELECT ex.event_type, ex.exact_distinct,
       CASE WHEN sk.n_seen < {_KMV_K} THEN cast(sk.n_seen as bigint)
            ELSE cast(floor(({_KMV_K} - 1) / sk.kth) as bigint) END AS kmv_estimate,
       round(abs(CASE WHEN sk.n_seen < {_KMV_K} THEN cast(sk.n_seen as double)
                      ELSE floor(({_KMV_K} - 1) / sk.kth) END
                 - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_error
FROM ex JOIN sk ON ex.event_type = sk.event_type
"""


@register("q_events_kmv_distinct", oracle=_KMV_ORACLE)
def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV distinct-user estimate vs the exact count.

    Both engines hash identically (md5 → 60-bit → [0,1) by one exact
    division), select the identical k-minimum set, and compute the
    identical estimate floor((k-1)/u_(k)) — deterministic end to end."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = ev.distinct().select(
        "event_type",
        "user_id",
        (
            md5_long(F.concat(F.lit("kmv:"), F.col("user_id").cast("string")))
            / F.lit(_H_SPACE)
        ).alias("u"),
    )
    # two-phase bottom-K: per-(type, salt) candidates, then the final
    # rank over |salts| x K rows per type
    w1 = Window.partitionBy(
        "event_type", F.pmod(F.col("user_id"), F.lit(_KMV_SALTS))
    ).orderBy(F.asc("u"), F.asc("user_id"))
    cand = hashed.withColumn("rn", F.row_number().over(w1)).where(
        F.col("rn") <= _KMV_K
    )
    w2 = Window.partitionBy("event_type").orderBy(F.asc("u"), F.asc("user_id"))
    sk = (
        cand.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_seen"), F.max("u").alias("kth"))
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_seen") < _KMV_K, F.col("n_seen").cast("double")
    ).otherwise(F.floor(F.lit(float(_KMV_K - 1)) / F.col("kth")).cast("double"))
    return ex.join(sk, "event_type").select(
        "event_type",
        "exact_distinct",
        est.cast("bigint").alias("kmv_estimate"),
        F.round(
            F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# q_value_quantile_sketch — uniform bottom-k-hash sample quantiles vs the
# exact answer: the KMV device pointed at QUANTILES. A deterministic
# uniform sample of each group is the k rows with the smallest md5(event
# id) — a pure function of the row set (identical across engines,
# partitionings, and retries; mergeable: the bottom-k of a union is the
# bottom-k of the parts' bottom-k's) — and sample quantiles converge at
# O(1/sqrt(k)). Unlike percentile_approx (whose KLL-ish sketch is not
# reproducible across engines), this sample quantile hash-verifies.
#
# Scale shape: the sample selection is the KMV two-phase salted bottom-K
# (no data-sized window); exact percentiles ride a percentile() aggregate
# per group. The exact columns are the expensive leg — at 100 TB keep the
# sketch, drop the exact (they are here because calibration is the point).
# ---------------------------------------------------------------------------

_QS_K = 256
_QS_SALTS = 8

_QS_ORACLE = f"""
WITH hashed AS (
  SELECT event_type, value,
         {sql_md5_long("'qs:' || cast(event_id as varchar)")} AS h, event_id
  FROM events
), ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rk
  FROM hashed
), samp AS (
  SELECT event_type,
         count(*) AS n_sample,
         round(cast(quantile_cont(value, 0.5) as double), 6) AS approx_p50,
         round(cast(quantile_cont(value, 0.95) as double), 6) AS approx_p95
  FROM ranked WHERE rk <= {_QS_K} GROUP BY event_type
), ex AS (
  SELECT event_type, count(*) AS n_rows,
         round(cast(quantile_cont(value, 0.5) as double), 6) AS exact_p50,
         round(cast(quantile_cont(value, 0.95) as double), 6) AS exact_p95
  FROM events GROUP BY event_type
)
SELECT ex.event_type, ex.n_rows, samp.n_sample,
       ex.exact_p50, samp.approx_p50,
       round(abs(samp.approx_p50 - ex.exact_p50), 6) AS err_p50,
       ex.exact_p95, samp.approx_p95,
       round(abs(samp.approx_p95 - ex.exact_p95), 6) AS err_p95
FROM ex JOIN samp ON ex.event_type = samp.event_type
"""


@register("q_value_quantile_sketch", oracle=_QS_ORACLE)
def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample quantiles from a deterministic bottom-k-hash row sample vs
    exact percentiles, per event type — the quantile-calibration audit.
    Sample selection is the two-phase salted bottom-K; both engines pick
    the identical sample and interpolate identically."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    hashed = ev.withColumn(
        "h", md5_long(F.concat(F.lit("qs:"), F.col("event_id").cast("string")))
    )
    w1 = Window.partitionBy(
        "event_type", F.pmod(F.col("event_id"), F.lit(_QS_SALTS))
    ).orderBy(F.asc("h"), F.asc("event_id"))
    cand = hashed.withColumn("rn", F.row_number().over(w1)).where(
        F.col("rn") <= _QS_K
    )
    w2 = Window.partitionBy("event_type").orderBy(F.asc("h"), F.asc("event_id"))
    samp = (
        cand.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= _QS_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("approx_p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("approx_p95"),
        )
    )
    ex = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("exact_p95"),
    )
    return ex.join(samp, "event_type").select(
        "event_type",
        "n_rows",
        "n_sample",
        "exact_p50",
        "approx_p50",
        F.round(F.abs(F.col("approx_p50") - F.col("exact_p50")), 6).alias(
            "err_p50"
        ),
        "exact_p95",
        "approx_p95",
        F.round(F.abs(F.col("approx_p95") - F.col("exact_p95")), 6).alias(
            "err_p95"
        ),
    )


# ---------------------------------------------------------------------------
# q_events_cms_freq — Count-Min frequency sketch with an exact audit,
# completing the mergeable-sketch family (KMV ndv, Misra-Gries heavy
# hitters, bottom-k row sample): CMS answers "how often did key k
# occur" from d x w counters built in ONE map-side-combinable pass.
# The sketch is deterministic (one md5-derived hash per depth),
# mergeable (counters add), and every estimate upper-bounds the truth —
# cms_n >= exact_n always, overcount bounded by ~N/w per depth with
# exponentially small tail over d depths (Cormode-Muthukrishnan '05).
#
# Scale shape: the sketch relation is d x w = 2,048 rows regardless of
# input size (the explode is map-side, the groupBy partial-combines to
# <= d x w rows per task); the exact leg (top-10 TakeOrdered + counts)
# is the AUDIT — at 100 TB you keep the sketch and drop the exact
# column, the same honesty note as q_events_kmv_distinct.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 512
_CMS_TOP = 10

_CMS_ORACLE = f"""
WITH depths AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS d(i)),
cms AS (
  SELECT d.i,
         {sql_md5_long("'cms' || cast(d.i as varchar) || ':' || cast(e.user_id as varchar)")} % {_CMS_W} AS bucket,
         count(*) AS n
  FROM events e CROSS JOIN depths d
  GROUP BY 1, 2
), ex AS (
  SELECT user_id, count(*) AS exact_n FROM events
  GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT {_CMS_TOP}
), est AS (
  SELECT ex.user_id, ex.exact_n, min(c.n) AS cms_n
  FROM ex CROSS JOIN depths d
  JOIN cms c ON c.i = d.i
   AND c.bucket = {sql_md5_long("'cms' || cast(d.i as varchar) || ':' || cast(ex.user_id as varchar)")} % {_CMS_W}
  GROUP BY 1, 2
)
SELECT user_id, exact_n, cms_n, cms_n - exact_n AS overcount
FROM est
"""


@register("q_events_cms_freq", oracle=_CMS_ORACLE)
def q_events_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates for the exact top-10 users, with the
    point-query overcount audited next to the truth.

    Engine plan: the d-way explode is map-side (no pre-shuffle blowup
    reaches the exchange — partial aggregation reduces each task's
    output to <= d x w counter rows), the sketch lands as a 2,048-row
    relation, and the 10 audit keys probe it through a broadcast join.
    Both engines hash md5 -> 60-bit -> mod w on non-negative values, so
    bucket ids are identical and the hash-check is exact."""
    ev = table(spark, sf_dir, "events").select("user_id")
    depths = F.array(*[F.lit(i) for i in range(_CMS_D)])
    keyed = ev.select(
        "user_id", F.explode(depths).alias("i")
    ).select(
        "i",
        F.pmod(
            md5_long(
                F.concat(
                    F.lit("cms"),
                    F.col("i").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            ),
            F.lit(_CMS_W),
        ).alias("bucket"),
    )
    cms = keyed.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("n"))
    ex = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(_CMS_TOP)
    )
    probes = ex.select(
        "user_id", "exact_n", F.explode(depths).alias("i")
    ).select(
        "user_id",
        "exact_n",
        "i",
        F.pmod(
            md5_long(
                F.concat(
                    F.lit("cms"),
                    F.col("i").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            ),
            F.lit(_CMS_W),
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("n").alias("cms_n"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
    )
