"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
the MOSS algorithm): deterministic LOCAL-overlap dedup, complementary
to the set-similarity family in dedup.py.

MinHash/SimHash approximate GLOBAL set similarity — two documents that
share one long verbatim passage inside otherwise-different text score
low Jaccard and slip through. Winnowing guarantees: any shared run of
at least k + w - 1 tokens produces at least one IDENTICAL fingerprint
in both documents (the scheme's correctness theorem), so verbatim
passage reuse is caught regardless of how much unrelated text
surrounds it.

Pipeline: word k-grams → md5 gram hashes → per-document sliding-window
minimum (window w) → the distinct window-minima are the fingerprint
set → documents sharing ≥ t fingerprints pair up.

Scale shape: gram hashing and the window minimum are per-document
(window partitions bounded by document length, never data-sized); the
pair join is keyed by fingerprint with a hard frequency cap — a
fingerprint appearing in more than ``_CAP`` documents is boilerplate
and is dropped BEFORE the join (standard practice; also the reason the
join can never go quadratic: each surviving fingerprint yields at most
C(_CAP, 2) pairs). Documents shorter than k + w - 1 tokens produce no
fingerprints and are never flagged (documented contract; exact dedup
catches tiny verbatim docs far more cheaply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, table
from ..functions.hashing import sql_md5_long
from ..registry import register

_K = 4  # words per gram
_W = 3  # winnow window (in grams)
_T = 2  # min shared fingerprints to pair
_CAP = 10  # max docs per fingerprint before it is boilerplate

_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, cast(p as int) AS p,
         {sql_md5_long(
             f"array_to_string(t[cast(p + 1 as int):cast(p + {_K} as int)], ' ')"
         )} AS g
  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t) - {_K} + 1, 0))) AS p
        FROM toks)
), wins AS (
  SELECT doc_id, p,
         count(*) OVER (PARTITION BY doc_id) AS ng,
         min(g) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS fp
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE p <= ng - {_W}
), kept AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_CAP}
), live AS (
  SELECT fps.doc_id, fps.fp FROM fps JOIN kept USING (fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM live a JOIN live b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {_T}
"""


@register("dedup_winnow", oracle=_WINNOW_ORACLE)
def dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint pairs: (doc_a, doc_b, n_shared) for document
    pairs sharing ≥ t window-minimum gram hashes. See module doc for the
    guarantee and the scale shape."""
    docs = fan_out(spark, table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.expr(r"filter(split(lower(text), '\\s+'), w -> w <> '')").alias("t"),
    )
    grams = (
        toks.select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    f"CASE WHEN size(t) >= {_K} THEN "
                    f"transform(sequence(0, size(t) - {_K}),"
                    f" p -> struct(p AS p, concat_ws(' ', slice(t, p + 1, {_K})) AS gs)) "
                    "ELSE array() END"
                )
            ).alias("x"),
        )
        .where(F.col("x").isNotNull())
        .select(
            "doc_id",
            F.col("x.p").alias("p"),
            F.conv(F.substring(F.md5(F.col("x.gs")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("g"),
        )
    )
    wcnt = Window.partitionBy("doc_id")
    wmin = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, _W - 1)
    fps = (
        grams.withColumn("ng", F.count(F.lit(1)).over(wcnt))
        .withColumn("fp", F.min("g").over(wmin))
        .where(F.col("p") <= F.col("ng") - _W)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=False)  # two consumers: cap filter + pair join
    )
    kept = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("nd")).where(
        F.col("nd") <= _CAP
    )
    live = fps.join(kept.select("fp"), "fp")
    a = live.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = live.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _T)
    )
