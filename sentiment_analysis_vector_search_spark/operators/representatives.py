"""Representative-comment selection — the reference's "vector search"
core (find_representative_comments, Context_analyzer_RoBERTa_fun.py:87):
per sentiment class, TF-IDF vectorize, KMeans(k=10, seed=42), then pick the
member nearest its cluster centroid by cosine; report cluster_id and
cluster_size.

Spark-first: MLlib pipeline (Tokenizer → HashingTF → IDF → KMeans) per
class, then a DataFrame join against the (tiny, broadcast) centroid table
with a zip_with dot product — no Python UDF; distances are computed by
Catalyst over vector_to_array output.

Not SQL-expressible (iterative Lloyd's algorithm) → rows-only driver check;
invariants are pytest-verified instead (cluster count, sizes sum to class
size, representative belongs to its cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register

_N_REPRESENTATIVES = 10  # reference n_representatives default
_HASHING_DIM = 1 << 12
_SEED = 42
# Lloyd's iterations shuffle the (small) assignment state every pass; pin
# their parallelism so a default-conf session doesn't run 200-task stages
# over kilobytes. The corpus scan itself keeps its input partitioning.
_FIT_PARTS = "16"
# KMeans aggregation order (and therefore the seed-42 outcome) depends on
# the input's partition layout; hash-partitioning the class by doc_id to a
# FIXED count makes the fit invariant to however the caller's scan happened
# to split — the reference contract (k=10, seed=42,
# Context_analyzer_RoBERTa_fun.py:87) implies reproducible clusters.
_FIT_INPUT_PARTS = 8


def _score_class(
    spark: SparkSession, df: DataFrame, persisted: list | None = None
) -> DataFrame | None:
    """Cluster one sentiment class and score every member's cosine to its
    cluster centroid. Split out from the representative selection so tests
    can assert the argmax-membership property over the full assignment."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    # Partition-layout-invariant fit: same rows -> same clusters, no matter
    # how the upstream scan or a fan-out split the class (hash, not
    # round-robin: round-robin placement depends on the incoming layout).
    df = df.repartition(_FIT_INPUT_PARTS, "doc_id")
    n = df.count()
    if n == 0:
        return None
    k = min(_N_REPRESENTATIVES, n)

    tok = Tokenizer(inputCol="text", outputCol="words")
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=_HASHING_DIM)
    idf = IDF(inputCol="tf", outputCol="features")
    words = tok.transform(df)
    tfd = tf.transform(words)
    idf_model = idf.fit(tfd)
    # Persist the featurized frame: IDF.fit already scanned the corpus once,
    # and KMeans.fit + model.transform + the centroid join would otherwise
    # re-run Tokenizer→HashingTF→IDF per consumer.
    feats = idf_model.transform(tfd).persist()
    if persisted is not None:
        persisted.append(feats)

    km = KMeans(k=k, seed=_SEED, featuresCol="features", predictionCol="cluster_id")
    model = km.fit(feats)
    pred = model.transform(feats).withColumn("fa", vector_to_array("features"))

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cluster_id", "center"],
    )
    dot = (
        "aggregate(zip_with(fa, center, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    nrm = lambda c: f"sqrt(aggregate(zip_with({c}, {c}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x))"  # noqa: E731
    return pred.join(F.broadcast(centers), "cluster_id").withColumn(
        "centroid_cosine",
        F.expr(f"{dot} / (greatest({nrm('fa')}, 1e-12) * greatest({nrm('center')}, 1e-12))"),
    )


def _representatives_for_class(
    spark: SparkSession, df: DataFrame, persisted: list | None = None
) -> DataFrame:
    scored = _score_class(spark, df, persisted)
    if scored is None:
        return None
    w_size = Window.partitionBy("cluster_id")
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc("centroid_cosine"), F.asc("doc_id")
    )
    return (
        scored.withColumn("cluster_size", F.count(F.lit(1)).over(w_size))
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") == 1)
        .select(
            "sentiment",
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "doc_id",
            F.round("centroid_cosine", 6).alias("centroid_cosine"),
        )
    )


# Memo of materialized results per (application, sf_dir, data fingerprint):
# the registered representatives_invariants query re-derives from the SAME
# clustering, so the expensive iterative fit runs once per driver session,
# not twice. The fingerprint (documents.parquet mtime/size) invalidates the
# memo if the files under sf_dir are rewritten within one application.
# (Safe to cache: KMeans is seeded and the fit is partition-layout-invariant
# — pytest test_representatives_deterministic clears this to prove it.)
_REPS_CACHE: dict[tuple, DataFrame] = {}


def _data_fingerprint(sf_dir: str) -> tuple:
    import os

    try:
        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (None, None)


@register("representatives_kmeans")  # rows-only: iterative, no SQL oracle
def representatives_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sentiment_ops import classified

    key = (spark.sparkContext.applicationId, sf_dir, _data_fingerprint(sf_dir))
    hit = _REPS_CACHE.get(key)
    if hit is not None:
        return hit

    # Pin fit-time shuffle parallelism (restored after the eager
    # materialization below): every job this operator triggers — IDF/KMeans
    # fits, the per-class counts, the final union — runs bounded stages.
    # The pin-restore mutates session state, so the three class fits run
    # sequentially on this thread (the driver evaluates queries one at a
    # time); _score_class's own hash repartition makes each fit reproducible
    # regardless.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _FIT_PARTS)
    persisted: list[DataFrame] = []
    lab = classified(spark, sf_dir).select("doc_id", "text", "sentiment").persist()
    persisted.append(lab)
    try:
        # Per-class clustering mirrors the reference; the loop is over the 3
        # sentiment classes, never over data.
        out = None
        for sent in ("POSITIVE", "NEGATIVE", "NEUTRAL"):
            cls = lab.where(F.col("sentiment") == sent)
            reps = _representatives_for_class(spark, cls, persisted)
            if reps is not None:
                out = reps if out is None else out.unionByName(reps)
        if out is None:  # all three classes empty: empty result, not a crash
            out = spark.createDataFrame(
                [],
                "sentiment string, cluster_id int, cluster_size bigint, "
                "doc_id bigint, centroid_cosine double",
            )
        # The result is ~3·k rows; materialize it so (a) the conf restore
        # below can't change its plan, (b) the invariants query and repeat
        # calls reuse it without re-running Lloyd's iterations.
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        for df in persisted:
            df.unpersist()
    _REPS_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# representatives_invariants — the hash-checkable contract of the kmeans
# output. Lloyd's iterations aren't SQL-expressible, but every structural
# property of a CORRECT result is: per sentiment class, cluster sizes sum
# exactly to the class population, at most min(10, class_n) clusters emit a
# representative, representatives are distinct documents, and cosines lie
# in [-1, 1]. The oracle derives the class populations from the same
# SQL-expressible classification the clustering consumes and pins each
# boolean invariant to literal true — any violation hash-mismatches.
# (Representative argmin-membership and seed-42 determinism need the full
# assignment, so they live in tests/test_representatives.py.)
# ---------------------------------------------------------------------------


def _invariants_oracle() -> str:
    from ..functions import sentiment as S

    return f"""
WITH {S.SQL_CLASSIFIED_CTE}
SELECT sentiment,
       count(*) AS class_n,
       true AS k_ok,
       true AS reps_distinct,
       true AS cosine_ok
FROM labeled GROUP BY sentiment
"""


@register("representatives_invariants", oracle=_invariants_oracle())
def representatives_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    reps = representatives_kmeans(spark, sf_dir)
    return reps.groupBy("sentiment").agg(
        F.sum("cluster_size").cast("bigint").alias("class_n"),
        (
            F.count(F.lit(1))
            <= F.least(F.lit(_N_REPRESENTATIVES).cast("bigint"), F.sum("cluster_size"))
        ).alias("k_ok"),
        (F.countDistinct("doc_id") == F.count(F.lit(1))).alias("reps_distinct"),
        (
            (F.min("centroid_cosine") >= -1.000001)
            & (F.max("centroid_cosine") <= 1.000001)
        ).alias("cosine_ok"),
    )
