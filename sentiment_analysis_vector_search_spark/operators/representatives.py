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


def _representatives_for_class(spark: SparkSession, df: DataFrame) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

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
    feats = idf_model.transform(tfd)

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
    scored = pred.join(F.broadcast(centers), "cluster_id").withColumn(
        "centroid_cosine",
        F.expr(f"{dot} / (greatest({nrm('fa')}, 1e-12) * greatest({nrm('center')}, 1e-12))"),
    )
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


@register("representatives_kmeans")  # rows-only: iterative, no SQL oracle
def representatives_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sentiment_ops import classified

    lab = classified(spark, sf_dir).select("doc_id", "text", "sentiment")
    out = None
    # Per-class clustering mirrors the reference; the loop is over the 3
    # sentiment classes, never over data.
    for sent in ("POSITIVE", "NEGATIVE", "NEUTRAL"):
        cls = lab.where(F.col("sentiment") == sent)
        reps = _representatives_for_class(spark, cls)
        if reps is not None:
            out = reps if out is None else out.unionByName(reps)
    return out
