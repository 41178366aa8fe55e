"""Table catalog: load the synthetic parquet tables for a scale-factor dir.

At cluster scale these would be partitioned/bucketed external tables; the
loaders keep the access path identical (``spark.read.parquet``) so Catalyst
gets column pruning + predicate pushdown into the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast in joins against facts.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark rejects
        # with PARQUET_TYPE_ILLEGAL. nanosAsLong is runtime-settable, so set
        # it here rather than relying on session-build configs — the loader
        # must work on ANY caller-provided SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # With nanosAsLong, ts surfaces as a nanos-since-epoch long; convert to a
    # proper microsecond timestamp (integer DIV keeps full precision).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` plans over them."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
