import glob

from pyspark.sql import functions as F

from tests.parity import assert_parity


def test_stream_sessionize_parity(spark, sf_dir):
    assert_parity(spark, "stream_sessionize", sf_dir)


def test_write_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    from sentiment_analysis_vector_search_spark.catalog import table
    from sentiment_analysis_vector_search_spark.sinks import read_back, write_partitioned

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "by_lang")
    write_partitioned(docs, out, partition_by=("lang",), sort_within=("doc_id",))

    # hive-style partition dirs exist
    dirs = {p.split("/")[-1] for p in glob.glob(f"{out}/lang=*")}
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert dirs == {f"lang={l}" for l in langs}

    back = read_back(spark, out)
    assert back.count() == docs.count()
    # partition pruning: a lang filter scans only that directory
    some_lang = next(iter(langs))
    pruned = back.where(F.col("lang") == some_lang)
    assert pruned.count() == docs.where(F.col("lang") == some_lang).count()


def test_write_training_shards_even_and_sorted(spark, sf_dir, tmp_path):
    from sentiment_analysis_vector_search_spark.catalog import table
    from sentiment_analysis_vector_search_spark.sinks import read_back, write_training_shards

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == 4

    total = docs.count()
    # range partitioning: shards are disjoint key ranges covering everything
    seen = 0
    prev_max = None
    for f in files:
        pdf = spark.read.parquet(f).select("doc_id").toPandas()
        seen += len(pdf)
        assert len(pdf) >= total // 10, "shard badly skewed"
        lo, hi = pdf["doc_id"].min(), pdf["doc_id"].max()
        if prev_max is not None:
            assert lo > prev_max
        prev_max = hi
    assert seen == total
