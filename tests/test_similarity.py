import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity

SIMILARITY = [
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "rag_retrieve",
]


@pytest.mark.parametrize("name", SIMILARITY)
def test_similarity_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_bruteforce_is_recall_ceiling(spark, sf_dir):
    """LSH/IVF results must be subsets of the exact scores (no fabricated hits),
    and recall@10 should be meaningfully nonzero."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in qs["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    for approx_name in ("ann_lsh_topk", "ann_ivf_topk"):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in qs[approx_name](spark, sf_dir).collect()
        }
        recall = len(approx & exact) / len(exact)
        assert recall > 0.2, f"{approx_name} recall@10 = {recall:.2f}"


def test_topk_ranks_dense(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["ann_bruteforce_topk"](spark, sf_dir)
    per_q = df.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rk").alias("mx"), F.min("rk").alias("mn")
    )
    for r in per_q.collect():
        assert r["n"] == 10 and r["mn"] == 1 and r["mx"] == 10


def test_ann_ivf_trained_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "ann_ivf_trained_topk", sf_dir)
