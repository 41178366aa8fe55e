import pytest

from tests.parity import assert_parity

TRAINING = ["train_shuffle_shards", "sample_epochs", "bpe_merge_candidates"]


@pytest.mark.parametrize("name", TRAINING)
def test_training_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_shuffle_shards_balanced_and_windowless(spark, sf_dir):
    from sentiment_analysis_vector_search_spark.registry import QUERIES

    df = QUERIES["train_shuffle_shards"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "ntile" not in plan, plan  # dist_ntile, not a global window
    sizes = {r["shard"]: r["n"] for r in df.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    assert len(sizes) == 16
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance

def test_sample_epochs_decay(spark, sf_dir):
    from sentiment_analysis_vector_search_spark.registry import QUERIES

    df = QUERIES["sample_epochs"](spark, sf_dir)
    per_epoch = {
        r["epoch"]: r["n"]
        for r in df.groupBy("epoch").agg({"n_docs": "sum"}).withColumnRenamed("sum(n_docs)", "n").collect()
    }
    # epoch 0 keeps everything; each later epoch roughly halves (hash
    # uniformity at corpus sizes: allow wide tolerance)
    assert per_epoch[0] > 0
    assert 0.3 < per_epoch[1] / per_epoch[0] < 0.7
    assert 0.12 < per_epoch[2] / per_epoch[0] < 0.4


def test_bpe_pair_explode_is_vocab_grain(spark, sf_dir):
    """The expensive generate must consume the word-count AGGREGATE (vocab
    grain), not the corpus: in the plan, the pair-explode Generate sits
    above the first HashAggregate, so exactly one explode touches corpus
    rows."""
    from sentiment_analysis_vector_search_spark.plans import count_in_plan
    from sentiment_analysis_vector_search_spark.registry import QUERIES

    df = QUERIES["bpe_merge_candidates"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two Generates total (token explode + vocab-grain pair explode)
    assert plan.count("Generate") == 2, plan
    # the pair explode's child chain must contain the vocab aggregate:
    # locate the Generate over `pair` and require an Aggregate below it
    tail = plan[plan.index("pair") :]
    assert "HashAggregate" in tail, plan
