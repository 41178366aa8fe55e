import pytest

from tests.parity import assert_parity

ANALYTICS_EXT = [
    "q_events_asof_attribution",
    "q_value_percentiles",
    "emb_label_centroids",
    "q_events_funnel",
]


@pytest.mark.parametrize("name", ANALYTICS_EXT)
def test_analytics_ext_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_asof_gap_nonnegative(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_events_asof_attribution"](spark, sf_dir)
    assert df.where("gap_us < 0").count() == 0


def test_funnel_monotone(spark, sf_dir):
    import __spark_entry__ as entrymod

    row = entrymod.queries()["q_events_funnel"](spark, sf_dir).first()
    assert row.n_signup >= row.n_click_after_signup >= row.n_purchase_after_click


@pytest.mark.parametrize("name", ["q_events_retention", "pipeline_curate_stats"])
def test_analytics_ext2_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


@pytest.mark.parametrize("name", ["q_events_gapfill", "q_events_anomaly"])
def test_analytics_ext3_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_gapfill_dense_and_monotone(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q_events_gapfill"](spark, sf_dir).orderBy("day").collect()
    days = [r.day for r in rows]
    for a, b in zip(days, days[1:]):
        assert (b - a).days == 1  # dense daily spine, no holes


@pytest.mark.parametrize(
    "name", ["q_user_overlap", "q_order_deciles", "q_events_seasonality"]
)
def test_analytics_ext4_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


@pytest.mark.parametrize(
    "name",
    ["q_nation_segment_pivot", "q_churned_buyers", "q_nation_segment_unpivot"],
)
def test_analytics_ext5_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_unpivot_roundtrips_pivot(spark, sf_dir):
    """The long form must hold exactly the wide matrix's cells: dense
    |nations| x |segments| rows whose values match the wide columns."""
    from sentiment_analysis_vector_search_spark.operators.analytics_ext import (
        _SEGMENTS,
        q_nation_segment_pivot,
        q_nation_segment_unpivot,
    )

    wide = {r["n_name"]: r for r in q_nation_segment_pivot(spark, sf_dir).collect()}
    long = q_nation_segment_unpivot(spark, sf_dir).collect()
    assert len(long) == len(wide) * len(_SEGMENTS)
    for r in long:
        assert r["revenue"] == wide[r["n_name"]][r["segment"]]
