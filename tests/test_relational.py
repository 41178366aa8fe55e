import pytest

from tests.parity import assert_parity

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_top_customers_window",
    "q_market_share",
    "q_events_window",
    "q_events_sessions",
    "q_events_json",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_q1_has_expected_shape(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q1_pricing_summary"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 9  # at most |returnflag| x |linestatus| groups
    assert "sum_disc_price" in df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
