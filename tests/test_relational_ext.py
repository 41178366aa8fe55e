import pytest

from tests.parity import assert_parity

RELATIONAL_EXT = [
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q22_dormant_customers",
    "q_revenue_rollup",
    "q16_supplier_breadth",
]


@pytest.mark.parametrize("name", RELATIONAL_EXT)
def test_relational_ext_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_rollup_has_grand_total(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_revenue_rollup"](spark, sf_dir)
    grand = df.where("region = 'ALL' AND nation = 'ALL' AND order_year = 'ALL'")
    assert grand.count() == 1


def test_running_revenue_parity(spark, sf_dir):
    assert_parity(spark, "q_running_revenue", sf_dir)


@pytest.mark.parametrize("name", ["q4_priority_exists", "q17_small_quantity"])
def test_relational_ext3_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_sql_text_api_parity(spark, sf_dir):
    assert_parity(spark, "q_sql_text_api", sf_dir)


def test_moving_avg_parity(spark, sf_dir):
    assert_parity(spark, "q_revenue_moving_avg", sf_dir)
