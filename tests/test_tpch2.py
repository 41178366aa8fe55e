import pytest

from tests.parity import assert_parity

TPCH2 = [
    "q2_min_cost_supplier",
    "q8_national_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_priority_shipping",
    "q15_top_supplier",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q_cube_revenue",
    "q_orders_grouping_sets",
]


@pytest.mark.parametrize("name", TPCH2)
def test_tpch2_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_q2_rows_hit_per_part_minimum(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q2_min_cost_supplier"](spark, sf_dir).toPandas()
    assert len(df) > 0
    # every surviving row's unit_cost is the minimum for its part
    assert (df.groupby("p_partkey")["unit_cost"].transform("min") == df["unit_cost"]).all()


def test_q21_matches_correlated_exists_form(spark, sf_dir):
    """The engine runs the decorrelated aggregation; re-run the textbook
    EXISTS/NOT EXISTS form through spark.sql over registered views and
    check both plans agree — the same rewrite-equivalence the DuckDB
    oracle checks, but executed by Spark itself."""
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.catalog import register_views
    from sentiment_analysis_vector_search_spark.operators.relational_tpch2 import (
        _Q21_ORACLE,
    )

    register_views(spark, sf_dir)
    got = entrymod.queries()["q21_waiting_suppliers"](spark, sf_dir).toPandas()
    want = spark.sql(_Q21_ORACLE).toPandas()
    got = got.sort_values(["numwait", "s_name"], ascending=[False, True], ignore_index=True)
    want = want.sort_values(["numwait", "s_name"], ascending=[False, True], ignore_index=True)
    assert got["s_name"].tolist() == want["s_name"].tolist()
    assert got["numwait"].tolist() == want["numwait"].tolist()


def test_q15_returns_global_max(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q15_top_supplier"](spark, sf_dir).toPandas()
    assert len(df) >= 1
    assert df["total_revenue"].nunique() == 1


def test_grouping_sets_grains_are_consistent(spark, sf_dir):
    """The three grains must internally reconcile: segment totals equal
    the sum of that segment's per-year rows, and the priority grain's
    total row count equals the distinct priorities."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q_orders_grouping_sets"](spark, sf_dir).collect()
    seg_total = {
        r["segment"]: (r["revenue"], r["n_orders"])
        for r in rows
        if r["priority"] == "ALL" and r["order_year"] == -1
    }
    seg_year = {}
    for r in rows:
        if r["priority"] == "ALL" and r["order_year"] != -1:
            a, b = seg_year.get(r["segment"], (0.0, 0))
            seg_year[r["segment"]] = (a + r["revenue"], b + r["n_orders"])
    assert set(seg_total) == set(seg_year)
    for s_, (rev, n) in seg_total.items():
        assert abs(seg_year[s_][0] - rev) < 1e-6 * max(abs(rev), 1.0)
        assert seg_year[s_][1] == n
    prio_rows = [r for r in rows if r["segment"] == "ALL"]
    assert all(r["order_year"] == -1 for r in prio_rows)
    assert len(prio_rows) == len({r["priority"] for r in prio_rows})
