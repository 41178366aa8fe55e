"""stable_ln — the engine-invariant ln device (r10 verdict #1).

Pins the three-way bit-identity Spark == DuckDB == pure-Python reference
(the property that makes hashed/ranked ln-derived columns immune to
host libm / JIT differences), and accuracy against decimal.Decimal.ln
evaluated at 50 digits (the full-precision reference the verdict asked
for; mpmath is not in the container, Decimal.ln is correctly rounded in
its context).
"""

from __future__ import annotations

import random
import struct
from decimal import Decimal, getcontext

import duckdb
import pytest

from sentiment_analysis_vector_search_spark.functions.stable import (
    LN2,
    py_stable_ln,
    sql_stable_ln,
    stable_ln,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _vals() -> list[int]:
    vals = [1, 2, 3, 4, 5, 7, 8, 15, 16, 17, 100, 1000, (1 << 31) - 1, 1 << 31]
    vals += [(1 << k) + s for k in (10, 20, 40, 51) for s in (-1, 0, 1)]
    rng = random.Random(7)
    vals += [rng.randint(1, (1 << 31)) for _ in range(3000)]
    vals += [rng.randint(1, (1 << 52) - 1) for _ in range(1000)]
    return vals


def test_duckdb_matches_python_reference_bitexact():
    con = duckdb.connect()
    con.execute("create table t(a bigint)")
    con.executemany("insert into t values (?)", [(v,) for v in _vals()])
    for a, v in con.sql(f"select a, {sql_stable_ln('a')} from t").fetchall():
        assert _bits(v) == _bits(py_stable_ln(a)), a
    # the d (power-of-two denominator) form, as sample_weighted uses it
    for a, v in con.sql(f"select a, {sql_stable_ln('a', 31)} from t").fetchall():
        assert _bits(v) == _bits(py_stable_ln(a, 31)), a
    con.close()


def test_spark_matches_python_reference_bitexact(spark):
    df = spark.createDataFrame([(v,) for v in _vals()], "a long").repartition(4)
    rows = df.select(
        "a",
        stable_ln("a").alias("v"),
        stable_ln("a", 31).alias("v31"),
    ).collect()
    assert len(rows) == len(_vals())
    for r in rows:
        assert _bits(r.v) == _bits(py_stable_ln(r.a)), r.a
        assert _bits(r.v31) == _bits(py_stable_ln(r.a, 31)), r.a


def test_accuracy_vs_decimal_ln_full_precision():
    getcontext().prec = 50
    for a in _vals():
        got = py_stable_ln(a)
        if a == 1:
            assert got == 0.0
            continue
        true = float(Decimal(a).ln())
        assert got == pytest.approx(true, rel=1e-15), a
    # the d form: ln(a / 2^31)
    for a in (1, 2, 1000, (1 << 31) - 1):
        true = float((Decimal(a) / Decimal(1 << 31)).ln()) if a != 1 << 31 else 0.0
        assert py_stable_ln(a, 31) == pytest.approx(true, rel=1e-15, abs=1e-15)


def test_ln2_literal_is_shortest_repr_of_math_log2():
    import math

    assert LN2 == math.log(2.0)
    assert float(repr(LN2)) == LN2


def test_powers_of_two_are_exact_multiples_of_ln2():
    # z = 0 collapses the series: stable_ln(2^k) == k * LN2 exactly
    for k in range(0, 52):
        assert py_stable_ln(1 << k) == k * LN2


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=(1 << 52) - 1))
    def test_hypothesis_accuracy_over_full_domain(a):
        getcontext().prec = 50
        got = py_stable_ln(a)
        if a == 1:
            assert got == 0.0
        else:
            assert got == pytest.approx(float(Decimal(a).ln()), rel=1e-14)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=(1 << 31) - 1))
    def test_hypothesis_d_form_matches_ratio(a):
        # ln(a / 2^31) == ln(a) - 31 ln 2 to within a couple of ulps of
        # the independently computed decimal reference
        getcontext().prec = 50
        true = float((Decimal(a) / Decimal(1 << 31)).ln())
        assert py_stable_ln(a, 31) == pytest.approx(true, rel=1e-13, abs=1e-13)
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass


# ---------------------------------------------------------------------------
# Staged emission (r11 verdict #2): stable_ln_stages / with_stable_ln
# must be bit-identical to the inline form — naming an intermediate
# cannot change its IEEE value — while shrinking the generated text.
# ---------------------------------------------------------------------------


def test_staged_matches_inline_bitexact_spark_and_duckdb(spark):
    from sentiment_analysis_vector_search_spark.functions.stable import (
        stable_ln_stages,
        with_stable_ln,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in _vals()], "a long").repartition(4)
    for d in (0, 31):
        rows = with_stable_ln(df, "a", "v", d).collect()
        for r in rows:
            assert _bits(r["v"]) == _bits(py_stable_ln(r["a"], d)), r["a"]
        # intermediates are dropped from the emitted schema
        assert set(with_stable_ln(df, "a", "v", d).columns) == {"a", "v"}
    # the staged texts also parse on DuckDB and agree bit-for-bit
    con = duckdb.connect()
    con.execute("create table t(a bigint)")
    con.executemany("insert into t values (?)", [(v,) for v in _vals()[:500]])
    stages, final = stable_ln_stages("a", 31, "_s")
    sel = "select a"
    q = "t"
    for name, text in stages:
        q = f"(select *, {text} as {name} from {q})"
    for a, v in con.sql(f"select a, {final} from {q}").fetchall():
        assert _bits(v) == _bits(py_stable_ln(a, 31)), a
    con.close()


def test_staged_text_is_small():
    from sentiment_analysis_vector_search_spark.functions.stable import (
        stable_ln_stages,
    )

    stages, final = stable_ln_stages("some_col + 7", 31, "_x")
    total = sum(len(t) for _, t in stages) + len(final)
    # the r11 verdict's target: <= ~1 KB per surface (inline was 8,440
    # chars for a bare column argument)
    assert total <= 1200, total
    assert len(sql_stable_ln("some_col + 7", 31)) > 6 * total


def test_staged_projection_survives_optimizer(spark):
    """CollapseProject must NOT re-inline the staged z2 into the 20
    Horner terms (SPARK-36718 keeps non-cheap aliases referenced more
    than once staged) — otherwise the fix would be cosmetic."""
    from sentiment_analysis_vector_search_spark.functions.stable import (
        with_stable_ln,
    )

    df = spark.range(100).selectExpr("id + 1 as a")
    plan = with_stable_ln(df, "a", "v", 31)._jdf.queryExecution().optimizedPlan().toString()
    # the optimized plan keeps a staged projection: the z2 attribute
    # (named _v_z2 by with_stable_ln) must still appear as a producer
    assert "_v_z2" in plan, plan
