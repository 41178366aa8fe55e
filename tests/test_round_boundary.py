"""Boundary-distance pins for 6-dp-rounded stable_ln surfaces (r11
verdict #1 follow-through).

Spark's ``round(x, 6)`` (BigDecimal over the shortest decimal repr,
HALF_UP) and DuckDB's (float arithmetic) can land on ADJACENT doubles
when the input sits essentially ON a 1e-6 grid midpoint — that is the
mechanism that failed sample_weighted's driver hash twice (r10/r11).
sample_weighted now emits the unrounded key, but five graded surfaces
still round a stable_ln-derived double to 6 dp before hashing. Those
are safe only while every emitted value sits FAR from its grid
midpoint; this test measures that distance at the graded SFs so any
future near-tie fails at build time instead of in a driver grade.

The pre-round doubles are recomputed here in pure Python from the
INTEGER inputs (pulled via plain DuckDB SQL) using py_stable_ln and the
same IEEE op order as the engine expressions — bit-identical by the
test_stable_ln pins, so a Python-side distance check covers both
engines.
"""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from sentiment_analysis_vector_search_spark.functions.stable import py_stable_ln

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

# minimum distance from the nearest 1e-6 grid midpoint, in ulps of the
# value (the r11 verdict's bar: > 1e3 ulps)
MIN_ULPS = 1e3

_TOKS = (
    "SELECT list_filter(string_split_regex(lower(text), '\\s+'),"
    " w -> w <> '') AS t FROM documents"
)


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


def _midpoint_ulps(v: float) -> float:
    """Distance of v from the nearest half-way point of the 1e-6
    rounding grid, measured in ulps of v. Exact via Decimal (binary
    expansion of the double, no float noise in the measurement)."""
    if v == 0.0 or not math.isfinite(v):
        return math.inf
    frac = (abs(Decimal(v)) * 10**6) % 1
    dist = abs(frac - Decimal("0.5")) * Decimal("1e-6")
    return float(dist) / math.ulp(v)


def _assert_far(values, label: str) -> None:
    assert values, f"{label}: no values to check"
    worst = min(_midpoint_ulps(v) for v in values)
    assert worst > MIN_ULPS, f"{label}: value within {worst:.1f} ulps of a 1e-6 midpoint"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_zipf_points_far_from_round6_midpoints(sf_dir):
    # corpus_zipf_fit: x = round(sln(rk), 6), y = round(sln(c), 6)
    con = _con(sf_dir)
    rows = con.sql(
        f"""
        WITH toks AS ({_TOKS}),
        uc AS (SELECT w, count(*) AS c
               FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w)
        SELECT row_number() OVER (ORDER BY c DESC, w) AS rk, c
        FROM (SELECT * FROM uc ORDER BY c DESC, w LIMIT 200)
        """
    ).fetchall()
    con.close()
    _assert_far([py_stable_ln(rk) for rk, _ in rows if rk > 1], "zipf x")
    _assert_far([py_stable_ln(c) for _, c in rows], "zipf y")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bigram_lm_logp_far_from_round6_midpoints(sf_dir):
    # text_bigram_lm_score: logp = round(sln(np1) - sln(cv), 6)
    con = _con(sf_dir)
    rows = con.sql(
        f"""
        WITH toks AS ({_TOKS}),
        uc AS (SELECT w, count(*) AS c
               FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        vsize AS (SELECT count(*) AS v FROM uc),
        bi AS (SELECT t[cast(p as int)] AS w1, t[cast(p as int) + 1] AS w2
               FROM (SELECT t, unnest(range(1, greatest(len(t), 1))) AS p
                     FROM toks)),
        bc AS (SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY w1, w2)
        SELECT DISTINCT bc.n_pair + 1 AS np1, uc.c + vsize.v AS cv
        FROM bc JOIN uc ON bc.w1 = uc.w, vsize
        """
    ).fetchall()
    con.close()
    _assert_far(
        [py_stable_ln(np1) - py_stable_ln(cv) for np1, cv in rows], "lm logp"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pmi_far_from_round6_midpoints(sf_dir):
    # tok_bigram_pmi: round((((sln(np)-sln(nb))-sln(ca))-sln(cb))+2 sln(nu), 6)
    con = _con(sf_dir)
    rows = con.sql(
        f"""
        WITH toks AS ({_TOKS}),
        uc AS (SELECT w, count(*) AS c
               FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        nu AS (SELECT cast(sum(c) as bigint) AS n_uni FROM uc),
        bi AS (SELECT t[cast(p as int)] AS w1, t[cast(p as int) + 1] AS w2
               FROM (SELECT t, unnest(range(1, greatest(len(t), 1))) AS p
                     FROM toks)),
        bc AS (SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY w1, w2),
        nb AS (SELECT cast(sum(n_pair) as bigint) AS n_bi FROM bc)
        SELECT bc.n_pair, nb.n_bi, a.c AS ca, b.c AS cb, nu.n_uni
        FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, nu, nb
        WHERE bc.n_pair >= 5
        """
    ).fetchall()
    con.close()
    vals = [
        (
            ((py_stable_ln(np) - py_stable_ln(nb)) - py_stable_ln(ca))
            - py_stable_ln(cb)
        )
        + 2.0 * py_stable_ln(nu)
        for np, nb, ca, cb, nu in rows
    ]
    _assert_far(vals, "pmi")


def _dec10(x: float) -> Decimal:
    """sql_vardec semantics: shortest repr, HALF_UP at scale 10."""
    return Decimal(repr(x)).quantize(Decimal("1e-10"), rounding=ROUND_HALF_UP)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_psi_must_not_round_6dp(sf_dir):
    """q_events_psi_drift emits the UNROUNDED decimal-summed psi — and
    this test documents why: at sf0.001 the 'error' cohort's exact
    decimal sum is 0.0575625000, DEAD ON a 1e-6 rounding midpoint (0.37
    ulps), where Spark's HALF_UP and DuckDB's float round can land on
    adjacent doubles. Guard 1: the registered oracle applies no round to
    psi. Guard 2: the near-tie is real (so the no-round choice stays
    justified if the data generator changes)."""
    from sentiment_analysis_vector_search_spark import registry

    registry.load_all_modules()
    oracle = registry.ORACLES["q_events_psi_drift"]
    tail = oracle[oracle.rindex("SELECT") :]
    psi_expr = tail.split("n_b,")[1].split("AS psi")[0]
    assert "round(" not in psi_expr, "psi must stay unrounded"
    B = 10
    con = _con(sf_dir)
    rows = con.sql(
        f"""
        WITH ev AS (
          SELECT event_type, user_id % 2 AS cohort,
                 least(greatest(cast(floor(value / 50) as int), 0), {B - 1}) AS bin
          FROM events
        ), cnt AS (
          SELECT event_type, cohort, bin, count(*) AS nc FROM ev GROUP BY 1, 2, 3
        ), tot AS (
          SELECT event_type,
                 cast(sum(CASE WHEN cohort = 0 THEN nc ELSE 0 END) as bigint) AS m,
                 cast(sum(CASE WHEN cohort = 1 THEN nc ELSE 0 END) as bigint) AS n
          FROM cnt GROUP BY 1
        ), bins AS (
          SELECT t.event_type, x.bin
          FROM (SELECT DISTINCT event_type FROM ev) t,
               (SELECT unnest(range({B})) AS bin) x
        )
        SELECT b.event_type, b.bin,
               coalesce(a.nc, 0) AS c, coalesce(d0.nc, 0) AS d, t.m, t.n
        FROM bins b
        LEFT JOIN cnt a ON a.event_type = b.event_type AND a.bin = b.bin
                       AND a.cohort = 0
        LEFT JOIN cnt d0 ON d0.event_type = b.event_type AND d0.bin = b.bin
                        AND d0.cohort = 1
        JOIN tot t ON t.event_type = b.event_type
        """
    ).fetchall()
    con.close()
    sums: dict[str, Decimal] = {}
    for et, _bin, c, d, m, n in rows:
        term = (
            float(c + 1) / float(m + B) - float(d + 1) / float(n + B)
        ) * (
            ((py_stable_ln(c + 1) - py_stable_ln(m + B)) - py_stable_ln(d + 1))
            + py_stable_ln(n + B)
        )
        sums[et] = sums.get(et, Decimal(0)) + _dec10(term)
    worst = min(
        _midpoint_ulps(float(str(s))) for s in sums.values()
    )
    if sf_dir.endswith("sf0.001"):
        # the documented near-tie: 'error' psi == 0.0575625000 exactly
        assert worst < MIN_ULPS, (
            "the sf0.001 psi midpoint tie disappeared — rounding psi "
            f"may be safe again, re-evaluate (worst={worst:.1f} ulps)"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_data_card_entropy_far_from_round6_midpoints(sf_dir):
    # corpus_data_card: lang_entropy = round(dec_sum(ent_term), 6)
    con = _con(sf_dir)
    rows = con.sql(
        """
        WITH lc AS (SELECT source, lang, count(*) AS c
                    FROM documents GROUP BY source, lang),
        n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        SELECT lc.source, lc.c, n.n_docs FROM lc JOIN n USING (source)
        """
    ).fetchall()
    con.close()
    sums: dict[str, Decimal] = {}
    for src, c, n_docs in rows:
        term = (c * 1.0 / n_docs) * (py_stable_ln(n_docs) - py_stable_ln(c))
        sums[src] = sums.get(src, Decimal(0)) + _dec10(term)
    _assert_far([float(str(s)) for s in sums.values()], "lang_entropy")
