"""Round-boundary discipline pins (SCALING rule 33, r12).

Spark's ``round(x, 6)`` (BigDecimal over the shortest decimal repr,
HALF_UP) and DuckDB's (float arithmetic) can land on ADJACENT doubles
when the input sits essentially ON a 1e-6 grid midpoint — the mechanism
that failed sample_weighted's driver hash twice (r10/r11). And the
driver grades on its OWN generated corpus, so a local far-from-midpoint
measurement is evidence, not proof.

Therefore the rule has two legs, both pinned here:

1. A hashed column whose pre-round double is ALREADY bit-identical
   cross-engine (stable_ln-derived, decimal-summed, or an exact-integer
   quotient) must be emitted RAW — rounding it buys nothing and carries
   the midpoint hazard on unseen data. Guards assert the registered
   oracles keep these surfaces unrounded: sample_weighted's wkey, psi,
   zipf x/y, bigram-lm logp, pmi, data-card entropy + share. The psi
   case documents a REAL tie this file's earlier boundary sweep caught:
   the sf0.001 'error' PSI decimal sum is exactly 0.0575625000 — 0.37
   ulps from a 1e-6 midpoint.

2. A column that MUST round (its two engine legs genuinely differ in
   low bits — percentile interpolation implementations) is safe only
   while the value sits far from its grid midpoints. The boundary
   distance of those surfaces is measured at both graded SFs (local
   evidence; the raw-emit rule keeps the hashed-surface exposure to
   exactly this engine-divergent class, which cannot be emitted raw).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pytest

from sentiment_analysis_vector_search_spark import registry
from sentiment_analysis_vector_search_spark.functions.stable import py_stable_ln

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

MIN_ULPS = 1e3  # the r11 verdict's bar for surfaces that must round


def _oracle(name: str) -> str:
    registry.load_all_modules()
    return registry.ORACLES[name]


def _final_select(sql: str) -> str:
    return sql[sql.rindex("SELECT") :]


# ---------------------------------------------------------------------------
# Leg 1: raw-emit guards — the bit-identical surfaces stay unrounded
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "query,col_fragment",
    [
        ("sample_weighted", "wkey"),
        ("q_events_psi_drift", "AS psi"),
        ("corpus_data_card", "AS lang_entropy"),
        ("corpus_data_card", "AS top_lang_share"),
        ("text_bigram_lm_score", "AS logp"),
        ("tok_bigram_pmi", "AS pmi"),
    ],
)
def test_bit_identical_surfaces_stay_unrounded(query, col_fragment):
    sql = _oracle(query)
    assert col_fragment.split()[-1] in sql, (query, col_fragment)
    for line in sql.splitlines():
        if col_fragment in line:
            assert "round(" not in line, (
                f"{query}: {col_fragment} must stay unrounded "
                f"(SCALING rule 33) — got: {line.strip()}"
            )


def test_zipf_points_stay_unrounded():
    sql = _oracle("corpus_zipf_fit")
    pts = sql[sql.index("pts AS") : sql.index("), s AS")]
    assert "round(" not in pts, pts


def test_psi_midpoint_tie_is_real():
    """The documented justification for psi's raw emit: at sf0.001 the
    'error' cohort's exact decimal sum sits ON a 1e-6 midpoint. If the
    generator changes and the tie disappears, this fails so the
    decision gets re-evaluated (it should stay raw regardless — the
    driver corpus is unseen)."""
    from decimal import ROUND_HALF_UP

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.001 absent")
    B = 10
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
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
        SELECT b.event_type, coalesce(a.nc, 0), coalesce(d0.nc, 0), t.m, t.n
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
    for et, c, d, m, n in rows:
        term = (
            float(c + 1) / float(m + B) - float(d + 1) / float(n + B)
        ) * (
            ((py_stable_ln(c + 1) - py_stable_ln(m + B)) - py_stable_ln(d + 1))
            + py_stable_ln(n + B)
        )
        sums[et] = sums.get(et, Decimal(0)) + Decimal(repr(term)).quantize(
            Decimal("1e-10"), rounding=ROUND_HALF_UP
        )
    worst = min(_midpoint_ulps(float(str(s))) for s in sums.values())
    assert worst < MIN_ULPS, (
        f"the sf0.001 psi midpoint tie disappeared (worst={worst:.1f} ulps) "
        "— re-evaluate, but keep psi raw"
    )


def test_rule33_no_new_rounded_stable_ln_oracles():
    """Fleet guard: no registered oracle may wrap a stable_ln text in
    round() — the staged/inline ln emission is always bit-identical, so
    any such round is the divergence class this file exists to kill.
    (Recognized by the series' distinctive range-reduction fragment.)"""
    registry.load_all_modules()
    frag = "length(bin(cast("
    offenders = []
    for name, sql in registry.ORACLES.items():
        i = 0
        while True:
            i = sql.find(frag, i)
            if i < 0:
                break
            prefix = sql[max(0, i - 120) : i].lower()
            # a round( whose parenthesis is still open right before the
            # ln text means the ln feeds a round directly
            j = prefix.rfind("round(")
            if j >= 0 and prefix[j:].count("(") > prefix[j:].count(")"):
                offenders.append(name)
                break
            i += len(frag)
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# Leg 2: boundary distance of surfaces that MUST round
# ---------------------------------------------------------------------------


def _midpoint_ulps(v: float) -> float:
    """Distance of v from the nearest half-way point of the 1e-6
    rounding grid, in ulps of v — exact via Decimal."""
    if v == 0.0 or not math.isfinite(v):
        return math.inf
    frac = (abs(Decimal(v)) * 10**6) % 1
    dist = abs(frac - Decimal("0.5")) * Decimal("1e-6")
    return float(dist) / math.ulp(v)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_percentile_surfaces_far_from_round6_midpoints(sf_dir):
    """The surfaces that keep round(x, 6) do so because their engine
    legs genuinely differ in low bits (percentile_cont/percentile
    interpolation): the round is safe only while the values sit far
    from the 1e-6 midpoints. Local-evidence pin at both graded SFs for
    the data-card char percentiles and q_value_percentiles' legs."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    vals = [
        v
        for row in con.sql(
            """
            SELECT cast(quantile_cont(n_chars, 0.5) as double),
                   cast(quantile_cont(n_chars, 0.9) as double)
            FROM documents GROUP BY source
            """
        ).fetchall()
        for v in row
    ]
    vals += [
        v
        for row in con.sql(
            """
            SELECT cast(quantile_cont(value, 0.5) as double),
                   cast(quantile_cont(value, 0.9) as double),
                   cast(quantile_cont(value, 0.99) as double)
            FROM events
            """
        ).fetchall()
        for v in row
    ]
    con.close()
    worst = min(_midpoint_ulps(v) for v in vals)
    assert worst > MIN_ULPS, f"percentile leg within {worst:.1f} ulps of a midpoint"
