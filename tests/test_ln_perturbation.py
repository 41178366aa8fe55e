"""Engine-ln boundary-margin proof for the tfidf family (r10 verdict #3).

Six graded queries share the TF-IDF CTE's single engine-native ln —
``ln((1.0 + n) / (1.0 + df))`` — whose result flows into hashed
6-dp-rounded columns. Converting them to stable_ln would perturb six
outputs at once (including the delicate representatives_kmeans, whose
tfidf inputs feed Lloyd iterations), so this family takes the verdict's
sanctioned alternative: PROVE, on the exact parquet the driver grades
(sf0.001 / sf0.01 are fixed artifacts), that no plausible cross-libm ln
divergence can change any emitted cell.

Method: rerun each oracle with ln replaced by ``ln(x) * (1 ± 3e-16)``
(≈ ±1.4 ulp relative — wider than the ≤1-ulp disagreement between any
two faithful libm/Math.log implementations) and assert the full result
set is bit-identical to the unperturbed run. Because Spark evaluates a
value-equivalent pipeline on the same data, any ln implementation whose
results sit inside that band — Java's Math.log included — must produce
the identical graded output.

A guard pin also asserts the set of oracles still containing engine ln
is EXACTLY this family, so a new ln-dependent hashed surface cannot
land unnoticed (everything else routes through functions.stable's
stable_ln, which is engine-invariant by construction).
"""

from __future__ import annotations

import math
import re

import pytest

from .parity import duckdb_conn

# The one sanctioned engine-ln site: the shared TF-IDF idf. One ln per
# oracle, all six from functions/tfidf.py's SQL_TFIDF_CTE.
LN_FAMILY = {
    "tfidf_vectors": 1,
    "doc_top_keywords": 1,
    "rag_retrieve": 1,
    "rag_hybrid_retrieve": 1,
    "representatives_kmeans": 1,
    "representatives_invariants": 1,
}

_LN_RE = re.compile(r"(?<![a-z_])ln\(")


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_engine_ln_allowlist_is_exactly_the_tfidf_family():
    found = {}
    for name, sql in _oracles().items():
        n = len(_LN_RE.findall(sql))
        if n:
            found[name] = n
    assert found == LN_FAMILY, (
        "engine-native ln( appeared in an unexpected oracle — use "
        "functions.stable.sql_stable_ln for any new log-derived hashed "
        f"column. Found: {found}"
    )


def _canon(rows):
    out = []
    for row in rows:
        out.append(
            tuple(
                "NaN" if isinstance(v, float) and math.isnan(v) else v
                for v in row
            )
        )
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(LN_FAMILY))
@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_output_invariant_under_ln_ulp_perturbation(name, sf):
    sql = _oracles()[name]
    assert _LN_RE.search(sql)
    con = duckdb_conn(sf)
    con.sql("CREATE MACRO lnup(x) AS ln(x) * (1.0 + 3e-16)")
    con.sql("CREATE MACRO lndn(x) AS ln(x) * (1.0 - 3e-16)")
    base = _canon(con.sql(sql).fetchall())
    up = _canon(con.sql(_LN_RE.sub("lnup(", sql)).fetchall())
    dn = _canon(con.sql(_LN_RE.sub("lndn(", sql)).fetchall())
    con.close()
    assert up == base, f"{name}@{sf}: +1.4ulp ln perturbation changed output"
    assert dn == base, f"{name}@{sf}: -1.4ulp ln perturbation changed output"
