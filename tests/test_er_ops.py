"""Blocked fuzzy matching (entity resolution) semantics."""

from __future__ import annotations

import os

import pandas as pd

from sentiment_analysis_vector_search_spark.operators.er_ops import (
    _ER_MAX_DIST,
    er_fuzzy_part_names,
)


def _mk(tmp_path, names):
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        [
            {
                "p_partkey": i,
                "p_name": n,
                "p_brand": "b",
                "p_type": "t",
                "p_size": 1,
                "p_retailprice": 1.0,
            }
            for i, n in enumerate(names)
        ]
    ).to_parquet(os.path.join(d, "part.parquet"), index=False)
    return d


def test_er_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "er_fuzzy_part_names", sf_dir)


def test_er_blocking_and_distance_semantics(spark, tmp_path):
    """Pairs require BOTH the block match (last token) and the distance
    bound; cross-block near-names never pair (the documented blocking
    recall trade); duplicate rows of a name aggregate into n_parts."""
    d = _mk(
        tmp_path,
        [
            "red bolt",     # 0
            "old bolt",     # 1: dist 2 from "red bolt" -> pair
            "red bolt",     # 2: duplicate row of 0 (n_parts_a = 2)
            "red bolts",    # 3: last token "bolts" != "bolt" -> BLOCKED out
            "green widget", # 4: different block entirely
            "grean widget", # 5: dist 1 from 4 -> pair
        ],
    )
    rows = er_fuzzy_part_names(spark, d).collect()
    got = {(r["name_a"], r["name_b"]): r for r in rows}
    assert set(got) == {
        ("old bolt", "red bolt"),
        ("grean widget", "green widget"),
    }
    r = got[("old bolt", "red bolt")]
    assert r["dist"] == 2 <= _ER_MAX_DIST
    assert r["n_parts_b"] == 2  # "red bolt" appears twice
    assert r["block"] == "bolt"
    # "red bolts" is 1 edit from "red bolt" but in another block: the
    # blocking recall trade, asserted so a block-key change is loud
    assert not any("red bolts" in p for p in got)


def test_er_block_cap_drops_mega_blocks(spark, tmp_path):
    """A block with more distinct names than the cap is dropped before
    the pair join (the C(cap,2) bound)."""
    import sentiment_analysis_vector_search_spark.operators.er_ops as er

    names = [f"v{i:04d} noun" for i in range(30)] + ["red bolt", "old bolt"]
    d = _mk(tmp_path, names)
    orig = er._ER_BLOCK_CAP
    er._ER_BLOCK_CAP = 10  # the "noun" block holds 30 > 10 -> dropped
    try:
        # the module-level oracle string froze the default cap; only the
        # engine is under test here
        rows = er_fuzzy_part_names(spark, d).collect()
    finally:
        er._ER_BLOCK_CAP = orig
    got = {(r["name_a"], r["name_b"]) for r in rows}
    assert got == {("old bolt", "red bolt")}
