"""SCD2 build semantics: run collapse, boundary crossing, tiling."""

from __future__ import annotations

import os

import pandas as pd

from sentiment_analysis_vector_search_spark.operators.scd import (
    q_user_state_scd2,
)


def test_scd2_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "q_user_state_scd2", sf_dir)


def test_scd2_planted_runs_and_boundaries(spark, tmp_path):
    """One user flips state across a midnight boundary, repeats a state
    (run collapse), and holds the last state (open interval); a second
    user never changes (single current row)."""
    T = pd.Timestamp
    rows = [
        # user 1: view (2 events, one run) -> click (crosses midnight,
        # still ONE run) -> view again (new run, state may repeat later)
        (1, T("2026-01-01 10:00:00"), 1, "view"),
        (2, T("2026-01-01 11:00:00"), 1, "view"),
        (3, T("2026-01-01 23:30:00"), 1, "click"),
        (4, T("2026-01-02 00:30:00"), 1, "click"),
        (5, T("2026-01-02 09:00:00"), 1, "view"),
        # user 2: constant state
        (6, T("2026-01-01 08:00:00"), 2, "signup"),
        (7, T("2026-01-03 08:00:00"), 2, "signup"),
    ]
    df = pd.DataFrame(
        [
            {
                "event_id": e,
                "ts": t,
                "user_id": u,
                "event_type": s,
                "value": 1.0,
                "props": "{}",
            }
            for e, t, u, s in rows
        ]
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)

    got = sorted(
        (
            (r["user_id"], r["state"], str(r["valid_from"]),
             str(r["valid_to"]), r["is_current"])
            for r in q_user_state_scd2(spark, d).collect()
        )
    )
    assert got == [
        (1, "click", "2026-01-01 23:30:00", "2026-01-02 09:00:00", 0),
        (1, "view", "2026-01-01 10:00:00", "2026-01-01 23:30:00", 0),
        (1, "view", "2026-01-02 09:00:00", "None", 1),
        (2, "signup", "2026-01-01 08:00:00", "None", 1),
    ]


def test_scd2_invariants_on_corpus(spark, sf_dir):
    """Tiling invariants at test SF: per user exactly one current row,
    intervals tile without gaps (each valid_to equals the next
    valid_from), and consecutive states always differ."""
    rows = q_user_state_scd2(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in rs) == 1
        assert rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], (u, a, b)
            assert a["state"] != b["state"], (u, a, b)
