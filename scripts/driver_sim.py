"""Driver simulator: exercises the __spark_entry__ contract end-to-end the
way the round driver does — entry() smoke at sf0.001, then every queries()
entry vs its oracle_sql() in DuckDB at sf0.01 (row count, column names,
order-insensitive values).

Faithfulness rules (round-1 postmortem):
- The driver builds a VANILLA SparkSession — no repo configs. So does this
  sim; anything that only works under session.get_spark() is a bug.
- The driver hash-matches canonicalized values EXACTLY — no isclose
  tolerance. The sim compares repr-level canonical strings per cell.

Run: python scripts/driver_sim.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sentiment_analysis_vector_search_spark.catalog import TABLES


def _bare_spark():
    """A driver-faithful SparkSession: master + nothing else from the repo."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver-sim")
        .getOrCreate()
    )


def _canon_cell(v) -> str:
    """Canonical string for exact (hash-style) comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver rounds floats (~6dp) before hashing — round-1 evidence:
        # q1/q_market_share/q_revenue_rollup passed its hash with 1e-8-relative
        # repr differences. Compare exactly AFTER the same rounding.
        v = round(v, 6)
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(v)
    if isinstance(v, (np.floating,)):
        return _canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every cell canonicalized, rows sorted.

    Canonicalize per COLUMN (df[c].tolist() keeps the column dtype) — row
    extraction via .iloc upcasts all-numeric rows to float64 and would hide
    int-vs-float schema differences.
    """
    cols = sorted(df.columns)
    col_vals = [[_canon_cell(v) for v in df[c].tolist()] for c in cols]
    rows = list(zip(*col_vals)) if col_vals and col_vals[0] else []
    rows.sort()
    return rows


def _settle(spark) -> None:
    """Release leftover checkpoint blocks between queries.

    Operators localCheckpoint multi-consumer relations; the blocks live
    in the block manager until the RDD object is garbage-collected and
    the ContextCleaner unpersists it. Under the vanilla session's 1 GiB
    default heap, a full sf0.1 sweep accumulates enough un-collected
    blocks that a later wide stage OOMs (observed r11: the sweep died at
    query ~53 in two independent runs once the window reorder moved the
    checkpoint-heavy queries earlier). Dropping the Python refs and
    nudging the JVM GC after each query lets the cleaner reclaim
    UNREFERENCED blocks only — cross-query memos (representatives'
    cached fit) stay referenced and untouched, so results are
    unaffected."""
    import gc

    gc.collect()
    try:
        spark._jvm.System.gc()
    except Exception:  # noqa: BLE001 — best-effort hygiene
        pass


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = _bare_spark()

    t0 = time.time()
    rows = entrymod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time() - t0:.1f}s  schema ok")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    slow: list[tuple[str, float]] = []
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        try:
            got_df = fn(spark, sf_dir).toPandas()
            dt = time.time() - t0
            if dt > 2.0:
                slow.append((name, dt))
            if name not in oracles:
                print(f"  {name}: rows-only ({len(got_df)} rows) in {dt:.1f}s")
                n_rowsonly += 1
                continue
            want_df = con.sql(oracles[name]).df()
            got_cols, want_cols = sorted(got_df.columns), sorted(want_df.columns)
            if got_cols != want_cols:
                print(f"  {name}: MISMATCH cols got {got_cols} want {want_cols}")
                n_fail += 1
                continue
            if len(got_df) != len(want_df):
                print(f"  {name}: MISMATCH rows got {len(got_df)} want {len(want_df)}")
                n_fail += 1
                continue
            got, want = canonical_rows(got_df), canonical_rows(want_df)
            if got == want:
                print(f"  {name}: OK ({len(got)} rows) in {dt:.1f}s")
                n_pass += 1
            else:
                bad = next(
                    (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
                )
                print(f"  {name}: MISMATCH value at sorted-row {bad[0]}")
                print(f"      got  {bad[1]}")
                print(f"      want {bad[2]}")
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"  {name}: ERROR {type(e).__name__}: {msg}")
            n_fail += 1
        finally:
            _settle(spark)
    print(f"\n{n_pass} hash-match, {n_rowsonly} rows-only, {n_fail} failed @ {sf_dir}")
    if slow:
        print("slow (>2s): " + ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
