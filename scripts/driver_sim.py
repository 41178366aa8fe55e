"""Driver simulator: exercises the __spark_entry__ contract end-to-end the
way the round driver does — entry() smoke at sf0.001, then every queries()
entry vs its oracle_sql() in DuckDB at sf0.01 (row count, column names,
order-insensitive values). Run: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sentiment_analysis_vector_search_spark.catalog import TABLES
from sentiment_analysis_vector_search_spark.session import get_spark


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_match(g: pd.Series, w: pd.Series) -> bool:
    if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
        return all(
            (pd.isna(a) and pd.isna(b))
            or (not pd.isna(a) and not pd.isna(b) and math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-6))
            for a, b in zip(g, w)
        )
    return bool((g.astype(str) == w.astype(str)).all())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")

    t0 = time.time()
    rows = entrymod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time() - t0:.1f}s  schema ok")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            if name not in oracles:
                print(f"  {name}: rows-only ({len(got)} rows) in {time.time()-t0:.1f}s")
                n_rowsonly += 1
                continue
            want = normalize(con.sql(oracles[name]).df())
            ok = list(got.columns) == list(want.columns) and len(got) == len(want)
            detail = ""
            if ok:
                for c in got.columns:
                    if not values_match(got[c], want[c]):
                        ok, detail = False, f" value mismatch in {c}"
                        break
            else:
                detail = f" cols/rows: got {len(got)}x{list(got.columns)} want {len(want)}x{list(want.columns)}"
            print(f"  {name}: {'OK' if ok else 'MISMATCH' + detail} ({len(got)} rows) in {time.time()-t0:.1f}s")
            n_pass += ok
            n_fail += not ok
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: ERROR {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} hash-match, {n_rowsonly} rows-only, {n_fail} failed @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
