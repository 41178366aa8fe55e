"""Numerically stable, engine-portable aggregate helpers.

Double-precision sums are order-dependent; a Spark partial-agg tree and a
single-threaded oracle will disagree in the low bits. We therefore aggregate
through exact decimals: cast each addend to DECIMAL(30,10) (deterministic
per-row rounding), sum exactly, and cast the final value back to double.
Both engines then produce bit-identical results regardless of partitioning —
exactly what you need at 1000 executors where addition order is arbitrary.

Engine-parity subtlety (the reason for the varchar bridges in the SQL
forms): Spark's double→decimal cast goes through the SHORTEST DECIMAL REPR
(BigDecimal.valueOf) and rounds HALF_UP at the target scale, and its
decimal→double cast is correctly rounded. DuckDB's native casts do neither:
double→decimal TRUNCATES the binary expansion (570959.82 →
570959.8199999999) and decimal→double double-rounds via int128→double→÷10^s
(1 ULP off once |sum|·10^10 exceeds 2^53). Routing both casts through
varchar reproduces Spark exactly: double→varchar is shortest-repr,
varchar→decimal rounds half-away-from-zero at scale (= Java HALF_UP), and
varchar→double is a correctly-rounded parse.

The bridges say ``varchar(64)`` (not bare ``varchar``) so the same string
parses on BOTH engines: Spark rejects unsized VARCHAR
([DATATYPE_MISSING_SIZE]) but accepts varchar(n) and treats it as plain
string in casts; DuckDB ignores the length. 64 chars covers any
decimal(30,10) repr. This matters for q_sql_text_api, where one shared SQL
string is executed by spark.sql() AND the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(col: Column) -> Column:
    """Order-independent sum of a double expression."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent mean: exact decimal sum, then one double division."""
    return F.round(dsum(col) / F.count(F.lit(1)), 6)


def sql_vardec(expr: str) -> str:
    """DuckDB double→DECIMAL(30,10) with Spark's rounding semantics."""
    return f"cast(cast(({expr}) as varchar(64)) as {DEC})"


def sql_dec2double(expr: str) -> str:
    """DuckDB decimal→double, correctly rounded like Spark's cast."""
    return f"cast(cast(({expr}) as varchar(64)) as double)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"{sql_dec2double(f'sum({sql_vardec(expr)})')} as {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"round({sql_dec2double(f'sum({sql_vardec(expr)})')} / count(*), 6)"
        f" as {alias}"
    )
