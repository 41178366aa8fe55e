"""Numerically stable, engine-portable aggregate helpers.

Double-precision sums are order-dependent; a Spark partial-agg tree and a
single-threaded oracle will disagree in the low bits. We therefore aggregate
through exact decimals: cast each addend to DECIMAL(30,10) (deterministic
per-row rounding), sum exactly, and cast the final value back to double.
Both engines then produce bit-identical results regardless of partitioning —
exactly what you need at 1000 executors where addition order is arbitrary.
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


def sql_dsum(expr: str, alias: str) -> str:
    return f"cast(sum(cast(({expr}) as {DEC})) as double) as {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"round(cast(sum(cast(({expr}) as {DEC})) as double) / count(*), 6) as {alias}"
