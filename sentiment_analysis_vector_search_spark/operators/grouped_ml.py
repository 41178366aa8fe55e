"""Grouped ML: per-group model fitting through applyInPandas (grouped-map).

The pattern: groupBy(key).applyInPandas(fit) runs one Python/numpy fit per
group with the group's rows as a pandas DataFrame — the standard way to
train thousands of small per-entity models (per-store forecasts, per-user
curves) on a cluster. Each group must fit in one task's memory; groups are
the parallelism unit.

The demo fit is closed-form OLS of event value against hour-of-day per
event type. All sums go through exact decimals (functions/stable.py
semantics) and the final arithmetic is ordered identically in both engines,
so the DuckDB oracle reproduces slope/intercept bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_LINREG_ORACLE = """
WITH s AS (
  SELECT event_type, count(*) AS n,
         cast(sum(cast(hour(ts) as decimal(30,10))) as double) AS sx,
         cast(sum(cast(value as decimal(30,10))) as double) AS sy,
         cast(sum(cast(hour(ts) * value as decimal(30,10))) as double) AS sxy,
         cast(sum(cast(hour(ts) * hour(ts) as decimal(30,10))) as double) AS sxx
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
            END AS intercept
FROM s
"""


def _fit_group(pdf):
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    q = Decimal("1e-10")

    def dsum(vals) -> float:
        total = Decimal(0)
        for v in vals:
            total += Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP)
        return float(total)

    xs = pdf["ts"].dt.hour.astype("int64")
    ys = pdf["value"].astype("float64")
    n = float(len(pdf))
    sx = dsum(xs)
    sy = dsum(ys)
    sxy = dsum(x * y for x, y in zip(xs, ys))
    sxx = dsum(x * x for x in xs)

    def round6(v: float) -> float:
        return float(Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    denom = n * sxx - sx * sx
    if denom == 0.0:
        # zero x-variance (all events in one hour): slope is undefined —
        # emit NULL rather than ZeroDivisionError-ing the whole job. The
        # oracle's CASE mirrors this.
        slope = intercept = None
    else:
        slope = (n * sxy - sx * sy) / denom
        intercept = round6((sy - slope * sx) / n)
        slope = round6(slope)

    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [int(n)],
            "slope": [slope],
            "intercept": [intercept],
        }
    )


@register("ml_grouped_linreg", oracle=_LINREG_ORACLE)
def ml_grouped_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    return ev.groupBy("event_type").applyInPandas(
        _fit_group, schema="event_type string, n bigint, slope double, intercept double"
    )
