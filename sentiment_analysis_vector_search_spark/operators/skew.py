"""Skew mitigation: salted joins.

AQE's skew-join splitting handles moderate skew at runtime; a *salted*
join is the explicit fix when one hot key dominates (the classic power-law
user or null-key pile-up). The big side gets a deterministic salt in
[0, n); the small side is replicated n times, once per salt value, so the
hot key's rows spread over n reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with an ``n_salts``-way salt.

    ``salt_src``: a column of ``big`` whose hash picks the salt
    (deterministic across retries — important for exactly-once sinks);
    defaults to the join key's row-local hash mixed with all columns via
    ``xxhash64(*)`` being unavailable, we use xxhash64(key) alone only if
    no better column exists — pass a unique id column when you have one.
    """
    src = salt_src or key
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
