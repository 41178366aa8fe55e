"""Training-batch shaping: length bucketing and temperature mixing.

Two curation-side planners every large-scale LM data pipeline runs
between corpus curation and the training loop:

``batch_by_length`` — length-bucketed batching (the padding-waste
killer): documents are assigned to power-of-two token-length buckets
and each bucket is batched at a fixed token budget, so a batch never
mixes a 10-token doc with a 500-token one (where the short doc would be
~98% padding). The query reports, per bucket, the doc count, the real
token mass, the padding waste the bucket still pays, and how many
batches the bucket yields — the report a training-infra owner reads to
pick bucket boundaries. Reference scope analogue: the reference
processes comments in fixed-size batches of 100
(Context_analyzer_RoBERTa_fun.py:481,:624 — its BATCH_SIZE loop); this
is the length-aware version a 100 TB corpus needs.

``domain_temperature_mix`` — temperature-based source sampling
(sqrt-temperature, tau = 0.5): sampling shares proportional to
n_docs^tau flatten the source distribution without inverting it — the
standard multilingual/multi-domain recipe (GPT-3 / mBERT-style
exponent sampling) and the complement of ``domain_mix_plan`` (which
targets externally-given shares) and ``cap_per_source`` (a hard cap).
Rates are normalized downsample-only (max rate = 1), so the plan never
asks a source for more documents than it has.

Determinism notes (both queries hash-verify against DuckDB):
- sqrt is correctly rounded by IEEE 754 on every engine, so n_docs^0.5
  is bit-identical in Spark and DuckDB (a pow(x, 0.7) would NOT be —
  libm pow differs by ULPs across engines). The sqrt weights are then
  rounded to 9 decimals and summed as DECIMAL so the normalizing sum is
  exact and independent of row/partition order.
- bucket assignment is a closed CASE chain over literal boundaries
  (no log2, whose libm result at exact powers of two is not reliably
  integral).

Scale shape: both queries are one scan + one small aggregate.
``batch_by_length`` groups by a ~10-value bucket key (map-side combine
does nearly all the work; the shuffle moves #buckets x #partitions
rows). ``domain_temperature_mix`` aggregates to one row per source and
runs its normalizing windows over that |sources|-row relation only —
the same shape as domain_mix_plan, safe at any corpus size as long as
the source cardinality stays metadata-sized (SCALING rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# batch_by_length
# ---------------------------------------------------------------------------

# Power-of-two bucket ceilings; docs longer than the last boundary are
# truncated to it (training truncates to max sequence length).
_LEN_BUCKETS = [8, 16, 32, 64, 128, 256, 512]
_BATCH_TOKEN_BUDGET = 4096  # tokens per batch => 4096/bucket_len docs/batch

_SQL_N_TOKENS = (
    "len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> ''))"
)


def _sql_bucket(expr: str) -> str:
    cases = " ".join(
        f"WHEN {expr} <= {b} THEN {b}" for b in _LEN_BUCKETS[:-1]
    )
    return f"CASE {cases} ELSE {_LEN_BUCKETS[-1]} END"


_BATCH_ORACLE = f"""
WITH toks AS (
  SELECT {_SQL_N_TOKENS} AS n_tokens FROM documents
), b AS (
  SELECT {_sql_bucket('n_tokens')} AS bucket_len,
         least(n_tokens, {_LEN_BUCKETS[-1]}) AS used
  FROM toks
)
SELECT cast(bucket_len as bigint) AS bucket_len,
       count(*) AS n_docs,
       cast(sum(used) as bigint) AS sum_tokens,
       round(1.0 - sum(used) * 1.0 / (count(*) * bucket_len), 6)
         AS padding_waste,
       cast(ceil(count(*) / floor({_BATCH_TOKEN_BUDGET} * 1.0 / bucket_len))
            as bigint) AS n_batches
FROM b
GROUP BY bucket_len
"""


@register("batch_by_length", oracle=_BATCH_ORACLE)
def batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-length-bucket batching report: docs, token mass, padding
    waste at the bucket's padded length, and batch count at a fixed
    token budget. One scan, ~|buckets| output rows."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.expr(r"filter(split(lower(text), '\\s+'), w -> w <> '')")
    ).cast("bigint")
    toks = docs.select(n_tokens.alias("n_tokens"))
    bucket = F.lit(_LEN_BUCKETS[-1])
    for b in reversed(_LEN_BUCKETS[:-1]):
        bucket = F.when(F.col("n_tokens") <= b, F.lit(b)).otherwise(bucket)
    used = F.least(F.col("n_tokens"), F.lit(_LEN_BUCKETS[-1]))
    assigned = toks.select(
        bucket.cast("bigint").alias("bucket_len"), used.alias("used")
    )
    docs_per_batch = F.floor(
        F.lit(float(_BATCH_TOKEN_BUDGET)) / F.col("bucket_len")
    )
    return (
        assigned.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("used").alias("sum_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("used")
                * F.lit(1.0)
                / (F.count(F.lit(1)) * F.col("bucket_len")),
                6,
            ).alias("padding_waste"),
        )
        .select(
            "bucket_len",
            "n_docs",
            "sum_tokens",
            "padding_waste",
            F.ceil(F.col("n_docs") / docs_per_batch)
            .cast("bigint")
            .alias("n_batches"),
        )
    )


# ---------------------------------------------------------------------------
# domain_temperature_mix
# ---------------------------------------------------------------------------

_TAU_SQL = "sqrt"  # tau = 0.5: weight = n_docs^0.5, IEEE-exact on both engines

_TEMP_ORACLE = """
WITH agg AS (
  SELECT source, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS n_chars
  FROM documents GROUP BY source
), w AS (
  SELECT *, cast(round(sqrt(n_docs), 9) as decimal(28, 9)) AS tw FROM agg
), sh AS (
  SELECT source, n_docs, n_chars,
         n_docs * 1.0 / (SELECT sum(n_docs) FROM w) AS current_share,
         cast(tw as double) / cast((SELECT sum(tw) FROM w) as double)
           AS temp_share
  FROM w
)
SELECT source, n_docs, n_chars,
       round(current_share, 6) AS current_share,
       round(temp_share, 6) AS temp_share,
       round(least(1.0,
             (SELECT min(current_share / temp_share) FROM sh)
             * temp_share / current_share), 6) AS sample_rate
FROM sh
"""


@register("domain_temperature_mix", oracle=_TEMP_ORACLE)
def domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sqrt-temperature source sampling plan: target shares proportional
    to n_docs^0.5, normalized so the scarcest-relative source keeps
    rate 1.0 (downsample-only). Windows run over the per-source
    aggregate only — never over document rows."""
    docs = table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    # round-then-decimal so the normalizing sum is exact and
    # order-independent (a raw double sum would vary with row order)
    tw = F.round(F.sqrt(F.col("n_docs")), 9).cast("decimal(28,9)")
    w_all = Window.partitionBy()
    weighted = agg.withColumn("tw", tw)
    shares = weighted.select(
        "source",
        "n_docs",
        "n_chars",
        (F.col("n_docs") * F.lit(1.0) / F.sum("n_docs").over(w_all)).alias(
            "current_share"
        ),
        (
            F.col("tw").cast("double")
            / F.sum("tw").over(w_all).cast("double")
        ).alias("temp_share"),
    )
    c = F.min(F.col("current_share") / F.col("temp_share")).over(w_all)
    return shares.select(
        "source",
        "n_docs",
        "n_chars",
        F.round("current_share", 6).alias("current_share"),
        F.round("temp_share", 6).alias("temp_share"),
        F.round(
            F.least(
                F.lit(1.0),
                c * F.col("temp_share") / F.col("current_share"),
            ),
            6,
        ).alias("sample_rate"),
    )
