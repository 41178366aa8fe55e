"""Report-header data surface — the reference PDF generator's
source-name normalization, re-expressed as Column expressions.

Parity target: ``extract_source_info_from_db``
(pdf_generation/pdf_data_loader.py:12, duplicated at
generate_pdf_fun.py:99 and Context_analyzer_RoBERTa_fun.py:136): map a
comment's ingest ``file_path`` to the display source printed in the PDF
header —

- path contains ``tripadvisor`` (case-insensitive) -> ``TripAdvisor``
- contains ``google``                              -> ``Google Reviews``
- contains ``yelp``                                -> ``Yelp``
- otherwise: the basename, with ``_`` and ``-`` replaced by spaces and
  the ``.html`` / ``.txt`` suffixes stripped (pdf_generation/pdf_data_loader.py:44-49),
  in exactly that replace order.

The synthetic ``documents`` table carries opaque ``source`` tags, not
ingest paths, so both engines first synthesize a deterministic
``file_path`` from (doc_id, source) — the same CASE expression in the
Spark plan and the oracle SQL — covering all four mapping branches.

Scale notes: both queries are pure narrow Column expressions over one
``documents`` scan (string ops stay inside WholeStageCodegen); the
report rollup adds one partial-aggregated groupBy on a ~#sources-row
key. Nothing leaves the JVM, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# deterministic synthetic ingest path: one branch per reference mapping
# rule plus one prettify-only branch (uppercase, no extension hit).
_PATH_SQL = """CASE cast(doc_id % 5 AS int)
  WHEN 0 THEN '/crawl/tripadvisor_reviews/' || source || '.html'
  WHEN 1 THEN '/crawl/Google-Maps/' || source || '.txt'
  WHEN 2 THEN '/crawl/yelp/' || source || '_export.html'
  WHEN 3 THEN '/uploads/' || source || '_user-feedback.html'
  ELSE '/uploads/' || upper(source) || '-comments'
END"""

# pdf_generation/pdf_data_loader.py:44-49 — basename, then the literal replace chain
# in reference order ('_'->' ', '-'->' ', strip '.html', strip '.txt').
# replace() is literal (not regex) in BOTH Spark SQL and DuckDB.
_PRETTY_SQL = (
    "replace(replace(replace(replace("
    "regexp_extract(file_path, '([^/]+)$', 1),"
    " '_', ' '), '-', ' '), '.html', ''), '.txt', '')"
)

_FIX_SQL = f"""CASE
  WHEN lower(file_path) LIKE '%tripadvisor%' THEN 'TripAdvisor'
  WHEN lower(file_path) LIKE '%google%' THEN 'Google Reviews'
  WHEN lower(file_path) LIKE '%yelp%' THEN 'Yelp'
  ELSE {_PRETTY_SQL}
END"""


def fix_source_name_col(file_path: Column) -> Column:
    """``extract_source_info_from_db``'s per-path mapping as a Column
    (pdf_generation/pdf_data_loader.py:38-53): brand substrings first, else prettified
    basename. Reusable anywhere a display source is wanted (data cards,
    report headers)."""
    low = F.lower(file_path)
    pretty = F.regexp_extract(file_path, r"([^/]+)$", 1)
    pretty = F.replace(pretty, F.lit("_"), F.lit(" "))
    pretty = F.replace(pretty, F.lit("-"), F.lit(" "))
    pretty = F.replace(pretty, F.lit(".html"), F.lit(""))
    pretty = F.replace(pretty, F.lit(".txt"), F.lit(""))
    return (
        F.when(low.contains("tripadvisor"), F.lit("TripAdvisor"))
        .when(low.contains("google"), F.lit("Google Reviews"))
        .when(low.contains("yelp"), F.lit("Yelp"))
        .otherwise(pretty)
    )


def _with_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", "n_chars", F.expr(_PATH_SQL).alias("file_path")
    )


_FIX_ORACLE = f"""
WITH pathed AS (
  SELECT doc_id, {_PATH_SQL} AS file_path FROM documents
)
SELECT doc_id, file_path, {_FIX_SQL} AS display_source FROM pathed
"""


@register("fix_source_name", oracle=_FIX_ORACLE)
def fix_source_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document display source (reference PDF-header parity).

    Scale shape: narrow projection, zero shuffles — the whole mapping is
    one codegen stage over the documents scan."""
    pathed = _with_paths(spark, sf_dir)
    return pathed.select(
        "doc_id",
        "file_path",
        fix_source_name_col(F.col("file_path")).alias("display_source"),
    )


_REPORT_ORACLE = f"""
WITH pathed AS (
  SELECT doc_id, n_chars, {_PATH_SQL} AS file_path FROM documents
), named AS (
  SELECT doc_id, n_chars, {_FIX_SQL} AS display_source FROM pathed
)
SELECT display_source, count(*) AS n_docs,
       cast(sum(n_chars) as bigint) AS total_chars,
       round(sum(n_chars) * 1.0 / count(*), 6) AS avg_chars
FROM named GROUP BY display_source
"""


@register("q_source_report", oracle=_REPORT_ORACLE)
def q_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-display-source rollup (the PDF header's corpus summary line):
    document count, total and mean length per normalized source.

    Scale shape: one partial-agg groupBy on a key with ~#sources
    distinct values (map-side combine collapses the fact rows before the
    shuffle); length sums are exact BIGINT arithmetic, the mean is a
    single double division rounded identically on both engines."""
    pathed = _with_paths(spark, sf_dir)
    named = pathed.select(
        fix_source_name_col(F.col("file_path")).alias("display_source"), "n_chars"
    )
    return named.groupBy("display_source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "avg_chars"
        ),
    )
