"""Sources: format readers + the HTML-page ingestion path.

The reference ingests by fetching review pages into a cache dir, then
extracting cleaned text blocks (download_page_fun.py:207,
extract_text_fun.py:124). Spark-first, that is two concerns:

1. **Readers** — land any supported format (parquet/csv/json/text) into the
   canonical ``documents`` schema so every downstream operator is
   format-agnostic. Schemas are always explicit: schema inference is a
   full extra pass over 100 TB.
2. **HTML → blocks** — pure Column-expression markup stripping (script/style
   removal, tag→newline, entity unescape, whitespace collapse) followed by
   block split + min-length filter. No Python UDF: the whole extraction
   stays in whole-stage codegen. Patterns avoid regex backreferences so the
   same pipeline is expressible in RE2-based engines (and in the DuckDB
   parity oracle).

Network fetch itself is an IO plug-point (``fetch_page``) — stubbed, as in
the reference's cached-download design: the engine consumes the cache dir.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def fetch_page(url: str) -> str:
    """Network ingestion plug-point (reference: download_page_fun.py:207).
    The engine never fetches inline — pages land in a cache dir first."""
    raise NotImplementedError("fetch pages into a cache dir, then read_html_dir() it")


# ---------------------------------------------------------------------------
# Format readers → canonical documents schema.
# ---------------------------------------------------------------------------


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a documents table from any supported landed format."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        df = spark.read.options(header=True, multiLine=True, escape='"').schema(
            DOCUMENTS_SCHEMA
        ).csv(path)
    elif fmt == "json":
        df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    elif fmt == "orc":
        # Spark-native columnar alternative (predicate pushdown + column
        # pruning work the same as parquet; no extra package needed)
        df = spark.read.schema(DOCUMENTS_SCHEMA).orc(path)
    elif fmt == "text":
        # One document per line; ids are stable only per-file-order, so use
        # the (file, offset)-deterministic metadata columns.
        raw = spark.read.text(path).select(
            F.col("value").alias("text"),
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
        )
        df = raw.select(
            F.abs(F.xxhash64("source", "text")).alias("doc_id"),
            "text",
            F.lit(None).cast("string").alias("lang"),
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return df.select([f.name for f in DOCUMENTS_SCHEMA.fields])


# ---------------------------------------------------------------------------
# HTML → cleaned text blocks, all Column expressions (codegen, RE2-safe).
# ---------------------------------------------------------------------------

# Separate script/style patterns: RE2 (DuckDB oracle) has no backreferences.
_RE_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_RE_STYLE = r"(?is)<style[^>]*>.*?</style>"
_RE_BLOCK_TAGS = r"(?i)</(?:p|div|li|tr|h1|h2|h3|h4|h5|h6)>|<br[^>]*>"
_RE_ANY_TAG = r"<[^>]+>"
_ENTITIES = (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))

MIN_BLOCK_CHARS = 20


def html_to_text(col: Column) -> Column:
    """Strip markup, newline-separate block elements, unescape entities."""
    c = F.regexp_replace(col, _RE_SCRIPT, " ")
    c = F.regexp_replace(c, _RE_STYLE, " ")
    c = F.regexp_replace(c, _RE_BLOCK_TAGS, "\n")
    c = F.regexp_replace(c, _RE_ANY_TAG, " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def text_to_blocks(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Split newline-separated text into cleaned min-length blocks
    (extract_text_fun.py:124 semantics: trim, collapse whitespace, drop
    short blocks), keyed (doc_id, block_id)."""
    parts = df.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "raw")
    )
    cleaned = F.trim(F.regexp_replace("raw", r"\s+", " "))
    return (
        parts.select(
            "doc_id",
            (F.col("pos") + 1).cast("bigint").alias("block_id"),
            cleaned.alias("block_text"),
        )
        .withColumn("block_length", F.length("block_text").cast("bigint"))
        .where(F.col("block_length") > MIN_BLOCK_CHARS)
    )


def read_html_dir(spark: SparkSession, path: str) -> DataFrame:
    """Read a cache dir of HTML pages (one file per page) into cleaned
    blocks. wholetext keeps page integrity; at scale pages are small and
    many, so the scan parallelizes on files."""
    pages = spark.read.option("wholetext", True).text(path).select(
        F.col("value").alias("html"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
    )
    docs = pages.select(
        F.abs(F.xxhash64("source")).alias("doc_id"),
        html_to_text(F.col("html")).alias("text"),
        "source",
    )
    return text_to_blocks(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )


# ---------------------------------------------------------------------------
# Oracle-checked query: wrap the corpus in HTML in-query, then run the full
# strip→block pipeline. Proves the extraction semantics against DuckDB.
# ---------------------------------------------------------------------------

_HTML_ORACLE = rf"""
WITH pages AS (
  SELECT doc_id,
         '<html><head><style>p {{color: red}}</style></head><body>' ||
         '<script type="text/javascript">var x = 1 &lt; 2;</script>' ||
         '<p>' || replace(text, ' batch ', ' &amp;batch&nbsp;</p><p>') || '</p>' ||
         '</body></html>' AS html
  FROM documents
), stripped AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                 '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?i)</(?:p|div|li|tr|h1|h2|h3|h4|h5|h6)>|<br[^>]*>', chr(10), 'g'),
             '<[^>]+>', ' ', 'g'),
           '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
           '&quot;', '"'), '&#39;', '''') AS text
  FROM pages
), parts AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) AS block_id,
         unnest(string_split(text, chr(10))) AS raw
  FROM stripped
), blocks AS (
  SELECT doc_id, cast(block_id as bigint) AS block_id,
         trim(regexp_replace(raw, '\s+', ' ', 'g')) AS block_text
  FROM parts
)
SELECT doc_id, block_id, block_text,
       cast(length(block_text) as bigint) AS block_length
FROM blocks
WHERE length(block_text) > {MIN_BLOCK_CHARS}
"""


@register("source_html_extract", oracle=_HTML_ORACLE)
def source_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table

    docs = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><style>p {color: red}</style></head><body>'),
        F.lit('<script type="text/javascript">var x = 1 &lt; 2;</script>'),
        F.lit("<p>"),
        F.replace(F.col("text"), F.lit(" batch "), F.lit(" &amp;batch&nbsp;</p><p>")),
        F.lit("</p></body></html>"),
    )
    pages = docs.select("doc_id", html.alias("html"))
    stripped = pages.select("doc_id", html_to_text(F.col("html")).alias("text"))
    return text_to_blocks(stripped)
