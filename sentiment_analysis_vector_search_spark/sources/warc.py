"""WARC (Web ARChive) source — the Common-Crawl-shaped ingestion path a
training-data pipeline starts from.

Spark-first layout: WARC files are the unit of parallelism (the format
is record-framed inside a file, so a file parses independently on one
executor; Spark's `binaryFile` source never splits a file). Parsing is
an Arrow-batched `mapInPandas` over (path, content) rows — pure-stdlib
framing (header block + Content-Length payload slice per the ISO 28500
record grammar), no external WARC library. Gzipped inputs decompress
with the stdlib gzip reader, which handles the per-record concatenated
gzip members real Common Crawl `.warc.gz` files use.

Scale notes: a 1 GiB .warc.gz decompresses to ~4-5 GiB on ONE executor
task — size executor memory for the largest file, or pre-chunk crawls
into the ~1 GiB files CC already ships. Downstream of the parse,
everything is ordinary DataFrame work: the `warc_documents` adapter
reuses the codegen HTML→text pipeline (sources.html_to_text) and lands
the canonical documents schema, so every operator in the engine runs on
crawl data unchanged.
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string,"
    " content_type string, payload binary, payload_length bigint"
)

_MAX_HEADER_BYTES = 64 << 10  # a WARC header block past 64 KiB is corrupt


def _parse_warc_bytes(path: str, data: bytes):
    """Yield (record_id, warc_type, target_uri, content_type, payload)
    per WARC record. Framing per ISO 28500: a version line, header
    lines to a blank line, exactly Content-Length payload bytes, then
    CRLF CRLF before the next version line. Tolerates LF-only input
    and skips garbage between records by scanning to the next version
    marker."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start, start + _MAX_HEADER_BYTES)
        sep_len = 4
        if head_end < 0:
            head_end = data.find(b"\n\n", start, start + _MAX_HEADER_BYTES)
            sep_len = 2
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + sep_len
        payload = data[body_start : body_start + length]
        yield (
            headers.get("warc-record-id", ""),
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            headers.get("content-type", ""),
            payload,
        )
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC records as a DataFrame: (path, record_id, warc_type,
    target_uri, content_type, payload, payload_length). `.gz` inputs
    (including per-record-member Common Crawl gzip) decompress via the
    stdlib streaming reader."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    # GzipFile iterates concatenated members (the
                    # record-per-member layout CC ships)
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                for rid, wtype, uri, ctype, payload in _parse_warc_bytes(p, data):
                    rows.append((p, rid, wtype, uri, ctype, payload, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "content_type",
                    "payload",
                    "payload_length",
                ],
            )

    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_documents(spark: SparkSession, path: str) -> DataFrame:
    """HTTP `response` records of a WARC path as canonical documents:
    payload → HTTP-body slice → codegen HTML→text pipeline → one
    document per page (newline-joined cleaned blocks), doc_id =
    deterministic hash of (uri, record_id). The HTTP header/body split
    is Column-side (first blank line), so past the per-file parse the
    whole path is whole-stage codegen."""
    from . import MIN_BLOCK_CHARS, html_to_text

    recs = read_warc(spark, path).where(
        (F.col("warc_type") == "response") & (F.col("payload_length") > 0)
    )
    http = F.decode(F.col("payload"), "UTF-8")
    # HTTP body = after the first blank line (header/body separator);
    # locate returns 0 when absent → whole payload treated as body.
    sep_at = F.locate("\r\n\r\n", http)
    body = F.when(sep_at > 0, F.substring(http, sep_at + 4, 1 << 30)).otherwise(http)
    text = F.trim(F.regexp_replace(html_to_text(body), r"[ \t]+", " "))
    blocks = F.filter(
        F.transform(F.split(text, r"\n"), lambda b: F.trim(b)),
        lambda b: F.length(b) > MIN_BLOCK_CHARS,
    )
    doc_text = F.array_join(blocks, "\n")
    return recs.select(
        F.abs(F.xxhash64("target_uri", "record_id")).alias("doc_id"),
        doc_text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("target_uri").alias("source"),
        F.length(doc_text).cast("long").alias("n_chars"),
    ).where(F.col("n_chars") > 0)
