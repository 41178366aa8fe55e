"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by an Arrow-batched ``mapInPandas`` feature extractor.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image`` raises NotImplementedError); what is real — and tested —
is everything Spark-side: the binary column representation, the Arrow batch
path through mapInPandas, the output schema contract, and partition-level
batching. The deterministic fake features (byte length, md5, leading-byte
stats) let the DuckDB oracle hash-match the full plumbing.

At 100 TB the same pipeline shape holds: binary payloads stay columnar in
parquet, mapInPandas streams Arrow batches per partition (no per-row Python
crossings), and partitioning is inherited from the scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import table
from .registry import register


def decode_image(payload: bytes) -> "object":
    """Real decoder plug-point. Image/audio libs are not available in this
    environment; swap in PIL/librosa here on a real cluster."""
    raise NotImplementedError("media codecs unavailable; use extract_features stub")


_OUT_SCHEMA = "doc_id bigint, modality string, n_bytes bigint, payload_md5 string, lead_byte int, byte_sum_64 bigint"


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(len).astype("int64"),
                "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "lead_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "byte_sum_64": payloads.map(lambda b: int(sum(b[:64]))).astype("int64"),
            }
        )


_MM_ORACLE = """
SELECT doc_id,
       'text-as-bytes' AS modality,
       length(text) AS n_bytes,
       md5(text) AS payload_md5,
       cast(ascii(substring(text, 1, 1)) as int) AS lead_byte,
       cast((SELECT sum(ascii(substring(text, cast(i as int), 1)))
             FROM unnest(range(1, cast(least(length(text), 64) as bigint) + 1)) AS t(i)) as bigint) AS byte_sum_64
FROM documents
"""


@register("mm_decode_stub", oracle=_MM_ORACLE)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary multimodal pipeline over text-as-bytes payloads (the corpus has
    no real media; the payload column is genuine ``binary``)."""
    docs = table(spark, sf_dir, "documents")
    binary = docs.select(
        "doc_id",
        F.lit("text-as-bytes").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return binary.mapInPandas(_extract_features, schema=_OUT_SCHEMA)
