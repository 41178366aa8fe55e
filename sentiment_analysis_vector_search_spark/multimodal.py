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


# Byte semantics for any content (non-ASCII included): sizes via
# octet_length, lead byte / byte sums parsed from the hex encoding of the
# UTF-8 payload. DuckDB's md5(varchar) hashes the string's UTF-8 bytes, so
# payload_md5 needs no bridge.
_MM_ORACLE = """
WITH b AS (
  SELECT doc_id, text, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       'text-as-bytes' AS modality,
       n AS n_bytes,
       md5(text) AS payload_md5,
       CASE WHEN n = 0 THEN -1
            ELSE cast(concat('0x', substr(hx, 1, 2)) as int) END AS lead_byte,
       cast(coalesce(
         (SELECT sum(cast(concat('0x', substr(hx, cast(2 * (i - 1) + 1 as int), 2)) as int))
          FROM unnest(range(1, cast(least(n, 64) as bigint) + 1)) AS t(i)),
         0) as bigint) AS byte_sum_64
FROM b
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


# ---------------------------------------------------------------------------
# mm_frame_sample — 1-to-many mapInPandas: fixed-size "frames" are cut from
# each binary payload and every K-th frame is emitted (the video
# frame-sampling plumbing shape: one input row → many output rows, Arrow
# batches both ways, schema contract enforced). Frame decode itself would
# plug in at decode_image(); the byte-slicing + fan-out is the real part.
# ---------------------------------------------------------------------------

_FRAME_BYTES = 32
_FRAME_STRIDE = 4

_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, idxs, md5s = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for i in range(0, len(b) // _FRAME_BYTES, _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                # digest of the lowercase-hex encoding of the frame BYTES —
                # same convention as mm_resize_stub, so the SQL oracle can
                # reproduce it for arbitrary (non-UTF-8-aligned) byte slices.
                frame = b[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                md5s.append(hashlib.md5(frame.hex().encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_md5": pd.Series(md5s, dtype="object"),
            }
        )


_FRAME_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id, cast(fi as bigint) AS frame_idx,
       md5(substr(hx, cast(fi * {2 * _FRAME_BYTES} + 1 as int), {2 * _FRAME_BYTES})) AS frame_md5
FROM b, unnest(range(0, n // {_FRAME_BYTES})) AS t(fi)
WHERE fi % {_FRAME_STRIDE} = 0
"""


@register("mm_frame_sample", oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binary.mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# text_embed_stub — corpus embedding generation through the mapInPandas
# batch path: the plumbing (Arrow batches in, array<double> column out,
# partition-inherited parallelism) is exactly what a real encoder needs;
# the vector values are a deterministic hash fill so the DuckDB oracle can
# reproduce them bit-for-bit. Swap `_fake_embed` for a model forward pass.
# ---------------------------------------------------------------------------

_EMBED_DIM = 8
_MOD31 = (1 << 31) - 1


def _embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    def _fake_embed(doc_id: int) -> list[float]:
        out = []
        for i in range(_EMBED_DIM):
            h = int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:15], 16)
            out.append(round((h % _MOD31) / _MOD31, 6))
        return out

    for pdf in batches:
        ids, poss, vals = [], [], []
        for doc_id in pdf["doc_id"]:
            for i, v in enumerate(_fake_embed(doc_id)):
                ids.append(doc_id)
                poss.append(i)
                vals.append(v)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "val": pd.Series(vals, dtype="float64"),
            }
        )


# long format (scalar columns only) so the driver's order-insensitive
# value compare needs no array normalization.
_EMBED_ORACLE = f"""
SELECT doc_id, cast(i as bigint) AS pos,
       round(
         (cast(concat('0x', substr(md5(doc_id || ':' || i), 1, 15)) as bigint) % {_MOD31})
         * 1.0 / {_MOD31}, 6) AS val
FROM documents, unnest(range(0, {_EMBED_DIM})) AS t(i)
"""


@register("text_embed_stub", oracle=_EMBED_ORACLE)
def text_embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _embed_batches, schema="doc_id bigint, pos bigint, val double"
    )


# ---------------------------------------------------------------------------
# mm_resize_stub — "resize" plumbing: each payload is downsampled by a
# fixed byte stride (stand-in for image resize / audio downsample; swap the
# slice for a real codec call in decode_image). Emits the resized payload's
# size + digest so the oracle verifies the byte-exact transform.
# ---------------------------------------------------------------------------

_RESIZE_STRIDE = 4


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        orig_n, new_n, digests = [], [], []
        for payload in pdf["payload"]:
            b = bytes(payload)
            small = b[:: _RESIZE_STRIDE]
            orig_n.append(len(b))
            new_n.append(len(small))
            # digest of the lowercase-hex encoding of the strided BYTES:
            # byte semantics the SQL oracle reproduces for any content
            # (non-ASCII, empty) — varchar slicing would count characters.
            digests.append(hashlib.md5(small.hex().encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": pd.Series(orig_n, dtype="int64"),
                "resized_bytes": pd.Series(new_n, dtype="int64"),
                "resized_md5": pd.Series(digests, dtype="object"),
            }
        )


# Byte semantics end-to-end: hex the UTF-8 payload once, slice hex-digit
# pairs at strided byte positions, digest the reassembled hex string. The
# LEFT JOIN keeps empty payloads (their strided slice is empty, md5('')) —
# a bare unnest+GROUP BY would drop them.
_RESIZE_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
), pos AS (
  SELECT doc_id, unnest(range(1, n + 1, {_RESIZE_STRIDE})) AS p FROM b
), agg AS (
  SELECT pos.doc_id,
         string_agg(substring(b.hx, cast(2 * (p - 1) + 1 as int), 2),
                    '' ORDER BY p) AS hexs
  FROM pos JOIN b ON pos.doc_id = b.doc_id GROUP BY pos.doc_id
)
SELECT b.doc_id AS doc_id, b.n AS orig_bytes,
       cast((b.n + {_RESIZE_STRIDE} - 1) // {_RESIZE_STRIDE} as bigint)
         AS resized_bytes,
       md5(coalesce(a.hexs, '')) AS resized_md5
FROM b LEFT JOIN agg a ON b.doc_id = a.doc_id
"""


@register("mm_resize_stub", oracle=_RESIZE_ORACLE)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binary.mapInPandas(
        _resize_batches,
        schema="doc_id bigint, orig_bytes bigint, resized_bytes bigint, resized_md5 string",
    )


# ---------------------------------------------------------------------------
# mm_audio_energy_stub — windowed audio feature extraction (the VAD /
# silence-trim plumbing shape): payload bytes read as 8-bit PCM samples,
# cut into fixed non-overlapping windows, each window reduced to integer
# energy + zero-crossing count and gated by an energy threshold. A real
# pipeline swaps the byte interpretation for a librosa/torchaudio decode
# at decode_image()'s plug-point; the windowing, the Arrow 1-to-many
# fan-out, and the per-window feature contract are the real parts — and
# every feature is EXACT INTEGER arithmetic, so the oracle hash-matches
# with zero float-parity surface.
# ---------------------------------------------------------------------------

_AUDIO_WIN = 16  # samples per window (trailing partial window dropped)
_AUDIO_VAD_T = 8000  # integer energy gate: sum((v-128)^2) over the window

_AUDIO_SCHEMA = (
    "doc_id bigint, win_idx bigint, energy bigint, zero_crossings int,"
    " is_voiced boolean"
)


def _audio_windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, ws, es, zs = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64) - 128
            for w in range(len(x) // _AUDIO_WIN):
                seg = x[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN]
                ids.append(doc_id)
                ws.append(w)
                es.append(int((seg * seg).sum()))
                zs.append(int(((seg[:-1] * seg[1:]) < 0).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "win_idx": pd.Series(ws, dtype="int64"),
                "energy": pd.Series(es, dtype="int64"),
                "zero_crossings": pd.Series(zs, dtype="int32"),
                "is_voiced": pd.Series(
                    [e >= _AUDIO_VAD_T for e in es], dtype="bool"
                ),
            }
        )


_AUDIO_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
), samples AS (
  SELECT doc_id,
         cast(s // {_AUDIO_WIN} as bigint) AS win_idx,
         cast(s % {_AUDIO_WIN} as int) AS j,
         cast(concat('0x', substr(hx, cast(2 * s + 1 as int), 2)) as int) - 128 AS v
  FROM b, unnest(range(0, (n // {_AUDIO_WIN}) * {_AUDIO_WIN})) AS t(s)
), signed AS (
  SELECT doc_id, win_idx, j, v,
         lead(v) OVER (PARTITION BY doc_id, win_idx ORDER BY j) AS nv
  FROM samples
), agg AS (
  SELECT doc_id, win_idx,
         cast(sum(v * v) as bigint) AS energy,
         cast(sum(CASE WHEN nv IS NOT NULL AND v * nv < 0 THEN 1 ELSE 0 END)
              as int) AS zero_crossings
  FROM signed GROUP BY doc_id, win_idx
)
SELECT doc_id, win_idx, energy, zero_crossings,
       energy >= {_AUDIO_VAD_T} AS is_voiced
FROM agg
"""


@register("mm_audio_energy_stub", oracle=_AUDIO_ORACLE)
def mm_audio_energy_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PCM energy/ZCR features over text-as-bytes payloads
    (genuine binary column; decode is the declared plug-point).

    Scale shape: inherited scan partitioning → one Arrow crossing →
    windows-per-payload fan-out, no shuffle anywhere; features are exact
    integers (no float parity surface at any SF)."""
    docs = table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binary.mapInPandas(_audio_windows, schema=_AUDIO_SCHEMA)
