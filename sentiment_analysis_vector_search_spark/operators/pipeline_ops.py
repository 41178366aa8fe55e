"""Training-data pipeline gates + run metrics — LLM-pipeline extensions.

Four operators a 100 TB pretraining-data pipeline runs between ingest and
shard-writing, all pure Column expressions (whole-stage codegen, map-only —
no shuffle except the metrics aggregate):

- ``text_pii_redact`` — regex redaction of emails/URLs/phone numbers with
  per-doc counts. Map-only: scales linearly, no shuffle at all.
- ``text_quality_gate`` — C4-style keep/drop gates (word count, stopword
  evidence, terminal punctuation, max word length) with per-gate flags so
  drops are auditable.
- ``sample_stratified`` — deterministic per-language hash sampling (md5 of
  doc_id → percentile); reproducible across runs and engines, unlike
  ``rand()``-based sampling.
- ``run_metrics`` — the reference's MLflow run artifact
  (mlflow_tracking.py:94: total/positive/negative/neutral counts + ratios)
  as a (metric, value) DataFrame, computed with one aggregate then
  unpivoted.

The synthetic corpus contains no PII, so ``text_pii_redact`` stamps
deterministic synthetic contact strings in-query (both engines stamp
identically) — the machinery under test is the redaction, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, table
from ..functions import sentiment as S
from ..functions.hashing import md5_long, sql_md5_long
from ..registry import register

# ---------------------------------------------------------------------------
# text_pii_redact
# ---------------------------------------------------------------------------

_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_URL = r"https?://[^\s]+"
_RE_PHONE = r"\+[0-9][0-9 ()-]{6,}[0-9]"

_PII_ORACLE = f"""
WITH stamped AS (
  SELECT doc_id,
         text || ' Contact: user' || cast(doc_id as varchar) ||
         '@example.com or +1 (555) 010-' || cast(1000 + doc_id % 9000 as varchar) ||
         ' via https://r.example/' || cast(doc_id as varchar) AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{_RE_EMAIL}', '<EMAIL>', 'g'),
         '{_RE_URL}', '<URL>', 'g'),
         '{_RE_PHONE}', '<PHONE>', 'g') AS redacted,
       cast(len(regexp_extract_all(text, '{_RE_EMAIL}')) > 0 as int) AS has_email,
       cast(len(regexp_extract_all(text, '{_RE_EMAIL}')) as int) AS n_emails,
       cast(len(regexp_extract_all(text, '{_RE_URL}')) as int) AS n_urls,
       cast(len(regexp_extract_all(text, '{_RE_PHONE}')) as int) AS n_phones
FROM stamped
"""


@register("text_pii_redact", oracle=_PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    stamped = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            F.lit(" via https://r.example/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _RE_EMAIL, "<EMAIL>"),
            _RE_URL,
            "<URL>",
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return stamped.select(
        "doc_id",
        red.alias("redacted"),
        (F.regexp_count("text", F.lit(_RE_EMAIL)) > 0).cast("int").alias("has_email"),
        F.regexp_count("text", F.lit(_RE_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(_RE_URL)).cast("int").alias("n_urls"),
        F.regexp_count("text", F.lit(_RE_PHONE)).cast("int").alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# text_quality_gate — C4-style filters with auditable per-gate flags.
# ---------------------------------------------------------------------------

_MIN_WORDS = 5
_MIN_STOPWORD_HITS = 1
_MAX_WORD_CHARS = 25

_STOP_SQL = ", ".join(f"'{w}'" for w in S.STOPWORDS)

_GATE_ORACLE = f"""
WITH feat AS (
  SELECT doc_id,
         len(string_split_regex(lower(text), '\\s+')) AS n_words,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x in ({_STOP_SQL}))) AS stop_hits,
         regexp_matches(text, '[.!?]\\s*$') AS ends_sentence,
         len(list_filter(string_split_regex(text, '\\s+'),
                         x -> length(x) > {_MAX_WORD_CHARS})) > 0 AS has_long_word
  FROM documents
)
SELECT doc_id,
       cast(n_words as bigint) AS n_words,
       cast(stop_hits as bigint) AS stop_hits,
       ends_sentence,
       has_long_word,
       (n_words >= {_MIN_WORDS} AND stop_hits >= {_MIN_STOPWORD_HITS}
        AND NOT has_long_word) AS keep
FROM feat
"""


def gate_columns() -> dict[str, "F.Column"]:
    """The C4-style gate expressions over a `text` column — shared by the
    batch operator and the streaming gate (stream_ops.stream_quality_gate)
    so both paths apply IDENTICAL semantics (stateless Columns are
    streaming-safe by construction)."""
    toks = S.tokens(F.col("text"))
    raw_toks = F.split(F.col("text"), r"\s+")
    n_words = F.size(toks).cast("bigint")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*S.STOPWORDS))).cast("bigint")
    ends_sentence = F.col("text").rlike(r"[.!?]\s*$")
    has_long_word = (
        F.size(F.filter(raw_toks, lambda x: F.length(x) > _MAX_WORD_CHARS)) > 0
    )
    keep = (
        (n_words >= _MIN_WORDS)
        & (stop_hits >= _MIN_STOPWORD_HITS)
        & ~has_long_word
    )
    return {
        "n_words": n_words,
        "stop_hits": stop_hits,
        "ends_sentence": ends_sentence,
        "has_long_word": has_long_word,
        "keep": keep,
    }


@register("text_quality_gate", oracle=_GATE_ORACLE)
def text_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    cols = gate_columns()
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


# ---------------------------------------------------------------------------
# sample_stratified — deterministic hash sampling with per-language rates.
# At scale this is the shard-downsampling step: map-only, reproducible,
# rate-tunable per stratum without a shuffle or a random seed race.
# ---------------------------------------------------------------------------

_RATES = {"en": 80, "es": 50, "fr": 50, "de": 25}  # keep-percent per lang
_DEFAULT_RATE = 10

_rate_sql = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang,
       cast({sql_md5_long("cast(doc_id as varchar)")} % 100 as int) AS pctile
FROM documents
WHERE {sql_md5_long("cast(doc_id as varchar)")} % 100 < {_rate_sql}
"""


@register("sample_stratified", oracle=_SAMPLE_ORACLE)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pctile = (md5_long(F.col("doc_id").cast("string")) % 100).cast("int")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    return (
        docs.select("doc_id", "lang", pctile.alias("pctile"), rate.alias("rate"))
        .where(F.col("pctile") < F.col("rate"))
        .drop("rate")
    )


# ---------------------------------------------------------------------------
# run_metrics — the MLflow tracking artifact as a DataFrame.
# ---------------------------------------------------------------------------

_METRICS_ORACLE = """
WITH {classified_cte}
c AS (
  SELECT count(*) AS total,
         sum(CASE WHEN sentiment = 'POSITIVE' THEN 1 ELSE 0 END) AS pos,
         sum(CASE WHEN sentiment = 'NEGATIVE' THEN 1 ELSE 0 END) AS neg,
         sum(CASE WHEN sentiment = 'NEUTRAL' THEN 1 ELSE 0 END) AS neu,
         avg(confidence) AS conf
  FROM labeled
)
SELECT metric, round(value, 6) AS value FROM (
  SELECT 'total_reviews' AS metric, cast(total as double) AS value FROM c
  UNION ALL SELECT 'positive_count', cast(pos as double) FROM c
  UNION ALL SELECT 'negative_count', cast(neg as double) FROM c
  UNION ALL SELECT 'neutral_count', cast(neu as double) FROM c
  UNION ALL SELECT 'positive_ratio', pos * 1.0 / total FROM c
  UNION ALL SELECT 'negative_ratio', neg * 1.0 / total FROM c
  UNION ALL SELECT 'neutral_ratio', neu * 1.0 / total FROM c
  UNION ALL SELECT 'mean_confidence', conf FROM c
)
"""


def _metrics_oracle() -> str:
    return _METRICS_ORACLE.format(classified_cte=S.SQL_CLASSIFIED_CTE + ",")


@register("run_metrics", oracle=_metrics_oracle())
def run_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sentiment_ops import classified

    cls = classified(spark, sf_dir)
    c = cls.agg(
        F.count(F.lit(1)).cast("double").alias("total_reviews"),
        F.sum((F.col("sentiment") == "POSITIVE").cast("int")).cast("double").alias("positive_count"),
        F.sum((F.col("sentiment") == "NEGATIVE").cast("int")).cast("double").alias("negative_count"),
        F.sum((F.col("sentiment") == "NEUTRAL").cast("int")).cast("double").alias("neutral_count"),
        F.avg("confidence").alias("mean_confidence"),
    ).withColumns(
        {
            "positive_ratio": F.col("positive_count") / F.col("total_reviews"),
            "negative_ratio": F.col("negative_count") / F.col("total_reviews"),
            "neutral_ratio": F.col("neutral_count") / F.col("total_reviews"),
        }
    )
    names = (
        "total_reviews", "positive_count", "negative_count", "neutral_count",
        "positive_ratio", "negative_ratio", "neutral_ratio", "mean_confidence",
    )
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return c.selectExpr(
        f"stack({len(names)}, {stack}) AS (metric, value)"
    ).select("metric", F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# text_char_trigram_score — corpus-statistics fluency proxy: per-doc mean
# corpus frequency of its character trigrams (gibberish scores low; no
# logs, so the arithmetic is exactly reproducible cross-engine). Two
# passes: trigram corpus counts (df-capped shuffle on trigram), then a
# trigram→doc join back and a decimal-exact per-doc mean.
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH grams AS (
  SELECT doc_id, substring(lower(text), cast(p as int), 3) AS g
  FROM documents, unnest(range(1, greatest(length(text) - 1, 1))) AS t(p)
  WHERE length(text) >= 3
), corpus AS (
  SELECT g, count(*) AS cnt FROM grams GROUP BY g
), total AS (
  SELECT cast(sum(cnt) as double) AS tot FROM corpus
)
SELECT doc_id,
       count(*) AS n_grams,
       round(cast(sum(cast(cnt / tot as decimal(30,10))) as double) / count(*), 6)
         AS avg_gram_freq
FROM grams JOIN corpus USING (g), total
GROUP BY doc_id
"""


@register("text_char_trigram_score", oracle=_TRI_ORACLE)
def text_char_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan shape (r6 rewrite of the r5-flagged double-explode): the real
    # costs were (a) the gram relation shuffling into the corpus-count
    # join and (b) the explode running on ONE core (the test corpus scans
    # as a single split — fan_out fixes that; no-op on real multi-split
    # layouts). The corpus-frequency relation, bounded by charset^3
    # distinct trigrams at ANY corpus size, is broadcast, so the gram
    # side is never shuffled; the only exchange left is the doc_id
    # groupBy (map-side partial agg). The gram explode IS still computed
    # in both passes — measured A/B vs a localCheckpoint materialization:
    # recompute 1.66s vs checkpoint 2.09s at sf0.1 (checkpoint write+read
    # of 1.5M rows costs more than a second parallel scan), and at 100 TB
    # the choice is starker: persisting a ~3x gram expansion of the
    # corpus is storage-prohibitive while a second columnar scan is not.
    docs = fan_out(spark, table(spark, sf_dir, "documents")).where(
        F.length("text") >= 3
    )
    grams = docs.select(
        "doc_id",
        F.explode_outer(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 1)),"
                " p -> substring(lower(text), p, 3))"
            )
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    corpus = grams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    total = corpus.agg(F.sum("cnt").cast("double").alias("tot"))
    freq = F.col("cnt") / F.col("tot")
    return (
        grams.join(F.broadcast(corpus), "g")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(freq.cast("decimal(30,10)")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("avg_gram_freq"),
        )
    )


# ---------------------------------------------------------------------------
# docs_source_profile — per-source quality audit (the C4-style "which
# sources are worth keeping" report): volume, exact-dup rate, mean quality
# and confidence per source, composed from the classify + dedup operators
# in one fused plan.
# ---------------------------------------------------------------------------


def _source_profile_oracle() -> str:
    from ..functions import sentiment as S
    from ..functions.hashing import sql_md5_long
    from ..functions.stable import sql_davg

    return f"""
WITH {S.SQL_CLASSIFIED_CTE},
scored AS (
  SELECT *, {S.SQL_QUALITY_EXPR} AS quality FROM labeled
), hashed AS (
  SELECT *, {sql_md5_long('text')} AS text_hash FROM scored
), dup AS (
  SELECT *, count(*) OVER (PARTITION BY text_hash) > 1 AS is_dup FROM hashed
)
SELECT source,
       count(*) AS n_docs,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_rate,
       {sql_davg('quality', 'avg_quality')},
       {sql_davg('confidence', 'avg_confidence')}
FROM dup
GROUP BY source
"""


@register("docs_source_profile", oracle=_source_profile_oracle())
def docs_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.stable import davg
    from .sentiment_ops import classified

    lab = classified(spark, sf_dir)
    scored = lab.withColumn(
        "quality", S.quality_score(F.col("text"), F.col("sentiment"))
    ).withColumn("text_hash", md5_long(F.col("text")))
    w = Window.partitionBy("text_hash")
    dup = scored.withColumn("is_dup", F.count(F.lit(1)).over(w) > 1)
    return dup.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)) * F.lit(1.0)
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
        davg(F.col("quality")).alias("avg_quality"),
        davg(F.col("confidence")).alias("avg_confidence"),
    )


# ---------------------------------------------------------------------------
# sample_importance — deterministic importance sampling: keep probability
# proportional to quality (capped at 1), decided by the doc's md5 hash
# percentile. Map-only, seedless, reproducible across engines and runs —
# the data-mixing primitive for weighting high-quality sources up.
# ---------------------------------------------------------------------------


def _importance_oracle() -> str:
    from ..functions import sentiment as S
    from ..functions.hashing import sql_md5_int31, MOD31

    return f"""
WITH {S.SQL_CLASSIFIED_CTE},
scored AS (
  SELECT *, {S.SQL_QUALITY_EXPR} AS quality FROM labeled
), w AS (
  SELECT *, least(quality / 2.0, 1.0) AS keep_p,
         ({sql_md5_int31("cast(doc_id as varchar)")}) * 1.0 / {MOD31} AS u
  FROM scored
)
SELECT doc_id, lang, round(keep_p, 6) AS keep_p
FROM w WHERE u < keep_p
"""


@register("sample_importance", oracle=_importance_oracle())
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import MOD31, md5_int31
    from .sentiment_ops import classified

    lab = classified(spark, sf_dir)
    scored = lab.withColumn(
        "quality", S.quality_score(F.col("text"), F.col("sentiment"))
    )
    keep_p = F.least(F.col("quality") / 2.0, F.lit(1.0))
    u = md5_int31(F.col("doc_id").cast("string")) * F.lit(1.0) / F.lit(MOD31)
    return (
        scored.withColumn("keep_p", keep_p)
        .withColumn("u", u)
        .where(F.col("u") < F.col("keep_p"))
        .select("doc_id", "lang", F.round("keep_p", 6).alias("keep_p"))
    )


# ---------------------------------------------------------------------------
# fix_company_name — metadata-label normalization, the batch re-labeling the
# reference ships as fix_company_name.py (a wrong company label cached in
# generated artifacts gets rewritten everywhere it appears). Re-expressed as
# data: canonicalize the ``source`` label (zero-pad the numeric suffix so
# src1/src10 sort and group correctly) and rewrite any occurrence of the
# legacy label inside the text body. Pure column expressions — a map-only
# rewrite with no shuffle, the 100 TB shape for bulk re-labeling.
# Parity: fix_company_name.py:29-120 (find wrong label, replace in config
# and artifacts, report what changed).
# ---------------------------------------------------------------------------

_FIXNAME_ORACLE = """
SELECT doc_id,
       source,
       'src' || lpad(substr(source, 4), 2, '0') AS source_fixed,
       source <> 'src' || lpad(substr(source, 4), 2, '0') AS changed,
       replace(text, source, 'src' || lpad(substr(source, 4), 2, '0')) AS text_fixed
FROM documents
"""


@register("fix_company_name", oracle=_FIXNAME_ORACLE)
def fix_company_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    fixed = F.concat(
        F.lit("src"), F.lpad(F.expr("substring(source, 4)"), 2, "0")
    )
    return docs.select(
        "doc_id",
        "source",
        fixed.alias("source_fixed"),
        (F.col("source") != fixed).alias("changed"),
        F.expr(
            "replace(text, source, concat('src', lpad(substring(source, 4), 2, '0')))"
        ).alias("text_fixed"),
    )
