"""Lexicon-based sentiment classification — deterministic stand-in for the
reference's DistilBERT pipeline with identical downstream semantics.

Reference parity (see SURVEY.md §1):
- ``analyze_sentiment_enhanced`` (Context_analyzer_RoBERTa_fun.py:170): binary
  raw label + confidence, 3-class simulation via confidence threshold.
- ``compute_original_score`` (Context_analyzer_RoBERTa_fun.py:200): 0 below a
  word-count floor, 0.05 per extra word, 0.1 per sentiment-matched keyword.

The model is swapped for a deterministic scorer (keyword hit counts → label,
margin → confidence) so the full pipeline is reproducible, SQL-expressible
for the DuckDB oracle, and runs JVM-side in whole-stage codegen (no Python
UDF in the hot path — this is the 100 TB-scale requirement). A transformer
can be plugged back in as an Arrow pandas_udf producing the same
(raw_label, confidence) contract; see operators/representatives.py for the
MLlib vectorization path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POSITIVE_WORDS = ("fast", "good", "excellent", "nice")
NEGATIVE_WORDS = ("slow", "bad", "terrible", "dup")
NEUTRAL_WORDS = ("table", "scan", "visit", "stay")
CONFIDENCE_THRESHOLD = 0.75
SENTENCE_LENGTH = 4  # reference default: word-count floor for quality score

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# ---------------------------------------------------------------------------
# Spark Column expressions
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def _hit_count(text: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens(text), lambda x: x.isin(*words)))


def pos_hits(text: Column) -> Column:
    return _hit_count(text, POSITIVE_WORDS)


def neg_hits(text: Column) -> Column:
    return _hit_count(text, NEGATIVE_WORDS)


def raw_label(pos: Column, neg: Column) -> Column:
    return F.when(pos >= neg, F.lit("POSITIVE")).otherwise(F.lit("NEGATIVE"))


def confidence(pos: Column, neg: Column) -> Column:
    """Margin-based confidence in [0.5, 1]; 0.5 when no lexicon hits."""
    total = pos + neg
    return F.round(
        F.when(total == 0, F.lit(0.5)).otherwise(
            0.5 + 0.5 * F.abs(pos - neg) / total
        ),
        6,
    )


def sentiment(raw: Column, conf: Column, threshold: float = CONFIDENCE_THRESHOLD) -> Column:
    """3-class simulation: high-confidence keeps the raw label, else NEUTRAL."""
    return F.when(conf > threshold, raw).otherwise(F.lit("NEUTRAL"))


def _presence(text: Column, words: tuple[str, ...]) -> Column:
    c = F.lit(0)
    low = F.lower(text)
    for w in words:
        c = c + low.contains(w).cast("int")
    return c


def quality_score(text: Column, sent: Column) -> Column:
    """compute_original_score parity: word-count base + keyword presence bonus."""
    n_words = F.size(tokens(text))
    bonus_words = (
        F.when(sent == "POSITIVE", _presence(text, POSITIVE_WORDS))
        .when(sent == "NEGATIVE", _presence(text, NEGATIVE_WORDS))
        .otherwise(_presence(text, NEUTRAL_WORDS))
    )
    return F.round(
        F.when(n_words <= SENTENCE_LENGTH, F.lit(0.0)).otherwise(
            (n_words - SENTENCE_LENGTH) * F.lit(0.05) + bonus_words * F.lit(0.1)
        ),
        6,
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments (identical formulas, identical rounding)
# ---------------------------------------------------------------------------

_SQL_TOKENS = r"string_split_regex(lower(text), '\s+')"


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def sql_hits(words: tuple[str, ...]) -> str:
    return f"len(list_filter({_SQL_TOKENS}, x -> x in ({_sql_in_list(words)})))"


def sql_presence(words: tuple[str, ...]) -> str:
    return " + ".join(
        f"cast(contains(lower(text), '{w}') as int)" for w in words
    )


# CTE producing the classified documents relation; prepend to oracle queries.
SQL_CLASSIFIED_CTE = f"""
classified AS (
  SELECT doc_id, text, lang, source, n_chars, pos_hits, neg_hits,
         CASE WHEN pos_hits >= neg_hits THEN 'POSITIVE' ELSE 'NEGATIVE' END AS raw_label,
         round(CASE WHEN pos_hits + neg_hits = 0 THEN 0.5
               ELSE 0.5 + 0.5 * abs(pos_hits - neg_hits) / (pos_hits + neg_hits) END, 6) AS confidence
  FROM (
    SELECT *, {sql_hits(POSITIVE_WORDS)} AS pos_hits, {sql_hits(NEGATIVE_WORDS)} AS neg_hits
    FROM documents
  )
),
labeled AS (
  SELECT *, CASE WHEN confidence > {CONFIDENCE_THRESHOLD} THEN raw_label ELSE 'NEUTRAL' END AS sentiment
  FROM classified
)
"""

SQL_QUALITY_EXPR = f"""
round(CASE WHEN len({_SQL_TOKENS}) <= {SENTENCE_LENGTH} THEN 0.0
      ELSE (len({_SQL_TOKENS}) - {SENTENCE_LENGTH}) * 0.05
           + (CASE WHEN sentiment = 'POSITIVE' THEN {sql_presence(POSITIVE_WORDS)}
                   WHEN sentiment = 'NEGATIVE' THEN {sql_presence(NEGATIVE_WORDS)}
                   ELSE {sql_presence(NEUTRAL_WORDS)} END) * 0.1 END, 6)
"""
