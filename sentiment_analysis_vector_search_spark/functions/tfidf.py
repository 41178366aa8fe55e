"""Shared TF-IDF SQL building blocks.

Lives in ``functions`` (registration-free) so operator modules that only
need the oracle CTE (similarity's rag_retrieve) don't import the full
``operators.text_ops`` module — module import order decides driver grading
rotation, and a cross-module constant must not drag nine registrations
with it.

Parity: sklearn-compatible smoothing (create_text_vectors,
Context_analyzer_RoBERTa_fun.py:73 — min_df=4, max_df=0.8,
max_features=1000, l2-normalized rows).
"""

from __future__ import annotations

from . import sentiment as S

MIN_DF = 4
MAX_DF = 0.8
MAX_FEATURES = 1000

STOP_SQL = ", ".join(f"'{w}'" for w in S.STOPWORDS)

SQL_TFIDF_CTE = f"""
words AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words
  WHERE word NOT IN ({STOP_SQL}) AND word <> ''
  GROUP BY doc_id, word
), n_docs AS (
  SELECT count(*) AS n FROM documents
), vocab AS (
  SELECT word, count(*) AS df, sum(tf) AS total_tf
  FROM tf GROUP BY word
), kept AS (
  SELECT word, df FROM (
    SELECT *, row_number() OVER (ORDER BY total_tf DESC, word) AS feat_rank
    FROM vocab, n_docs
    WHERE df >= {MIN_DF} AND df <= {MAX_DF} * n
  ) WHERE feat_rank <= {MAX_FEATURES}
), weighted AS (
  SELECT tf.doc_id, tf.word, tf.tf * (ln((1.0 + n) / (1.0 + df)) + 1.0) AS w
  FROM tf JOIN kept USING (word), n_docs
), norms AS (
  SELECT doc_id, sqrt(cast(sum(cast(w * w as decimal(30,10))) as double)) AS norm
  FROM weighted GROUP BY doc_id
), tfidf_rows AS (
  SELECT w.doc_id, w.word, round(w.w / n.norm, 6) AS tfidf
  FROM weighted w JOIN norms n USING (doc_id)
)
"""


# BPE-ish token regex shared by text_ops.text_token_count and
# curation_ext.corpus_data_card (letter runs, single digits, single
# non-alphanumeric symbols — the GPT-2-style pre-tokenizer shape).
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"
