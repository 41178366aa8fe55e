"""Chatbot data surface — the reference ``ResultsChatbot``'s NON-LLM
side re-expressed as declarative DataFrame plans.

Parity targets (reference file:line in each docstring):

- ``chat_suggested_questions`` — get_suggested_questions
  (chatbot_analyzer.py:250): a static suggestion list, customized by
  which analysis artifacts EXIST, truncated to the top 8.
- ``chat_context_summary`` — get_context_summary
  (chatbot_analyzer.py:279): one row of context-availability booleans.
- ``run_params`` — the MLflow parameter/tag surface
  (mlflow_tracking.py:49 log_parameters, :74 log_model_info, :108
  set_tags; values from pipeline_helpers.py:42-58): literal run
  parameters plus the two data-derived ones (num_reviews, data_source
  — log_dataset_info, mlflow_tracking.py:80).

The LLM call itself (``ask``) is out of scope per BASELINE.json — these
operators cover the *data* conditioning the reference computes around it:
artifact presence is derived from the corpus (a sentiment class's summary
exists iff the class has documents; recommendations exist iff BOTH the
positive and negative summaries exist — recommendation_fun.py:174,:180
returns early when either is missing; trends exist iff any documents do).

Scale notes: each operator is ONE aggregate scan of ``documents``
collapsed to a single row, then literal-array manipulation on that row —
no shuffle beyond the scalar agg, nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import sentiment as S
from ..registry import register

# chatbot_analyzer.py:252-263 — the static suggestion list, verbatim.
BASE_QUESTIONS: tuple[str, ...] = (
    "What are the main issues customers are complaining about?",
    "What do customers like most about the service?",
    "What should we prioritize fixing first?",
    "Show me examples of negative feedback about food quality",
    "What percentage of reviews are positive?",
    "What are the common themes in negative reviews?",
    "What improvements would have the biggest impact?",
    "Are there any seasonal trends in the sentiment?",
    "What specific words appear most in negative reviews?",
    "How does the positive feedback compare to negative?",
)
NEG_SUMMARY_QUESTION = "Summarize the negative feedback"  # insert at 0 (:266)
RECOMMEND_QUESTION = "What are your top recommendations?"  # insert at 1 (:269)
MAX_SUGGESTIONS = 8  # chatbot_analyzer.py:271 — "Return top 8"


def _presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: per-class document counts driving artifact presence."""
    from .sentiment_ops import classified

    lab = classified(spark, sf_dir)
    cnt = lambda s: F.sum((F.col("sentiment") == s).cast("int"))  # noqa: E731
    return lab.agg(
        cnt("POSITIVE").alias("pos_n"),
        cnt("NEGATIVE").alias("neg_n"),
        cnt("NEUTRAL").alias("neu_n"),
        F.count(F.lit(1)).alias("total_n"),
    )


def _sql_quote_list(items: tuple[str, ...]) -> str:
    inner = ", ".join("'" + q.replace("'", "''") + "'" for q in items)
    return f"[{inner}]"


_SUGGEST_ORACLE = f"""
WITH {S.SQL_CLASSIFIED_CTE},
c AS (
  SELECT sum(CASE WHEN sentiment = 'POSITIVE' THEN 1 ELSE 0 END) AS pos_n,
         sum(CASE WHEN sentiment = 'NEGATIVE' THEN 1 ELSE 0 END) AS neg_n
  FROM labeled
), arr1 AS (
  SELECT CASE WHEN neg_n > 0
              THEN list_prepend('{NEG_SUMMARY_QUESTION}',
                                {_sql_quote_list(BASE_QUESTIONS)})
              ELSE {_sql_quote_list(BASE_QUESTIONS)} END AS a,
         pos_n, neg_n
  FROM c
), arr2 AS (
  SELECT CASE WHEN pos_n > 0 AND neg_n > 0
              THEN list_concat(list_concat(a[1:1],
                               ['{RECOMMEND_QUESTION}']), a[2:])
              ELSE a END AS a
  FROM arr1
)
SELECT cast(i as int) AS rank, a[cast(i as int)] AS question
FROM arr2, unnest(generate_series(1, least(len(a), {MAX_SUGGESTIONS}))) AS t(i)
"""


@register("chat_suggested_questions", oracle=_SUGGEST_ORACLE)
def chat_suggested_questions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_suggested_questions parity (chatbot_analyzer.py:250): the ten
    static questions; "Summarize the negative feedback" prepended when the
    negative summary exists (insert(0), :266), "What are your top
    recommendations?" inserted at position 1 when recommendations exist
    (insert(1), :269 — which requires BOTH class summaries,
    recommendation_fun.py:174,:180); truncated to 8 (:271). Presence is
    computed from the corpus in one scalar aggregate; the list algebra
    runs on that single row."""
    base = F.array(*[F.lit(q) for q in BASE_QUESTIONS])
    with_neg = F.when(
        F.col("neg_n") > 0,
        F.concat(F.array(F.lit(NEG_SUMMARY_QUESTION)), base),
    ).otherwise(base)
    arr = F.when(
        (F.col("pos_n") > 0) & (F.col("neg_n") > 0),
        F.concat(
            F.slice(with_neg, 1, 1),
            F.array(F.lit(RECOMMEND_QUESTION)),
            F.slice(with_neg, 2, F.size(with_neg) - 1),
        ),
    ).otherwise(with_neg)
    return _presence(spark, sf_dir).select(
        F.posexplode(F.slice(arr, 1, MAX_SUGGESTIONS)).alias("pos", "question")
    ).select((F.col("pos") + 1).cast("int").alias("rank"), "question")


_CONTEXT_ORACLE = f"""
WITH {S.SQL_CLASSIFIED_CTE},
c AS (
  SELECT sum(CASE WHEN sentiment = 'POSITIVE' THEN 1 ELSE 0 END) AS pos_n,
         sum(CASE WHEN sentiment = 'NEGATIVE' THEN 1 ELSE 0 END) AS neg_n,
         sum(CASE WHEN sentiment = 'NEUTRAL' THEN 1 ELSE 0 END) AS neu_n,
         count(*) AS total_n
  FROM labeled
)
SELECT 'adhoc' AS job_id,
       pos_n > 0 AS has_positive,
       neg_n > 0 AS has_negative,
       neu_n > 0 AS has_neutral,
       pos_n > 0 AND neg_n > 0 AS has_recommendations,
       total_n > 0 AS has_trends,
       cast(0 as int) AS conversation_length
FROM c
"""


@register("chat_context_summary", oracle=_CONTEXT_ORACLE)
def chat_context_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_context_summary parity (chatbot_analyzer.py:279): one row of
    context-availability booleans. In the reference each boolean reflects
    whether the pipeline wrote that artifact; here presence is derived
    from the corpus that determines the write (per-class counts; trends
    exist whenever any documents do; recommendations need both class
    summaries). ``conversation_length`` is 0 — a fresh session with no
    history relation, matching a just-initialized chatbot (:38)."""
    return _presence(spark, sf_dir).select(
        F.lit("adhoc").alias("job_id"),
        (F.col("pos_n") > 0).alias("has_positive"),
        (F.col("neg_n") > 0).alias("has_negative"),
        (F.col("neu_n") > 0).alias("has_neutral"),
        ((F.col("pos_n") > 0) & (F.col("neg_n") > 0)).alias(
            "has_recommendations"
        ),
        (F.col("total_n") > 0).alias("has_trends"),
        F.lit(0).cast("int").alias("conversation_length"),
    )


# (param, value) literals: pipeline_helpers.py:50-58 log_parameters +
# mlflow_tracking.py:74 log_model_info + :108 set_tags (run_tags at
# pipeline_helpers.py:43-47; status tag from end_run, :117). Tag rows are
# namespaced "tag:" to keep one two-column relation.
_PARAM_LITERALS: tuple[tuple[str, str], ...] = (
    ("model_name", "distilbert-base-uncased-finetuned-sst-2-english"),
    ("model_version", "latest"),
    ("search_method", "dataset"),
    # Context_analyzer_RoBERTa_fun.py:498 default, shared with the
    # quality-score floor (functions/sentiment.py SENTENCE_LENGTH).
    ("sentence_length", str(S.SENTENCE_LENGTH)),
    ("separator_keywords", "None"),
    ("llm_provider", "groq"),
    ("has_custom_prompt", "False"),
    ("company_name", "unknown"),
    ("tag:job_id", "adhoc"),
    ("tag:search_method", "dataset"),
    ("tag:has_custom_prompt", "no"),
    ("tag:status", "FINISHED"),
)


def _sql_param_rows() -> str:
    return "\nUNION ALL ".join(
        f"SELECT '{k}' AS param, '{v}' AS value" for k, v in _PARAM_LITERALS
    )


_PARAMS_ORACLE = f"""
WITH d AS (
  SELECT cast(count(*) as varchar) AS num_reviews,
         CASE WHEN count(DISTINCT source) = 1 THEN min(source)
              ELSE 'mixed' END AS data_source
  FROM documents
)
{_sql_param_rows()}
UNION ALL SELECT 'num_reviews', num_reviews FROM d
UNION ALL SELECT 'data_source', data_source FROM d
"""


@register("run_params", oracle=_PARAMS_ORACLE)
def run_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLflow parameter/tag rows (mlflow_tracking.py:49 log_parameters,
    :74 log_model_info, :108 set_tags), the companion of ``run_metrics``:
    the literal run configuration pipeline_helpers.py:50-58 logs, plus the
    data-derived dataset parameters of log_dataset_info
    (mlflow_tracking.py:80): num_reviews = corpus count, data_source =
    the single distinct source or 'mixed'. One scalar aggregate scan."""
    docs = table(spark, sf_dir, "documents")
    d = docs.agg(
        F.count(F.lit(1)).cast("string").alias("num_reviews"),
        F.when(
            F.count_distinct(F.col("source")) == 1, F.min("source")
        )
        .otherwise(F.lit("mixed"))
        .alias("data_source"),
    )
    lits = spark.createDataFrame(list(_PARAM_LITERALS), "param string, value string")
    derived = d.selectExpr(
        "stack(2, 'num_reviews', num_reviews, 'data_source', data_source)"
        " AS (param, value)"
    )
    return lits.unionByName(derived)


# ---------------------------------------------------------------------------
# chat_history_messages — the rolling conversation-history window of
# ``ask`` (chatbot_analyzer.py:184): each question's request carries the
# LAST 4 history messages = 2 (question, answer) exchanges
# (chatbot_analyzer.py:220 ``self.conversation_history[-4:]  # Last 2
# exchanges``; :239-240 appends user+assistant per ask). Conversations
# are modeled as (user_id, day) over the events log — a day boundary is
# clear_history (chatbot_analyzer.py:274) — with event_type standing in
# for the question text and a deterministic answer stub per exchange.
#
# Per question we emit the history the reference would splice into the
# messages list: its length (min(4, 2*(qnum-1))) and an md5 digest of the
# '|'-joined role:content lines, so the oracle pins the exact window
# CONTENT and order, not just its size.
#
# Scale shape: one window keyed by (user_id, day) — the same bounded-skew
# conversation grain as q_events_sessions' day chunks (per-key cardinality
# = one user's events in one day, never a whole hot user) — with a 2-row
# frame, so state per key during the window scan is two rows.
# ---------------------------------------------------------------------------

_CHAT_HISTORY_ORACLE = """
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id,
       event_type AS question,
       row_number() OVER w AS qnum,
       least(4, (row_number() OVER w - 1) * 2) AS history_len,
       md5(coalesce(
         string_agg('user:' || event_type || '|assistant:ans(' || event_type || ')',
                    '|') OVER wh,
         '')) AS history_md5
FROM events
WINDOW w AS (PARTITION BY user_id, cast(ts as date) ORDER BY ts, event_id),
       wh AS (PARTITION BY user_id, cast(ts as date) ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING)
"""


@register("chat_history_messages", oracle=_CHAT_HISTORY_ORACLE)
def chat_history_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    msg = F.concat(
        F.lit("user:"),
        F.col("event_type"),
        F.lit("|assistant:ans("),
        F.col("event_type"),
        F.lit(")"),
    )
    qnum = F.row_number().over(w)
    # collect_list over the ordered 2-row frame preserves frame order, so
    # the digest pins both membership and sequence of the spliced history
    hist = F.array_join(F.collect_list(msg).over(w.rowsBetween(-2, -1)), "|")
    return ev.select(
        "user_id",
        "day",
        "event_id",
        F.col("event_type").alias("question"),
        qnum.alias("qnum"),
        F.least(F.lit(4), (qnum - 1) * 2).alias("history_len"),
        F.md5(hist).alias("history_md5"),
    )
