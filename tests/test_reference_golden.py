"""Golden parity-by-example tests against the reference's own logic.

The reference repo ships smoke scripts rather than data-fixture tests, so
these goldens pin literal input → output rows through the engine's
classify / quality-score / prompt-assembly path, with EXPECTED values
computed by independent Python transliterations of the reference
functions (Context_analyzer_RoBERTa_fun.py:170 analyze_sentiment_enhanced,
:200 compute_original_score; summarize_sentiments_fun.py:39
create_summary_prompt) — not by re-running the operator code. Where the
engine documents a deliberate deviation (integer-percent confidence in
prompts instead of Python's ``:.2f`` — cross-engine float-format parity),
the transliteration carries the same deviation and says so.
"""

import re

from pyspark.sql import functions as F

from sentiment_analysis_vector_search_spark.functions import sentiment as S


def _ref_classify(pos_hits: int, neg_hits: int, threshold: float = S.CONFIDENCE_THRESHOLD):
    """analyze_sentiment_enhanced's 3-class thresholding, with the margin
    scorer standing in for the model exactly as functions/sentiment.py
    declares: raw label from hit comparison, confidence from the margin."""
    raw = "POSITIVE" if pos_hits >= neg_hits else "NEGATIVE"
    total = pos_hits + neg_hits
    conf = 0.5 if total == 0 else 0.5 + 0.5 * abs(pos_hits - neg_hits) / total
    label = raw if conf > threshold else "NEUTRAL"
    return raw, round(conf, 6), label


def _ref_quality(text: str, sentiment: str) -> float:
    """compute_original_score transliterated (Context_analyzer_RoBERTa_fun
    .py:200): word-count floor, 0.05 per extra word, 0.1 per sentiment-
    matched keyword PRESENT (substring containment, counted once each)."""
    words = text.lower().split()
    if len(words) <= S.SENTENCE_LENGTH:
        return 0.0
    base = (len(words) - S.SENTENCE_LENGTH) * 0.05
    lex = {
        "POSITIVE": S.POSITIVE_WORDS,
        "NEGATIVE": S.NEGATIVE_WORDS,
        "NEUTRAL": S.NEUTRAL_WORDS,
    }[sentiment]
    bonus = sum(0.1 for kw in lex if kw.lower() in text.lower())
    return round(base + bonus, 6)


GOLDEN_TEXTS = [
    "fast good excellent service here",  # 3 pos hits -> POSITIVE conf 1.0
    "slow bad",  # 2 neg hits -> NEGATIVE conf 1.0
    "fast slow",  # tied margin -> conf 0.5 -> NEUTRAL
    "table scan visit",  # no lexicon hits -> conf 0.5 -> NEUTRAL
    "good",  # single pos hit -> conf 1.0 -> POSITIVE
    "the room was slow bad terrible and dup again",  # 4 neg -> NEGATIVE
]


def test_classify_golden_rows(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(GOLDEN_TEXTS)], "id int, text string")
    got = {
        r["id"]: (r["raw"], r["conf"], r["label"])
        for r in df.select(
            "id",
            S.raw_label(S.pos_hits(F.col("text")), S.neg_hits(F.col("text"))).alias("raw"),
            S.confidence(S.pos_hits(F.col("text")), S.neg_hits(F.col("text"))).alias("conf"),
            S.sentiment(
                S.raw_label(S.pos_hits(F.col("text")), S.neg_hits(F.col("text"))),
                S.confidence(S.pos_hits(F.col("text")), S.neg_hits(F.col("text"))),
            ).alias("label"),
        ).collect()
    }
    for i, text in enumerate(GOLDEN_TEXTS):
        toks = text.lower().split()
        pos = sum(1 for t in toks if t in S.POSITIVE_WORDS)
        neg = sum(1 for t in toks if t in S.NEGATIVE_WORDS)
        assert got[i] == _ref_classify(pos, neg), (text, got[i])
    # spot-pin absolute labels so a lexicon edit can't silently pass
    assert got[0][2] == "POSITIVE" and got[1][2] == "NEGATIVE"
    assert got[2][2] == "NEUTRAL" and got[3][2] == "NEUTRAL"


def test_quality_score_golden_rows(spark):
    cases = [
        ("good fast stay", "POSITIVE"),  # 3 words <= floor -> 0.0
        ("the service was excellent and fast overall", "POSITIVE"),
        ("the room was slow bad terrible and dup again", "NEGATIVE"),
        ("we did a table scan visit and then some", "NEUTRAL"),
        ("one two three four five", "POSITIVE"),  # 5 words, no keywords
    ]
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(cases)], "id int, text string, sent string"
    )
    got = {
        r["id"]: r["q"]
        for r in df.select(
            "id", S.quality_score(F.col("text"), F.col("sent")).alias("q")
        ).collect()
    }
    for i, (text, sent) in enumerate(cases):
        assert got[i] == _ref_quality(text, sent), (text, sent, got[i])
    assert got[0] == 0.0
    assert got[4] == 0.05


def test_summary_prompt_layout_matches_reference(spark, sf_dir):
    """Every assembled prompt must follow create_summary_prompt's exact
    layout (summarize_sentiments_fun.py:39): header sentence, COMMENTS
    block of 'N. [Confidence: …] text' lines, closing instruction,
    'Summary:' tail — with the documented integer-percent confidence
    deviation."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["summarize_prompts"](spark, sf_dir).collect()
    assert rows
    pat = re.compile(
        r"^Analyze the following (POSITIVE|NEGATIVE|NEUTRAL) comments from "
        r"customer reviews and provide a concise summary in EXACTLY 2-3 "
        r"sentences\.\n\n\1 COMMENTS:\n"
        r"(\d+\. \[Confidence: \d{1,3}%\] [^\n]*(\n\n\d+\. \[Confidence: \d{1,3}%\] [^\n]*)*)"
        r"\n\nWrite a brief summary \(2-3 sentences ONLY\) explaining what "
        r"aspects the commenters found (positive|negative|neutral)\. Focus "
        r"on the main themes and common patterns\.\n\nSummary:$",
        re.DOTALL,
    )
    for r in rows:
        prompt = r["prompt"]
        if getattr(r, "truncated", False):
            assert prompt.endswith("\n\nSummary:")  # truncation re-appends tail
            continue
        m = pat.match(prompt)
        assert m, f"prompt layout diverged from reference:\n{prompt[:400]}"
        # header class and closing adjective must agree
        assert m.group(1).lower() == m.group(4)
