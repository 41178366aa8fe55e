"""SURVEY §2 <-> registry sync guard.

The coverage checklist is graded line-by-line; a registered query
missing from §2 (or a §2 claim naming a query that no longer exists)
is a silent grading bug. This pins both directions for the query
surface."""

from __future__ import annotations

import re


def _survey_section2() -> str:
    text = open("SURVEY.md").read()
    start = text.index("## §2")
    end = text.index("## §3")
    return text[start:end]


def test_every_registered_query_is_in_survey_s2():
    from sentiment_analysis_vector_search_spark.registry import (
        QUERIES,
        load_all_modules,
    )

    load_all_modules()
    names = set(re.findall(r"`([^`]+)`", _survey_section2()))
    # names can appear inside slash-joined component groups too
    flat = set()
    for n in names:
        for part in re.split(r"\s*/\s*", n):
            flat.add(part.strip().strip("`"))
    missing = sorted(q for q in QUERIES if q not in flat)
    assert not missing, f"registered queries absent from SURVEY §2: {missing}"


def test_survey_checklist_has_no_unchecked_rows():
    sec = _survey_section2()
    unchecked = [l for l in sec.splitlines() if l.strip().startswith("- [ ]")]
    assert not unchecked, unchecked


def test_graded_window_is_the_queries_prefix_with_oracles():
    """The driver grades the FIRST 50 registry entries: the window list
    must be exactly that prefix and every member must carry an oracle
    (a rows-only window slot would silently weaken a graded row)."""
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.registry import GRADED_WINDOW

    qs = list(entrymod.queries())
    assert qs[: len(GRADED_WINDOW)] == GRADED_WINDOW
    oracles = entrymod.oracle_sql()
    missing = [n for n in GRADED_WINDOW if n not in oracles]
    assert not missing, f"window entries without oracles: {missing}"
