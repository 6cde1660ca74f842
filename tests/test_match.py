"""Aho–Corasick multi-pattern matching (`functions/match.py`): the
classic textbook automaton fixtures, overlap semantics, agreement
with independent counting, and the Spark blocklist pass."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.match import (
    AhoCorasick,
    multi_match,
    substr_hits_col,
)


def test_textbook_hers():
    # the 1975 paper's example set
    ac = AhoCorasick(["he", "she", "his", "hers"])
    text = "ushers"
    finds = ac.find(text)
    got = {(i, ac.patterns[p]) for i, p in finds}
    # 'she' ends at 3, 'he' ends at 3, 'hers' ends at 5
    assert got == {(3, "she"), (3, "he"), (5, "hers")}
    assert ac.counts(text) == [1, 1, 0, 1]


def test_overlapping_occurrences():
    ac = AhoCorasick(["aa"])
    assert ac.counts("aaaa") == [3]  # overlaps included
    ac2 = AhoCorasick(["aba", "ba"])
    assert ac2.counts("ababa") == [2, 2]


def test_contained_patterns_both_fire():
    ac = AhoCorasick(["art", "parted"])
    assert ac.counts("parted") == [1, 1]


def test_unicode_and_validation():
    ac = AhoCorasick(["naïve", "ï"])
    assert ac.counts("naïve naïveté") == [2, 2]
    with pytest.raises(ValueError, match="empty pattern"):
        AhoCorasick(["ok", ""])
    with pytest.raises(ValueError, match="at least one"):
        AhoCorasick([])


def test_agreement_with_independent_count():
    # border-free patterns: AC counts == non-overlapping str.count
    pats = ["spark", "query", "scan"]
    ac = AhoCorasick(pats)
    text = "spark query sparkling queryquery scandal scan"
    assert ac.counts(text) == [text.count(p) for p in pats]


def test_spark_blocklist_pass(spark):
    rows = [
        (0, "clean text here"),
        (1, "spark and spark and query"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["n_patterns"])
           for r in multi_match(df, ["spark", "query"]).collect()}
    assert got == {0: (0, 0), 1: (3, 2), 2: (None, None)}

    # the Catalyst counter agrees for border-free patterns
    from pyspark.sql import functions as F

    jvm = df.filter("text is not null").select(
        "doc_id",
        (substr_hits_col(F.col("text"), "spark")
         + substr_hits_col(F.col("text"), "query")).alias("n"),
    ).collect()
    assert {r["doc_id"]: r["n"] for r in jvm} == {0: 0, 1: 3}
