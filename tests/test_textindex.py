"""Positional inverted index / phrase search (operators/textindex.py)."""

from __future__ import annotations

import pytest

from prefect_flow_arc_alto_to_json_spark.operators.textindex import (
    phrase_search,
    positional_postings,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the quick brown dog"),
        (2, "quick brown quick brown quick"),
        (3, "brown quick"),
        (4, "nothing to see here"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_positions_are_zero_based(docs):
    p = positional_postings(docs.where("doc_id = 3")).collect()
    assert sorted((r["pos"], r["term"]) for r in p) == [(0, "brown"), (1, "quick")]


def test_phrase_counts_overlapping_occurrences(docs):
    out = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["quick", "brown"]).collect()
    }
    # doc 1 has it twice, doc 2 twice (positions 0 and 2), doc 3 never
    assert out == {1: 2, 2: 2}


def test_three_word_phrase_and_misses(docs):
    out = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["quick", "brown", "fox"]).collect()
    }
    assert out == {1: 1}
    assert phrase_search(docs, ["fox", "quick"]).count() == 0


def test_single_word_phrase_is_term_frequency(docs):
    out = {
        r["doc_id"]: r["n_hits"] for r in phrase_search(docs, ["quick"]).collect()
    }
    assert out == {1: 2, 2: 3, 3: 1}


def test_empty_phrase_rejected(docs):
    with pytest.raises(ValueError):
        phrase_search(docs, [])
