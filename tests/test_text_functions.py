"""Text-analysis column functions: exact expected values on constructed rows
(analog of the reference's scalar-helper tests, tests/test_coverage_gaps.py:41-82)."""

from __future__ import annotations

import pytest

from cloud_dedup_spark.functions.text import text_profile


@pytest.fixture(scope="module")
def profiled(spark):
    rows = [
        (1, "the cat and the dog is in the house of cards"),
        (2, ""),
        (3, "   "),
        (4, "der hund und die katze ist nicht hier"),
        (5, "x"),
        (6, "a, b; c!"),
        (7, "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in text_profile(df).collect()}


def test_token_counts(profiled):
    assert profiled[1]["n_tokens"] == 11
    assert profiled[2]["n_tokens"] == 0
    assert profiled[3]["n_tokens"] == 0
    assert profiled[5]["n_tokens"] == 1


def test_language_id(profiled):
    assert profiled[1]["lang_guess"] == "en"
    assert profiled[4]["lang_guess"] == "de"
    assert profiled[2]["lang_guess"] == "und"


def test_stopword_and_punct(profiled):
    # "the cat and the dog is in the house of cards": stopwords
    # the,and,the,is,in,the,of = 7 of 11
    assert profiled[1]["stopword_ratio"] == round(7 / 11, 4)
    assert profiled[1]["punct_ratio"] == 0.0
    # "a, b; c!": 3 punct chars of 6 non-space
    assert profiled[6]["punct_ratio"] == 0.5


def test_mean_word_len(profiled):
    # tokens: one..eleven → 3+3+5+4+4+3+5+5+4+3+6 = 45 chars / 11 tokens
    assert profiled[7]["mean_word_len"] == round(45 / 11, 4)
    assert profiled[2]["mean_word_len"] == 0.0


def test_fingerprint_whitespace_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "hello   world"), (2, " hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in text_profile(df).collect()}
    assert got[1] == got[2] != got[3]


def test_quality_bounds(profiled):
    for r in profiled.values():
        assert 0.0 <= r["quality"] <= 1.0


def test_punct_ratio_is_unicode_letter_aware(spark):
    """Round-4 review: the ASCII class counted every CJK/Cyrillic/accented
    LETTER as punctuation, flooring quality for exactly the languages
    language_id detects."""
    from cloud_dedup_spark.functions.text import punct_ratio, quality_score

    df = spark.createDataFrame(
        [(1, "Héllo, 世界! Привет мир."), (2, "plain english text, no drama.")],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            punct_ratio("text").alias("p"),
            quality_score("text").alias("q"),
        ).collect()
    }
    # 4 punctuation chars (, ! . and one more .) over the non-space chars —
    # far below the 1.0 the ASCII class produced
    assert out[1]["p"] < 0.25
    assert out[2]["p"] < 0.1
    # a clean non-Latin doc must not score WORSE than empty text on the
    # punctuation component (the old floor)
    assert out[1]["q"] > 0.15
