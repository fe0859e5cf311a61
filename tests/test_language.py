"""Threshold tests for the two language detectors (FIXTURES.md F-LANG).

P3 and P4 disagree by design (SURVEY.md §7.4): empty-string default korean vs
english, Vietnamese threshold 2% vs 5%.
"""

from __future__ import annotations

import pytest

from vectordb_etl_spark.functions.language import (
    detect_language_content_col,
    detect_language_query,
    detect_language_query_col,
)


def _detect(spark, col_fn, text):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col_fn("text").alias("lang")).head()["lang"]


CONTENT_CASES = [
    ("", "korean"),  # empty default (html_loader.py:126-127)
    ("한국어 텍스트입니다", "korean"),
    ("This is clearly English text.", "english"),
    ("Tiếng Việt có dấu ă â đ ê ô ơ ư nhiều", "vietnamese"),
    ("12345 67890 !!!", "korean"),  # no alpha → all ratios 0 → argmax tie → korean
    # exactly 10% Hangul is NOT > 10% → falls through; ASCII 0% → argmax korean
    ("가123456789", "korean"),
    # >10% Hangul wins even in mixed text
    ("가가가 abcdefg hij", "korean"),
]


@pytest.mark.parametrize("text,expected", CONTENT_CASES)
def test_content_detector(spark, text, expected):
    assert _detect(spark, detect_language_content_col, text) == expected


QUERY_CASES = [
    ("", "english"),  # empty default differs from P3 (search_utils.py:22-23)
    ("서울 사무실 주소", "korean"),
    ("Seoul office address", "english"),
    ("xin chào các bạn ở đây", "vietnamese"),
]


@pytest.mark.parametrize("text,expected", QUERY_CASES)
def test_query_detector(spark, text, expected):
    assert _detect(spark, detect_language_query_col, text) == expected
    assert detect_language_query(text) == expected  # driver twin agrees
