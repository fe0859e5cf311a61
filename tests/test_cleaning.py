"""Golden-fixture tests for the P1/P2 cleaning pipeline (FIXTURES.md F-CLEAN).

Expected values encode the reference's documented behavior
(modules/text_cleaner.py:166-224): each case exercises one pattern family.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.functions.cleaning import clean_hwp_text_col, clean_text_col

CASES = [
    # (raw, expected_clean)
    ("<p>hello</p>", "hello"),
    ("a {{layout}} b", "a b"),
    ("a {% block x %} b", "a b"),
    ("a ${var} b", "a b"),
    ("a [[wiki link]] b", "a b"),
    ("click javascript:void(0) here", "click here"),
    ('x onclick="doIt()" y', "x y"),
    ("keep function(a) { body } none", "keep none"),
    ("smile \U0001F600\U0001F601 end", "smile end"),
    ("text Copyright ACME 2024 tail", "text tail"),
    ("read Page 3 of 7 done", "read done"),
    ("see www.example.com now", "see now"),
    ("multi    spaces\tand tabs", "multi spaces and tabs"),
    ("a\n\n\n\n\nb", "a\n\nb"),
    ("  padded  ", "padded"),
    ("", ""),
    # whitelist strips exotic symbols (U+2200 ∀ is in a garbage range)
    ("x ∀ y", "x y"),
    # Hangul preserved end-to-end
    ("서울 사무실 주소", "서울 사무실 주소"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_clean_text(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["text"])
    out = df.select(clean_text_col("text").alias("c")).head()["c"]
    assert out == expected, f"raw={raw!r}"


def test_clean_hwp_keeps_korean_lines(spark):
    raw = "가나다 줄\nab\n이 줄은 충분히 깁니다 정말로"
    df = spark.createDataFrame([(raw,)], ["text"])
    out = df.select(clean_hwp_text_col("text").alias("c")).head()["c"]
    # short non-Korean line 'ab' dropped; survivors joined, whitespace collapsed
    assert "ab" not in out.split()
    assert "가나다" in out


def test_clean_text_is_pure_column_expression(spark, docs_tiny):
    # no Python UDF in the plan — the whole clean is codegen-able
    plan = docs_tiny.select(clean_text_col("text")).queryExecution if False else None
    explained = docs_tiny.select(clean_text_col("text").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in explained
    assert "ArrowEvalPython" not in explained


def test_gopher_signals_crafted_docs(spark):
    from vectordb_etl_spark.functions.text import (
        gopher_pass_col,
        gopher_signal_cols,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean readable prose with several perfectly normal words right here today"),
            (2, "- one\n- two\n- three\n- four"),        # all bullet lines
            (3, "same line\nsame line\nsame line\nnew"),  # 2/4 lines dup... trimmed: 3 same + 1
            (4, "#### #tags #### everywhere # # # yes"),  # symbol-heavy
            (5, "trailing thought...\nanother one...\nplain line"),
            (6, "12345 67890 11111 22222 33333"),          # zero alpha words
        ],
        "doc_id int, text string",
    )
    sig = gopher_signal_cols("text")
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            *[v.alias(k) for k, v in sig.items()],
            gopher_pass_col(sig).alias("keep"),
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[1]["alpha_word_frac"] == 1.0
    assert out[2]["bullet_line_frac"] == 1.0 and out[2]["keep"] is False
    assert out[3]["dup_line_frac"] == 0.5  # 4 lines, 2 distinct
    assert out[4]["symbol_word_ratio"] > 0.1 and out[4]["keep"] is False
    assert out[5]["ellipsis_line_frac"] == round(2 / 3, 6)
    assert out[6]["alpha_word_frac"] == 0.0 and out[6]["keep"] is False


def test_bigram_logprob_hand_computed(spark):
    import math

    from vectordb_etl_spark.functions.text import bigram_logprob_scores

    # corpus: "a b a b" and "a b c". tokens: a×3 b×3 c×1, V=3.
    # bigram counts: (a,b)×3, (b,a)×1, (b,c)×1
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
    p_ab = (3 + 1) / (3 + 3)   # C(a,b)+1 / C(a)+V
    p_ba = (1 + 1) / (3 + 3)
    p_bc = (1 + 1) / (3 + 3)
    exp1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    exp2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_neg_logprob"] - round(exp1, 6)) < 1e-9
    assert out[2]["n_bigrams"] == 2
    assert abs(out[2]["avg_neg_logprob"] - round(exp2, 6)) < 1e-9


def test_bigram_logprob_single_token_doc_null_score(spark):
    from vectordb_etl_spark.functions.text import bigram_logprob_scores

    df = spark.createDataFrame([(1, "solo"), (2, "a b")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["avg_neg_logprob"] is None
    assert out[2]["n_bigrams"] == 1


def test_bpe_pair_counts_hand_computed(spark):
    from vectordb_etl_spark.functions.text import bpe_pair_counts

    # "abab" -> ab, ba, ab ; "ab" -> ab ; single-char "x" contributes none
    df = spark.createDataFrame([("abab ab x",), ("AB",)], ["text"])
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, "text").collect()]
    assert got == [("ab", 4), ("ba", 1)]  # lowercased; count desc, pair asc


def test_bpe_pair_counts_matches_duckdb(spark):
    import duckdb

    from vectordb_etl_spark.functions.text import (
        bpe_pair_counts,
        bpe_pair_counts_sql,
    )

    texts = [
        ("the quick brown fox jumps over the lazy dog",),
        ("pack my box with five dozen liquor jugs",),
        ("a bb ccc dddd eeeee",),
    ]
    df = spark.createDataFrame(texts, ["text"])
    got = sorted(map(tuple, bpe_pair_counts(df, "text", top_n=200).collect()))
    src = " UNION ALL ".join(f"SELECT '{t[0]}' AS text" for t in texts)
    sql = bpe_pair_counts_sql(src, "text", top_n=200)
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_bpe_pair_counts_rejects_bad_top_n(spark):
    import pytest as _pt

    from vectordb_etl_spark.functions.text import (
        bpe_pair_counts,
        bpe_pair_counts_sql,
    )

    df = spark.createDataFrame([("ab",)], ["text"])
    with _pt.raises(ValueError, match="top_n"):
        bpe_pair_counts(df, "text", top_n=0)
    with _pt.raises(ValueError, match="top_n"):
        bpe_pair_counts_sql("SELECT 'x' AS text", top_n=-1)
