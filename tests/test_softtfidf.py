"""Soft-TFIDF operator semantics (reference: src/soft_tfidf.c scorer +
libpostal.c:185-193 thresholds)."""

import pytest
from pyspark.sql import functions as F

from libpostal_spark.operators import softtfidf


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


def _pairs(spark, out_df):
    return {
        (r["doc_id1"], r["doc_id2"]): r
        for r in out_df.collect()
    }


def test_identical_docs_score_one(spark):
    docs = _docs(spark, ["alpha beta gamma", "alpha beta gamma"])
    got = _pairs(spark, softtfidf.soft_tfidf_pairs(docs))
    r = got[(0, 1)]
    # all tokens self-match at jw=1.0 → score = Σw² / (√Σw²·√Σw²) = 1
    assert r["soft_e4"] == 10000
    assert r["status"] == "likely_duplicate"
    assert r["n_matched"] == 3


def test_disjoint_docs_score_zero(spark):
    docs = _docs(spark, ["alpha beta", "xqz wvu"])
    r = _pairs(spark, softtfidf.soft_tfidf_pairs(docs))[(0, 1)]
    assert r["soft_e4"] == 0 and r["status"] == "non_duplicate"
    assert r["n_matched"] == 0


def test_partial_overlap_between(spark):
    docs = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma zz"])
    r = _pairs(spark, softtfidf.soft_tfidf_pairs(docs))[(0, 1)]
    assert 0 < r["soft_e4"] < 10000
    assert r["n_matched"] == 3


def test_fuzzy_token_match_counts(spark):
    # "martha" vs "marhta" — JW 0.9611 ≥ 0.9 close bar: matches fuzzily
    docs = _docs(spark, ["martha stewart", "marhta stewart"])
    r = _pairs(spark, softtfidf.soft_tfidf_pairs(docs))[(0, 1)]
    assert r["n_matched"] == 2
    assert r["status"] in ("likely_duplicate", "needs_review")
    assert r["soft_e4"] < 10000          # fuzzy match scores below exact


def test_empty_side_is_zero(spark):
    docs = _docs(spark, ["alpha beta", "   "])
    r = _pairs(spark, softtfidf.soft_tfidf_pairs(docs))[(0, 1)]
    assert r["soft_e4"] == 0 and r["n_matched"] == 0


def test_idf_downweights_common_tokens(spark):
    # 'common' appears in every doc (low weight); 'rare*' only in the pair.
    # A pair sharing only the common token must score below a pair sharing
    # a rare token.
    docs = _docs(
        spark,
        [
            "common rarex",     # 0
            "common rarex",     # 1  — shares rare token with 0
            "common zzfoo",     # 2  — shares only 'common' with 1
            "common qqbar",     # 3
        ],
    )
    got = _pairs(spark, softtfidf.soft_tfidf_pairs(docs))
    assert got[(0, 1)]["soft_e4"] == 10000
    assert got[(1, 2)]["soft_e4"] < got[(0, 1)]["soft_e4"]
    assert got[(1, 2)]["soft_e4"] > 0     # still partially similar


def test_explicit_pairs_frame(spark):
    docs = _docs(spark, ["a b c", "zz yy", "a b c"])
    pairs = spark.createDataFrame([(0, 2)], ["doc_id1", "doc_id2"])
    got = _pairs(spark, softtfidf.soft_tfidf_pairs(docs, pairs=pairs))
    assert set(got) == {(0, 2)}
    assert got[(0, 2)]["soft_e4"] == 10000
