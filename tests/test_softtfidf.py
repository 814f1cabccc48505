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


def _fuzzy(spark, rows, pairs_list, subset_status="non_duplicate"):
    docs = _docs(spark, rows)
    pairs = spark.createDataFrame(pairs_list, ["doc_id1", "doc_id2"])
    return _pairs(
        spark,
        softtfidf.fuzzy_dup_status_pairs(
            docs, pairs, subset_status=subset_status
        ),
    )


def test_fuzzy_subset_rule_street_vs_name(spark):
    """'main st' ⊂ 'main st south annex': street mode grades the subset
    likely BEFORE thresholds; name mode (subset no-op) falls to thresholds."""
    rows = ["main st", "main st south annex", "other words here"]
    street = _fuzzy(spark, rows, [(0, 1)], subset_status="likely_duplicate")
    name = _fuzzy(spark, rows, [(0, 1)], subset_status="non_duplicate")
    r = street[(0, 1)]
    assert r["n_matched"] == min(r["n_tokens1"], r["n_tokens2"]) == 2
    assert r["fuzzy_status"] == "likely_duplicate"
    # name mode: same sim, graded by thresholds only (partial overlap)
    assert name[(0, 1)]["fuzzy_status"] != "likely_duplicate" or (
        name[(0, 1)]["soft_e4"] >= 9000
    )


def test_fuzzy_single_letter_demotion(spark):
    """High-sim pair differing only in a single-letter token demotes from
    likely to needs_review (dedupe.c:427-441); the same pair WITHOUT the
    letter mismatch stays likely."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        f"a {shared}",        # 0
        f"b {shared}",        # 1
        f"a b filler one",    # 2  (dilute df of 'a'/'b' below the shared
        f"a b filler two",    # 3   tokens' so the letters stay tf-idf-light
        f"a b filler three",  # 4   and the pair clears the 0.9 gate:
        f"a b filler four",   # 5   df(a)=df(b)=5 > df(shared)=4)
        shared,               # 6
        shared,               # 7
    ]
    got = _fuzzy(spark, rows, [(0, 1), (6, 7)])
    r = got[(0, 1)]
    assert r["soft_e4"] >= 9000, r
    assert r["single_letter_mismatch"]
    assert r["fuzzy_status"] == "needs_review"
    clean = got[(6, 7)]
    assert clean["soft_e4"] == 10000
    assert not clean["single_letter_mismatch"]
    assert clean["fuzzy_status"] == "likely_duplicate"


def test_fuzzy_zero_token_subset_quirk(spark):
    """A 0-token side trivially satisfies num_matches == min_len — street
    mode grades it likely (the reference's behavior, replicated exactly);
    name mode grades non."""
    rows = ["", "anything at all"]
    street = _fuzzy(spark, rows, [(0, 1)], subset_status="likely_duplicate")
    name = _fuzzy(spark, rows, [(0, 1)])
    assert street[(0, 1)]["fuzzy_status"] == "likely_duplicate"
    assert name[(0, 1)]["fuzzy_status"] == "non_duplicate"


def test_fuzzy_mid_band_needs_review(spark):
    """4 shared tokens (df=2, w=5e5) + 2 unique per side (df=4, w=2.5e5):
    sim = 1e12 / 1.125e12 = 0.8888… → soft_e4 8888, squarely in the
    [0.7, 0.9) needs_review band with no subset and no letter mismatch."""
    rows = [
        "alpha bravo charlie delta uu vv",
        "alpha bravo charlie delta ww xx",
        "uu vv ww xx filler one",
        "uu vv ww xx filler two",
        "uu vv ww xx filler three",
    ]
    got = _fuzzy(spark, rows, [(0, 1)])
    r = got[(0, 1)]
    assert r["soft_e4"] == 8888, r
    assert r["fuzzy_status"] == "needs_review"
