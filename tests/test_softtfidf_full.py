"""Full Soft-TFIDF match-ladder semantics (reference: src/soft_tfidf.c:240-465
with the :9-17 default options) — every rung, the abbreviation boost with
norm offsets, and the ordinal-vs-abbreviation mode split."""

from libpostal_spark.operators import softtfidf


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


def _row(spark, rows, **kw):
    out = softtfidf.soft_tfidf_full_pairs(_docs(spark, rows), **kw)
    return {(r["doc_id1"], r["doc_id2"]): r for r in out.collect()}[(0, 1)]


def test_equal_rung_identical_docs(spark):
    r = _row(spark, ["alpha beta gamma", "alpha beta gamma"])
    assert r["soft_e4"] == 10000
    assert r["n_matched"] == 3
    assert r["status"] == "likely_duplicate"


def test_no_rung_matches_disjoint(spark):
    r = _row(spark, ["zzz one", "qqq two"])
    assert r["soft_e4"] == 0 and r["n_matched"] == 0
    assert r["status"] == "non_duplicate"


def test_dl_rung_catches_low_jw_typo(spark):
    # jw("abcd","abxd") = 0.80 < 0.9 so the JW rung misses, but DL = 1 with
    # len >= 4 engages the typo rung (soft_tfidf.c:366-411)
    r = _row(spark, ["abcd nine", "abxd nine"])
    assert r["n_matched"] == 2
    assert 0 < r["soft_e4"] < 10000


def test_abbreviation_rung_standalone(spark):
    # 'blvd' ⊂ 'boulevard' (first+last chars agree → strict): the base
    # ladder (equal/JW/DL) cannot match it, the abbreviation rung does
    base = softtfidf.soft_tfidf_pairs(
        _docs(spark, ["blvd xing", "boulevard xing"])
    ).collect()[0]
    full = _row(spark, ["blvd xing", "boulevard xing"])
    assert base["n_matched"] == 1          # only 'xing'
    assert full["n_matched"] == 2
    assert full["soft_e4"] > base["soft_e4"]


def test_strict_abbreviation_floor_099(spark):
    # strict + len(a) >= 4 floors the rung sim at strict_abbreviation_sim
    # = 0.99 (soft_tfidf.c:14); with equal-weight singleton tokens the
    # pair score is exactly that sim
    r = _row(spark, ["blvd", "boulevard"])
    assert r["soft_e4"] == 9900
    assert r["status"] == "likely_duplicate"


def test_non_strict_abbreviation_uses_jw(spark):
    # 'plz' ⊂ 'plaza' but last chars differ and the common prefix is only
    # 'pl' → NOT strict; also len < 4, so no floor: sim = raw JW < 0.99
    r = _row(spark, ["plz", "plaza"])
    assert r["n_matched"] == 1
    assert 0 < r["soft_e4"] < 9900


def test_ordinal_rung_reachable_without_abbreviations(spark):
    # default options: '21' is a full prefix of '21st' → the abbreviation
    # rung shadows the ordinal rung (reference behavior). With
    # affine_gap_abbreviations=False the ordinal rung is reachable and
    # scores sim 1.0.
    on = _row(spark, ["21st street", "21 street"])
    off = _row(
        spark, ["21st street", "21 street"], affine_gap_abbreviations=False
    )
    assert on["n_matched"] == 2 and off["n_matched"] == 2
    assert off["soft_e4"] >= on["soft_e4"]   # ordinal sim 1.0 ≥ jw-based


def test_ordinal_off_and_abbrev_off_misses(spark):
    r = _row(
        spark,
        ["21st street", "21 street"],
        affine_gap_abbreviations=False,
        ordinal_suffixes=False,
    )
    assert r["n_matched"] == 1               # only 'street'


def test_jw_abbrev_boost_uses_max_weight_and_norm_offset(spark):
    # 'internatl' vs 'international': JW ≈ 0.9629 ≥ 0.9 (rung 2) AND the
    # best-JW B token is also the last abbreviating B → the boost path
    # scores max(jw, ab_sim)·max(w)² and offsets the smaller norm
    # (soft_tfidf.c:425-447). With both docs two tokens and one shared,
    # the boosted score must beat the plain-ladder score.
    base = softtfidf.soft_tfidf_pairs(
        _docs(spark, ["international house", "internatl house"])
    ).collect()[0]
    full = _row(spark, ["international house", "internatl house"])
    assert full["n_matched"] == 2
    assert full["soft_e4"] >= base["soft_e4"]
    assert full["status"] == "likely_duplicate"


def test_asymmetric_surplus_tokens_lower_score(spark):
    r = _row(spark, ["main st", "main st annex extra"])
    assert r["n_matched"] == 2
    assert 0 < r["soft_e4"] < 10000


def test_explicit_pairs_frame(spark):
    docs = _docs(spark, ["blvd xing", "boulevard xing", "other thing"])
    pairs = spark.createDataFrame([(0, 2)], ["doc_id1", "doc_id2"])
    out = softtfidf.soft_tfidf_full_pairs(docs, pairs).collect()
    assert len(out) == 1
    assert (out[0]["doc_id1"], out[0]["doc_id2"]) == (0, 2)


def test_no_abbrev_twin_matches_off_mode(spark):
    # the derived abbreviations-off columns must equal a genuine
    # affine_gap_abbreviations=False run on every fixture class
    rows = [
        "international house", "internatl house",
        "blvd xing", "boulevard xing",
        "21st street", "21 street",
        "abcd nine", "abxd nine",
        "zzz one", "qqq two",
        "plz district", "plaza district",
    ]
    docs = _docs(spark, rows)
    twin = {
        r["doc_id1"]: r
        for r in softtfidf.soft_tfidf_full_pairs(
            docs, with_no_abbrev_twin=True
        ).collect()
    }
    off = {
        r["doc_id1"]: r
        for r in softtfidf.soft_tfidf_full_pairs(
            docs, affine_gap_abbreviations=False
        ).collect()
    }
    assert set(twin) == set(off)
    for k in off:
        assert twin[k]["n_matched_noab"] == off[k]["n_matched"], k
        assert twin[k]["soft_e4_noab"] == off[k]["soft_e4"], k


def test_no_abbrev_twin_requires_abbrev_on(spark):
    import pytest as _pytest

    docs = _docs(spark, ["a b", "a c"])
    with _pytest.raises(ValueError):
        softtfidf.soft_tfidf_full_pairs(
            docs, affine_gap_abbreviations=False, with_no_abbrev_twin=True
        )
