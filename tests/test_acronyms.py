"""Acronym-phrase alignment operator (reference: src/acronyms.c)."""

from libpostal_spark.operators import dedup


def _run(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )
    return {
        (r["doc_id1"], r["doc_id2"]): (r["n_acronyms"], r["acronyms"])
        for r in dedup.acronym_pairs(docs).collect()
    }


def test_basic_acronym_match(spark):
    got = _run(spark, ["nyu campus", "the new york university campus"])
    assert got[(0, 1)] == (1, "nyu")


def test_multiple_and_sorted(spark):
    got = _run(spark, ["gpu and nyu", "new york university graphics processing unit"])
    assert got[(0, 1)] == (2, "gpu,nyu")


def test_no_match_and_direction(spark):
    # directional: expansion-side tokens don't acronym the acronym side
    got = _run(spark, ["new york university", "nyu campus"])
    assert got[(0, 1)][0] == 0
    # no accidental matches on unrelated text
    got = _run(spark, ["tcp stack", "alpha beta charlie"])
    assert got[(0, 1)][0] == 0


def test_run_must_be_contiguous(spark):
    # n-y-u initials exist but not contiguously -> no match
    got = _run(spark, ["nyu", "new haven york city university"])
    assert got[(0, 1)][0] == 0


def test_length_bounds_and_alpha_only(spark):
    # 1-letter tokens and >6-letter tokens are never acronym candidates;
    # digits disqualify
    got = _run(spark, ["a abcdefgh x9y", "alpha anything"])
    assert got[(0, 1)][0] == 0


def test_token_cap_bounds_work(spark):
    # the phrase beyond the first 12 tokens of B is invisible by contract
    filler = " ".join(f"w{i}" for i in range(12))
    got = _run(spark, ["nyu", filler + " new york university"])
    assert got[(0, 1)][0] == 0
