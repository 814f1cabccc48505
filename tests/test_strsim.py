"""String-similarity kernels vs hand goldens + DuckDB built-in lockstep.

The harness oracle compares these operators against DuckDB's
levenshtein / damerau_levenshtein / jaro_winkler_similarity, so the pinned
property is exact agreement with those built-ins (which themselves follow
the textbook definitions the reference implements in
src/damerau_levenshtein.c and src/jaro.c).
"""

import random

import numpy as np
import pandas as pd
import pytest

from libpostal_spark.core import strsim


def _one(fn, a, b, **kw):
    return fn(pd.Series([a]), pd.Series([b]), **kw)[0]


def test_levenshtein_goldens():
    cases = [
        ("kitten", "sitting", 3),
        ("", "", 0),
        ("", "abc", 3),
        ("abc", "", 3),
        ("abc", "abc", 0),
        ("flaw", "lawn", 2),
    ]
    for a, b, want in cases:
        assert _one(strsim.levenshtein_batch, a, b) == want, (a, b)


def test_damerau_is_unrestricted():
    # the discriminating case: OSA gives 3, unrestricted gives 2
    assert _one(strsim.damerau_levenshtein_batch, "ca", "abc") == 2
    assert _one(strsim.damerau_levenshtein_batch, "ab", "ba") == 1
    assert _one(strsim.damerau_levenshtein_batch, "abcdef", "abcdef") == 0
    assert _one(strsim.damerau_levenshtein_batch, "", "xy") == 2
    # transposition + substitution compose
    assert _one(strsim.damerau_levenshtein_batch, "abxcd", "bacd") == 2


def test_jaro_winkler_goldens():
    # classic textbook values
    assert _one(strsim.jaro_winkler_batch, "MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111
    )
    assert _one(strsim.jaro_winkler_batch, "DIXON", "DICKSONX") == pytest.approx(
        0.8133333333333332
    )
    assert _one(strsim.jaro_winkler_batch, "DWAYNE", "DUANE") == pytest.approx(0.84)
    assert _one(strsim.jaro_winkler_batch, "", "") == 0.0
    assert _one(strsim.jaro_winkler_batch, "", "abc") == 0.0
    assert _one(strsim.jaro_winkler_batch, "same", "same") == 1.0


def test_duckdb_lockstep_fuzz():
    """Bit-level agreement with DuckDB's built-ins on random pairs —
    the exact property the harness oracle depends on."""
    duckdb = pytest.importorskip("duckdb")
    random.seed(1234)
    alpha = "abcdefg hij"
    pairs = []
    for _ in range(1500):
        la, lb = random.randint(0, 14), random.randint(0, 14)
        s1 = "".join(random.choice(alpha) for _ in range(la))
        s2 = "".join(random.choice(alpha) for _ in range(lb))
        if random.random() < 0.3:          # correlated pairs hit the
            s2 = s1[: random.randint(0, la)] + s2   # prefix-boost branch
        pairs.append((s1, s2))
    df = pd.DataFrame(pairs, columns=["s1", "s2"])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT levenshtein(s1,s2) l, damerau_levenshtein(s1,s2) dl, "
        "jaro_winkler_similarity(s1,s2) jw FROM t"
    ).fetchdf()
    assert (
        strsim.levenshtein_batch(df.s1, df.s2) == want.l.to_numpy()
    ).all()
    assert (
        strsim.damerau_levenshtein_batch(df.s1, df.s2) == want.dl.to_numpy()
    ).all()
    got = strsim.jaro_winkler_batch(df.s1, df.s2)
    assert (got == want.jw.to_numpy()).all()  # bit-equal, not approx


def _scalar_affine(a, b, mis=2, go=2, ge=1):
    """Scalar three-state Gotoh reference for the fuzz check."""
    INF = 10 ** 9
    m, n = len(a), len(b)
    M = [[INF] * (n + 1) for _ in range(m + 1)]
    X = [[INF] * (n + 1) for _ in range(m + 1)]
    Y = [[INF] * (n + 1) for _ in range(m + 1)]
    M[0][0] = 0
    for j in range(1, n + 1):
        X[0][j] = go + ge * j
    for i in range(1, m + 1):
        Y[i][0] = go + ge * i
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            M[i][j] = min(M[i - 1][j - 1], X[i - 1][j - 1], Y[i - 1][j - 1]) + (
                0 if a[i - 1] == b[j - 1] else mis
            )
            X[i][j] = min(min(M[i][j - 1], Y[i][j - 1]) + go + ge, X[i][j - 1] + ge)
            Y[i][j] = min(min(M[i - 1][j], X[i - 1][j]) + go + ge, Y[i - 1][j] + ge)
    return min(M[m][n], X[m][n], Y[m][n])


def test_affine_gap_goldens():
    cases = [
        ("abc", "abc", 0),
        ("abc", "abdc", 3),       # one opened 1-char gap: 2 + 1
        ("", "abc", 5),           # gap of 3: 2 + 3
        ("intl", "international", 11),   # i,n,t,l match; 9-char gap: 2 + 9
        ("kitten", "sitting", 7), # 2 subs (4) + 1-char gap (3)
        ("fn", "function", 8),    # f..n(final) match; 6-char gap: 2 + 6
    ]
    for a, b, want in cases:
        assert _one(strsim.affine_gap_batch, a, b) == want, (a, b)
        # affine gap rewards contiguous gaps: never worse than lev * mismatch
        assert _one(strsim.affine_gap_batch, a, b) <= max(
            2 * _one(strsim.levenshtein_batch, a, b), 0
        ) + 2


def test_affine_gap_fuzz_vs_scalar():
    random.seed(77)
    pairs = [
        (
            "".join(random.choice("abcd") for _ in range(random.randint(0, 10))),
            "".join(random.choice("abcd") for _ in range(random.randint(0, 10))),
        )
        for _ in range(300)
    ]
    got = strsim.affine_gap_batch(
        pd.Series([p[0] for p in pairs]), pd.Series([p[1] for p in pairs])
    )
    for (a, b), g in zip(pairs, got):
        assert g == _scalar_affine(a, b), (a, b)


def test_is_abbreviation():
    s1 = pd.Series(["intl", "fn", "abc", "new", "ab", "a"])
    s2 = pd.Series(["international", "function", "abc", "york", "cab", "aaa"])
    got = list(strsim.is_abbreviation_batch(s1, s2))
    #                 subseq+prefix  subseq  equal-len  no     b0 differs  len<2
    assert got == [True, True, False, False, False, False]


def test_max_len_truncation():
    """Strings compare over their first max_len chars only (dp cost bound)."""
    a = "x" * 40 + "suffix_a"
    b = "x" * 40 + "other_b"
    assert _one(strsim.levenshtein_batch, a, b, max_len=32) == 0
    assert _one(strsim.jaro_winkler_batch, a, b, max_len=32) == 1.0


def test_nulls_and_batch_mix():
    s1 = pd.Series(["abc", None, "", "ba"])
    s2 = pd.Series([None, None, "x", "ab"])
    lev = strsim.levenshtein_batch(s1, s2)
    assert list(lev) == [3, 0, 1, 2]
    dl = strsim.damerau_levenshtein_batch(s1, s2)
    assert list(dl) == [3, 0, 1, 1]


def test_abbrev_flags_batch():
    """Symmetric (abrv, strict) flags for the full Soft-TFIDF ladder
    (reference string_similarity.c:289-318): abrv = shorter side is a
    first-char-sharing strict subsequence of the longer (either
    direction, NO minimum length); strict = full prefix OR abrv with
    matching last characters."""
    cases = [
        # (a, b, abrv, strict)
        ("internatl", "international", True, True),   # subseq, last 'l'='l'
        ("blvd", "boulevard", True, True),            # subseq, last 'd'='d'
        ("boulevard", "blvd", True, True),            # symmetric
        ("plz", "plaza", True, False),                # subseq, last z≠a, prefix 'pl'<3
        ("1", "1st", True, True),                     # single-char full prefix
        ("21", "21st", True, True),                   # full prefix
        ("abc", "abd", False, False),                 # equal length → never abrv
        ("xyz", "abcxyz", False, False),              # first chars differ
        ("stn", "stone", True, False),                # subseq, last n≠e, prefix 'st'<3
        ("", "abc", False, False),                    # empty side
    ]
    s1 = pd.Series([a for a, _, _, _ in cases])
    s2 = pd.Series([b for _, b, _, _ in cases])
    abrv, strict = strsim.abbrev_flags_batch(s1, s2)
    for (a, b, ea, es), ga, gs in zip(cases, abrv, strict):
        assert bool(ga) == ea, (a, b, "abrv", ga)
        assert bool(gs) == es, (a, b, "strict", gs)
