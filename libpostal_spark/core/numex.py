"""numex: spelled-out numbers → numeric tokens (reference: src/numex.c).

The reference parses number words with per-language rule tables and
left-to-right value composition (``numex_search``, src/numex.c:1260) —
"three hundred twenty one" → 321 — plus gated Roman-numeral parsing
(ambiguity-checked: "mix"/"dim"/"i" are words too, src/numex.c Roman rules).

This module is the English-cardinal/ordinal analog with the same
composition algorithm (value accumulation with multiplier groups) as a pure
token-stream function, plus a strict-syntax Roman parser kept OPT-IN for
the same ambiguity reason the reference gates it.

Batch entry point ``fold_spelled_numbers_batch`` is prefilter-vectorized:
a single compiled regex finds the rows that contain any number word at all
(zero per-row Python for the all-code common case); only matching rows run
the per-token scan — mirroring how the reference only walks its trie on
alphabetic spans.
"""

from __future__ import annotations

import re

import pandas as pd

UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
MULTIPLIERS = {"hundred": 100, "thousand": 1_000, "million": 1_000_000}
ORDINAL_UNITS = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19,
}
ORDINAL_TENS = {
    "twentieth": 20, "thirtieth": 30, "fortieth": 40, "fiftieth": 50,
    "sixtieth": 60, "seventieth": 70, "eightieth": 80, "ninetieth": 90,
}
ORDINAL_MULTS = {"hundredth": 100, "thousandth": 1_000, "millionth": 1_000_000}

_ALL_WORDS = (
    set(UNITS) | set(TENS) | set(MULTIPLIERS)
    | set(ORDINAL_UNITS) | set(ORDINAL_TENS) | set(ORDINAL_MULTS) | {"and"}
)
# prefilter: does the string contain ANY number word (token-bounded)?
_PREFILTER = re.compile(
    r"(?:^| )(?:"
    + "|".join(sorted(_ALL_WORDS - {"and"}, key=len, reverse=True))
    + r")(?: |$)"
)

# strict Roman syntax (subtractive notation only), length >= 2
_ROMAN = re.compile(r"^(?=[ivxlcdm]{2,}$)m{0,3}(cm|cd|d?c{0,3})(xc|xl|l?x{0,3})(ix|iv|v?i{0,3})$")
_ROMAN_VALUES = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}


def roman_value(tok: str) -> int | None:
    """Strict-syntax Roman numeral value, else None. Single letters are
    always rejected (i/c/d/m are ordinary identifiers); longer sequences
    that happen to be words ("mix", "dim") are the reference's documented
    ambiguity class — callers opt in via fold_roman."""
    if not _ROMAN.match(tok):
        return None
    total = 0
    prev = 0
    for ch in reversed(tok):
        v = _ROMAN_VALUES[ch]
        total = total - v if v < prev else total + v
        prev = max(prev, v)
    return total


def _and_extends(nt: str, current: int, total: int) -> bool:
    """Would the word after an 'and' legally EXTEND the current run?

    The connective is swallowed only then — "one hundred and two" → 102 —
    while "two and three" keeps its 'and' (the 'three' starts a NEW number,
    so deleting the connective would make "two and three" canonicalize
    identically to "two three", a false merge)."""
    if nt in UNITS:
        v = UNITS[nt]
        if v == 0:
            return False                   # zero never extends
        if current == 0:
            return True                    # fresh group after a multiplier
        return current % 10 == 0 if v < 10 else current % 100 == 0
    if nt in ORDINAL_UNITS:
        v = ORDINAL_UNITS[nt]
        if current == 0:
            return True
        return current % 10 == 0 if v < 10 else current % 100 == 0
    if nt in TENS or nt in ORDINAL_TENS:
        return current % 100 == 0
    # multipliers close the open group, always legal mid-run
    return nt in MULTIPLIERS or nt in ORDINAL_MULTS


def fold_spelled_numbers(tokens: list[str], fold_roman: bool = False) -> list[str]:
    """Left-to-right numex composition over a token stream.

    A maximal run of number words collapses to one numeric token using the
    reference's accumulation rule: units/teens add into the current group,
    tens add (allowing a following unit), "hundred" multiplies the current
    group (empty group counts as 1), larger multipliers close the group
    into the running total. Ordinals terminate their run (reference:
    ordinal rules are terminal). "and" inside a run ("one hundred and two")
    is swallowed exactly when more number words follow.
    """
    out: list[str] = []
    i, n = 0, len(tokens)
    while i < n:
        tok = tokens[i]
        if not (
            tok in UNITS or tok in TENS or tok in ORDINAL_UNITS
            or tok in ORDINAL_TENS
        ):
            if fold_roman and (rv := roman_value(tok)) is not None:
                out.append(str(rv))
                i += 1
                continue
            out.append(tok)
            i += 1
            continue
        # start a number run. Extension legality mirrors the reference's
        # rule machine: a tens/teens word only extends a group whose
        # sub-hundred part is empty, a unit only a group ending in a tens
        # (or hundreds) slot — so "nineteen eighty four" reads 19 | 84,
        # not 103, while "three hundred twenty one" composes to 321.
        total = 0
        current = 0
        terminal = False

        def _legal(t: str) -> bool:
            if t in UNITS:
                v = UNITS[t]
                if current == 0 and total == 0:
                    return True             # run start
                if v == 0:
                    return False            # zero never extends a number
                if current == 0:
                    return True             # fresh group after a closed multiplier
                return current % 10 == 0 if v < 10 else current % 100 == 0
            if t in TENS:
                return current % 100 == 0
            return True

        while i < n and not terminal:
            t = tokens[i]
            if t in UNITS:
                if not _legal(t):
                    break
                current += UNITS[t]
                if UNITS[t] == 0:
                    i += 1
                    break                   # "zero" is a standalone number
            elif t in TENS:
                if not _legal(t):
                    break
                current += TENS[t]
            elif t in MULTIPLIERS:
                v = MULTIPLIERS[t]
                if v == 100:
                    current = max(current, 1) * 100
                else:
                    total += max(current, 1) * v
                    current = 0
            elif t in ORDINAL_UNITS:
                v = ORDINAL_UNITS[t]
                # same legality as cardinal units: current == 0 covers both
                # the run start AND a fresh group after a closed multiplier
                # ("two thousand first" = 2001st, exactly like "two thousand
                # one"); otherwise the divisibility rule
                if current != 0 and not (
                    current % 10 == 0 if v < 10 else current % 100 == 0
                ):
                    break
                current += v
                terminal = True
            elif t in ORDINAL_TENS:
                if current % 100 != 0:
                    break
                current += ORDINAL_TENS[t]
                terminal = True
            elif t in ORDINAL_MULTS:
                v = ORDINAL_MULTS[t]
                if v == 100:
                    current = max(current, 1) * 100
                else:
                    total += max(current, 1) * v
                    current = 0
                terminal = True
            elif t == "and" and i + 1 < n and _and_extends(
                tokens[i + 1], current, total
            ):
                pass                                   # swallow connective
            else:
                break
            i += 1
        out.append(str(total + current))
    return out


# the full rule-table language registry (en here; fr/de/es in numex_ml;
# it/pt/nl/ru in numex_ml2; zh/ja in numex_cjk) — the per-row router and
# the CLI choices both key off this
KNOWN_NUMEX_LANGS = frozenset(
    ("en", "fr", "de", "es", "it", "pt", "nl", "ru", "zh", "ja")
)


def fold_spelled_numbers_batch(
    joined: pd.Series, fold_roman: bool = False, lang: str = "en"
) -> pd.Series:
    """Batch wrapper over space-joined canon strings: regex prefilter marks
    the rows containing any number word; only those run the token scan.

    ``lang`` selects the numex rule table, mirroring the reference's
    per-language numex gating (src/numex.c:1260, data numex_data.c):
    "en" (this module) or "fr"/"de"/"es" (core/numex_ml.py). Non-English
    prefilters probe an accent-stripped copy so "zéro"/"dieciséis" rows
    are not skipped when the transliterate stage didn't run upstream.
    """
    if lang != "en":
        from .numex_ml import LANG_FOLDERS

        if lang in LANG_FOLDERS:
            folder, prefilter = LANG_FOLDERS[lang]
        else:
            from .numex_cjk import LANG_FOLDERS_CJK
            from .numex_ml2 import LANG_FOLDERS2

            if lang in LANG_FOLDERS2:
                folder, prefilter = LANG_FOLDERS2[lang]
            else:
                folder, prefilter = LANG_FOLDERS_CJK[lang]
        probe = joined.str.normalize("NFD").str.replace(
            "[\u0300-\u036f]", "", regex=True
        )
        hit = probe.str.contains(prefilter)
        if fold_roman:
            hit = hit | joined.str.contains(
                r"(?:^| )[ivxlcdm]{2,}(?: |$)", regex=True
            )
        if not hit.any():
            return joined
        joined = joined.copy()
        if fold_roman:
            def _fold(s: str) -> str:
                toks = folder(s.split(" "))
                return " ".join(
                    str(rv)
                    if (rv := roman_value(t)) is not None else t
                    for t in toks
                )
            joined[hit] = joined[hit].map(_fold)
        else:
            joined[hit] = joined[hit].map(
                lambda s: " ".join(folder(s.split(" ")))
            )
        return joined
    hit = joined.str.contains(_PREFILTER)
    if fold_roman:
        hit = hit | joined.str.contains(
            r"(?:^| )[ivxlcdm]{2,}(?: |$)", regex=True
        )
    if not hit.any():
        return joined
    joined = joined.copy()
    joined[hit] = joined[hit].map(
        lambda s: " ".join(fold_spelled_numbers(s.split(" "), fold_roman))
    )
    return joined
