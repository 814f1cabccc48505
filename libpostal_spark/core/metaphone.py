"""Double Metaphone phonetic codes (primary + secondary), full length.

Behavior parity target: /root/reference/src/double_metaphone.c:1-980 —
libpostal's variant of Lawrence Philips's Double Metaphone (C/C++ Users
Journal, 2000; the rule set is public knowledge). The reference emits these
codes as an extra blocking-key family for fuzzy name dedup
(/root/reference/src/near_dupe.c:389), which is exactly how
``operators/blocking.py`` can consume them via config.

Differences from the "classic" Philips algorithm that the reference makes
and this kernel reproduces:

* codes are FULL LENGTH — no 4-character truncation;
* input is uppercased then NFD-normalized, so decomposable accents become
  base letter + combining mark; combining marks are skipped by the scan,
  with two explicit sequence rules (C+cedilla → S, N+tilde → N);
* the "SC" sub-rules for SCI/SCE/SCY and generic SC→SK are DEAD CODE in
  the reference (both arms of the SCH branch ``continue`` before reaching
  them, double_metaphone.c:743-787), so "SC" not followed by "H" falls
  through to the generic S and C rules ("SCIENCE" → SSNS/SXNS, not the
  classic SNS) — matched here by simply not implementing the dead branch;
* a few added contexts (MC→K for "ch", okina/apostrophe stripping, the
  word-final/pre-space J rule, "TTH", Ç/Ñ sequences).

One knowing divergence: the reference strips a leading apostrophe/okina by
advancing the string pointer WITHOUT recomputing ``len``, so for such
inputs its word-final checks see a phantom trailing NUL. This kernel strips
and uses the true length; inputs with a leading apostrophe are the only
strings affected.

Everything here was written from the rule descriptions above; no reference
code was copied.
"""

from __future__ import annotations

import unicodedata

_VOWELS = frozenset("AEIOUY")
_CEDILLA = "̧"
_TILDE = "̃"


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def double_metaphone(text: str | None) -> tuple[str, str] | None:
    """Return (primary, secondary) codes, or None for None input."""
    if text is None:
        return None
    s = unicodedata.normalize("NFD", text.upper())
    if s.startswith("ʻ") or s.startswith("'"):
        s = s[1:]
    L = len(s)
    last = L - 1
    slavo = _slavo_germanic(s)

    def ch(i: int) -> str:
        return s[i] if 0 <= i < L else ""

    def vowel(i: int) -> bool:
        return ch(i) in _VOWELS

    def isat(i: int, *opts: str) -> bool:
        if i < 0 or i >= L:
            return False
        for o in opts:
            if s[i : i + len(o)] == o:
                return True
        return False

    pri: list[str] = []
    sec: list[str] = []

    def emit(p: str, q: str | None = None) -> None:
        if p:
            pri.append(p)
        if q is None:
            q = p
        if q:
            sec.append(q)

    i = 0
    if isat(0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    elif ch(0) == "X":
        emit("S")
        i = 1

    while i < L:
        c = s[i]

        if i == 0 and c in _VOWELS:
            emit("A")
            i += 1

        elif c == "B":
            emit("P")
            i += 2 if ch(i + 1) == "B" else 1

        elif c == "C" and ch(i + 1) == _CEDILLA:
            emit("S")
            i += 2

        elif c == "C":
            # germanic -ACH- (not preceded by vowel; "BACHER"/"MACHER" ok)
            if (
                i > 1
                and not vowel(i - 2)
                and isat(i - 1, "ACH")
                and not isat(i + 2, "O", "A", "U")
                and ch(i + 2) != "I"
                and (ch(i + 2) != "E" or isat(i - 2, "BACHER", "MACHER"))
            ):
                emit("K")
                i += 2
            elif i == 0 and isat(0, "CAESAR"):
                emit("S", "K")
                i += 2
            elif isat(i, "CHIA"):
                emit("K")
                i += 2
            elif isat(i, "CH"):
                if i > 0 and isat(i, "CHAE"):
                    emit("K", "X")
                elif i == 0 and (
                    isat(1, "HARAC", "HARIS", "HIRO", "HAOS", "HAOT")
                    or (
                        isat(1, "HOR", "HYM", "HIA", "HEM", "HIM")
                        and not isat(1, "HEMIN")
                    )
                ):
                    emit("K")
                elif (
                    isat(0, "VAN ", "VON ", "SCH")
                    or isat(i - 5, " VAN ", " VON ")
                    or isat(i - 2, "ORCHES", "ARCHIT", "ORCHID")
                    or isat(i + 2, "T", "S")
                    or (
                        (i == 0 or isat(i - 1, "A", "O", "U", "E"))
                        and not isat(i - 2, "EA", "OU", "EE", "OA", "OO", "AU")
                        and not isat(i - 1, "L", "R", "N")
                        and (
                            i + 1 == last
                            or isat(
                                i + 2,
                                "L", "R", "N", "M", "B", "H", "F", "V", "W", " ",
                            )
                        )
                    )
                ):
                    emit("K")
                elif i > 0:
                    emit("K" if isat(0, "MC") else "X", "K")
                else:
                    emit("X")
                i += 2
            elif isat(i, "CZ") and not isat(i - 2, "WICZ"):
                emit("S", "X")
                i += 2
            elif isat(i, "CC") and not (i == 1 and ch(0) == "M"):
                if isat(i + 2, "I", "E", "H") and not isat(
                    i + 2, "HUS", "HUM", "HUN", "HAN"
                ):
                    if (i == 1 and ch(0) == "A") or isat(i - 1, "UCCEE", "UCCES"):
                        emit("KS")
                    elif ch(i + 2) == "H" and not isat(i + 2, "HU", "HA"):
                        emit("K", "X")
                    else:
                        emit("X")
                    i += 3
                else:  # Pierce's rule
                    emit("K")
                    i += 2
            elif isat(i, "CK", "CG", "CQ"):
                emit("K")
                i += 2
            elif isat(i, "CI", "CJ", "CE", "CY"):
                if isat(i, "CIO", "CIE", "CIA", "CIU"):
                    emit("S", "X")
                else:
                    emit("S")
                i += 2
            else:
                emit("K")
                if isat(i + 1, " C", " Q", " G"):
                    i += 3
                elif isat(i + 1, "C", "K", "Q") and not isat(i + 1, "CE", "CI"):
                    i += 2
                else:
                    i += 1

        elif c == "D":
            if isat(i, "DG"):
                if isat(i + 2, "I", "E", "Y"):
                    emit("J")
                    i += 3
                else:
                    emit("TK")
                    i += 2
            elif isat(i, "DT", "DD"):
                emit("T")
                i += 2
            else:
                emit("T")
                i += 1

        elif c == "F":
            emit("F")
            i += 2 if ch(i + 1) == "F" else 1

        elif c == "G":
            if ch(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    emit("K")
                elif i == 0:
                    emit("J" if ch(2) == "I" else "K")
                elif (
                    (i > 1 and isat(i - 2, "B", "H", "D"))
                    or (i > 2 and isat(i - 3, "B", "H", "D"))
                    or (i > 3 and isat(i - 4, "B", "H"))
                ):
                    pass  # silent (Parker's rule): "hugh", "bough", "broughton"
                elif i > 2 and ch(i - 1) == "U" and isat(
                    i - 3, "C", "G", "L", "R", "T"
                ):
                    emit("F")  # "laugh", "cough", "rough", "tough"
                elif i > 0 and ch(i - 1) != "I":
                    emit("K")
                i += 2
            elif ch(i + 1) == "N":
                if i == 1 and vowel(0) and not slavo:
                    emit("KN", "N")
                elif not isat(i + 2, "EY") and ch(i + 1) != "Y" and not slavo:
                    emit("N", "KN")
                else:
                    emit("KN")
                i += 2
            elif isat(i + 1, "LI") and not slavo:
                emit("KL", "L")
                i += 2
            elif i == 0 and (
                ch(1) == "Y"
                or isat(
                    1, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE",
                    "EI", "ER",
                )
            ):
                emit("K", "J")
                i += 2
            elif (
                (isat(i + 1, "ER") or ch(i + 1) == "Y")
                and not isat(0, "DANGER", "RANGER", "MANGER")
                and not isat(i - 1, "E", "I")
                and not isat(i - 1, "RGY", "OGY")
            ):
                emit("K", "J")
                i += 2
            elif isat(i + 1, "E", "I", "Y") or isat(i - 1, "AGGI", "OGGI"):
                if (
                    isat(0, "VAN ", "VON ", "SCH")
                    or isat(i - 5, " VAN ", " VON ")
                    or isat(i + 1, "ET")
                ):
                    emit("K")
                elif isat(i + 1, "IER ") or (i == L - 3 and isat(i + 1, "IER")):
                    emit("J")
                else:
                    emit("J", "K")
                i += 2
            else:
                emit("K")
                i += 2 if ch(i + 1) == "G" else 1

        elif c == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                emit("H")
                i += 2
            else:
                i += 1

        elif c == "J":
            if isat(i, "JOSE") or isat(0, "SAN "):
                if (i == 0 and ch(4) == " ") or isat(0, "SAN "):
                    emit("H")
                else:
                    emit("J", "H")
                i += 1
            elif i == 0:
                emit("J", "A")  # Yankelovich / Jankelowicz
                i += 1
            else:
                if vowel(i - 1) and not slavo and ch(i + 1) in ("A", "O"):
                    emit("J", "H")
                elif i == last or (
                    (i == last - 1 or ch(i + 2) == " ")
                    and ch(i - 1).isalpha()
                    and ch(i + 1) in ("A", "O")
                ):
                    emit("J", "")
                elif not isat(
                    i + 1, "L", "T", "K", "S", "N", "M", "B", "Z"
                ) and not isat(i - 1, "S", "K", "L"):
                    emit("J")
                i += 2 if ch(i + 1) == "J" else 1

        elif c == "K":
            emit("K")
            i += 2 if ch(i + 1) == "K" else 1

        elif c == "L":
            if ch(i + 1) == "L" and (
                (i == L - 3 and isat(i - 1, "ILLO", "ILLA", "ALLE"))
                or (
                    (isat(last - 1, "AS", "OS") or isat(last, "A", "O"))
                    and isat(i - 1, "ALLE")
                )
            ):
                emit("L", "")  # Spanish -LL-: "Cabrillo", "Gallegos"
                i += 2
            else:
                emit("L")
                i += 2 if ch(i + 1) == "L" else 1

        elif c == "M":
            emit("M")
            if (
                isat(i - 1, "UMB") and (i + 1 == last or isat(i + 2, "ER"))
            ) or ch(i + 1) == "M":
                i += 2
            else:
                i += 1

        elif c == "N" and ch(i + 1) == _TILDE:
            emit("N")
            i += 2

        elif c == "N":
            emit("N")
            i += 2 if ch(i + 1) == "N" else 1

        elif c == "P":
            if isat(i + 1, "H", "F"):
                emit("F")
                i += 2
            else:
                emit("P")
                i += 2 if isat(i + 1, "P", "B") else 1

        elif c == "Q":
            emit("K")
            i += 2 if ch(i + 1) == "Q" else 1

        elif c == "R":
            if (
                i == last
                and not slavo
                and isat(i - 2, "IE")
                and not isat(i - 4, "ME", "MA")
            ):
                emit("", "R")  # French final -IER: "rogier"
            else:
                emit("R")
            i += 2 if ch(i + 1) == "R" else 1

        elif c == "S":
            if isat(i - 1, "ISL", "YSL"):
                i += 1  # silent: "island", "isle", "carlisle"
            elif i == 0 and isat(0, "SUGAR"):
                emit("X", "S")
                i += 1
            elif isat(i, "SH"):
                if isat(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    emit("S")
                else:
                    emit("X")
                i += 2
            elif isat(i, "SIO", "SIA") or isat(i, "SIAN"):
                emit("S", "S" if slavo else "X")
                i += 3
            elif (i == 0 and isat(1, "M", "N", "L", "W")) or isat(i + 1, "Z"):
                emit("S", "X")  # "Smith"~"Schmidt"; Slavic -SZ-
                i += 2 if isat(i + 1, "Z") else 1
            elif isat(i, "SC") and ch(i + 2) == "H":
                # NOTE: the reference's SCI/SCE/SCY and generic SC→SK arms
                # are unreachable (see module docstring); only SCH is live.
                if isat(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                    if isat(i + 3, "ER", "EN"):
                        emit("X", "SK")  # "Schermerhorn", "Schenker"
                    else:
                        emit("SK")  # "school", "schooner"
                elif i == 0 and not vowel(3) and ch(3) != "W":
                    emit("X", "S")
                else:
                    emit("X")
                i += 3
            else:
                if i == last and isat(i - 2, "AI", "OI"):
                    emit("", "S")  # French: "resnais", "artois"
                else:
                    emit("S")
                i += 2 if isat(i + 1, "S", "Z") else 1

        elif c == "T":
            if isat(i, "TION"):
                emit("X")
                i += 3
            elif isat(i, "TIA", "TCH"):
                emit("X")
                i += 3
            elif isat(i, "TH") or isat(i, "TTH"):
                if (
                    isat(i + 2, "OM", "AM")
                    or isat(0, "VAN ", "VON ", "SCH")
                    or isat(i - 5, " VAN ", " VON ")
                ):
                    emit("T")
                else:
                    emit("0", "T")
                i += 2
            else:
                emit("T")
                i += 2 if isat(i + 1, "T", "D") else 1

        elif c == "V":
            emit("F")
            i += 2 if ch(i + 1) == "V" else 1

        elif c == "W":
            if isat(i, "WR"):
                emit("R")
                i += 2
            else:
                if i == 0 and (vowel(1) or isat(0, "WH")):
                    emit("A", "F" if vowel(1) else "A")
                if (
                    (i == last and vowel(i - 1))
                    or isat(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or isat(0, "SCH")
                ):
                    emit("", "F")  # "Arnow" ~ "Arnoff"
                    i += 1
                elif isat(i, "WICZ", "WITZ"):
                    emit("TS", "FX")  # Polish: "Filipowicz"
                    i += 4
                else:
                    i += 1

        elif c == "X":
            if not (
                i == last
                and (isat(i - 3, "IAU", "EAU") or isat(i - 2, "AU", "OU"))
            ):
                emit("KS")  # silent in French: "breaux"
            i += 2 if isat(i + 1, "C", "X") else 1

        elif c == "Z":
            if ch(i + 1) == "H":
                emit("J")  # Chinese pinyin: "Zhao"
                i += 2
            else:
                if isat(i + 1, "ZO", "ZI", "ZA") or (
                    slavo and i > 0 and ch(i - 1) != "T"
                ):
                    emit("S", "TS")
                else:
                    emit("S")
                i += 2 if ch(i + 1) == "Z" else 1

        else:
            i += 1

    return "".join(pri), "".join(sec)


def double_metaphone_batch(values) -> list[tuple[str, str] | None]:
    """Apply over a sequence, computing each DISTINCT string once.

    The per-string scan is inherently sequential (a position-dependent rule
    cascade), so the batch form's job is to amortize: unique-ify the Arrow
    batch, run the scalar once per distinct value, and gather. Name-like
    columns are highly repetitive, so this typically cuts the Python work by
    the duplication factor.
    """
    cache: dict[str, tuple[str, str]] = {}
    out: list[tuple[str, str] | None] = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        hit = cache.get(v)
        if hit is None:
            hit = double_metaphone(v)
            cache[v] = hit
        out.append(hit)
    return out
