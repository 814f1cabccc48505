"""Multi-language numex: French / German / Spanish spelled-number folding.

The reference ships per-language numex rule tables (data
/root/reference/src/numex_data.c:1-8871, loader+composer
/root/reference/src/numex.c:1260-...) and applies them gated on the
language in effect — SURVEY §2.3's own example is French:
"quatre vingt douze" → 92. This module is the fr/de/es analog of the
English composer in ``core/numex.py``, one folder per language because the
grammars genuinely differ:

  * French — vigesimal remnants: ``quatre vingt`` multiplies (4×20=80),
    ``soixante``/``quatre vingt`` extend with TEENS (soixante douze=72,
    quatre vingt dix sept=97), connective ``et`` (vingt et un=21).
  * German — numbers < 1e6 are ONE compound token with unit-before-tens
    order (einundzwanzig = ein+und+zwanzig = 21); folding requires a
    morpheme parser per token, the analog of the reference's
    concatenated-morpheme rules (numex rule flags for German-style
    agglutination).
  * Spanish — fused teens/twenties (dieciséis, veintidós) and fused
    hundreds (quinientos=500), connective ``y`` (treinta y dos=32).

Every folder normalizes its candidate token with a local accent fold
(NFD strip + ß→ss) so "dieciséis"/"dieciseis", "fünf"/"funf"/"fuenf" all
parse, independent of whether the transliterate stage ran upstream.
"""

from __future__ import annotations

import re
import unicodedata


def _fold_accents(tok: str) -> str:
    """Accent-insensitive key for table lookup: NFD, drop combining marks,
    ß→ss."""
    t = unicodedata.normalize("NFD", tok)
    t = "".join(ch for ch in t if not unicodedata.combining(ch))
    return t.replace("ß", "ss")


def _fold_de_tok(tok: str) -> str:
    """German token key: accent fold + the de umlaut-digraph convention
    (fuenf→funf, zwoelf→zwolf). Safe inside number morphemes — no German
    number word contains a true ae/oe/ue vowel pair — and a corrupted
    NON-number word simply fails the strict parse and passes through."""
    t = _fold_accents(tok)
    return t.replace("ue", "u").replace("oe", "o").replace("ae", "a")


# --------------------------------------------------------------------------
# French
# --------------------------------------------------------------------------

_FR_UNITS = {
    "zero": 0, "un": 1, "une": 1, "deux": 2, "trois": 3, "quatre": 4,
    "cinq": 5, "six": 6, "sept": 7, "huit": 8, "neuf": 9,
}
_FR_TEENS = {
    "dix": 10, "onze": 11, "douze": 12, "treize": 13, "quatorze": 14,
    "quinze": 15, "seize": 16,
}
_FR_TENS = {
    "vingt": 20, "vingts": 20, "trente": 30, "quarante": 40,
    "cinquante": 50, "soixante": 60,
}
_FR_MULTS = {
    "cent": 100, "cents": 100, "mille": 1_000, "milles": 1_000,
    "million": 1_000_000, "millions": 1_000_000,
}
_FR_ORD_UNITS = {
    "premier": 1, "premiere": 1, "second": 2, "seconde": 2, "unieme": 1,
    "deuxieme": 2, "troisieme": 3, "quatrieme": 4, "cinquieme": 5,
    "sixieme": 6, "septieme": 7, "huitieme": 8, "neuvieme": 9,
    "dixieme": 10, "onzieme": 11, "douzieme": 12, "treizieme": 13,
    "quatorzieme": 14, "quinzieme": 15, "seizieme": 16,
}
_FR_ORD_TENS = {
    "vingtieme": 20, "trentieme": 30, "quarantieme": 40,
    "cinquantieme": 50, "soixantieme": 60,
}
_FR_ORD_MULTS = {"centieme": 100, "millieme": 1_000, "millionieme": 1_000_000}

_FR_ALL = (
    set(_FR_UNITS) | set(_FR_TEENS) | set(_FR_TENS) | set(_FR_MULTS)
    | set(_FR_ORD_UNITS) | set(_FR_ORD_TENS) | set(_FR_ORD_MULTS)
)


def fold_fr(tokens: list[str]) -> list[str]:
    """French left-to-right composition. Group state mirrors the English
    composer; the French-specific transitions are the quatre×vingt pair,
    TEEN extension after a 20-multiple (soixante douze, quatre vingt onze),
    and the ``et`` connective."""
    out: list[str] = []
    i, n = 0, len(tokens)
    folded = [_fold_accents(t) for t in tokens]
    while i < n:
        t = folded[i]
        can_start = t in _FR_ALL and not (
            t in _FR_MULTS or t in _FR_ORD_MULTS
        ) or t == "mille"
        # 'mille' may START a run (mille neuf cent quatre vingt quatorze =
        # 1994 — unambiguous); cent/million need a preceding multiplicand
        if not can_start:
            out.append(tokens[i])
            i += 1
            continue
        total = 0
        current = 0
        terminal = False
        while i < n and not terminal:
            t = folded[i]
            if t in _FR_UNITS:
                v = _FR_UNITS[t]
                if v == 0:
                    if current == 0 and total == 0:
                        current = 0
                        i += 1
                    break                     # zéro is standalone
                if current == 0:
                    current = v
                elif (
                    v < 10 and current % 10 == 0
                ):
                    current += v
                else:
                    break
            elif t in _FR_TEENS:
                v = _FR_TEENS[t]
                if current == 0 and total == 0 and v == 10 and (
                    i + 1 < n and folded[i + 1] in ("sept", "huit", "neuf")
                ):
                    # dix sept / dix huit / dix neuf = 17/18/19
                    current = 10
                elif current == 0:
                    current = v
                elif current % 20 == 0 and current > 0:
                    # soixante onze = 71, quatre vingt douze = 92,
                    # soixante dix sept = 77 (dix lands first, unit extends)
                    current += v
                else:
                    break
            elif t in ("vingt", "vingts") and current % 100 == 4:
                current += 76                 # quatre vingt(s), also after a
                # hundreds group: neuf cent quatre vingt quatorze = 994
            elif t in _FR_TENS:
                if current % 100 == 0:
                    current += _FR_TENS[t]
                else:
                    break
            elif t in ("cent", "cents"):
                if current == 0 and total == 0:
                    break
                current = max(current, 1) * 100
            elif t in ("mille", "milles"):
                total += max(current, 1) * 1_000
                current = 0
            elif t in ("million", "millions"):
                if current == 0 and total == 0:
                    break                     # "million" needs a multiplicand
                total += max(current, 1) * 1_000_000
                current = 0
            elif t in _FR_ORD_UNITS:
                v = _FR_ORD_UNITS[t]
                if current == 0 or (
                    v < 10 and current % 10 == 0
                ) or (10 <= v and current % 20 == 0):
                    current += v
                    terminal = True
                else:
                    break
            elif t in _FR_ORD_TENS:
                if current % 100 == 0:
                    current += _FR_ORD_TENS[t]
                    terminal = True
                else:
                    break
            elif t in _FR_ORD_MULTS:
                v = _FR_ORD_MULTS[t]
                if v == 100:
                    current = max(current, 1) * 100
                else:
                    total += max(current, 1) * v
                    current = 0
                terminal = True
            elif t == "et" and i + 1 < n and (
                folded[i + 1] in _FR_UNITS
                or folded[i + 1] in _FR_TEENS
                or folded[i + 1] in _FR_ORD_UNITS
            ) and current > 0:
                pass                          # vingt et un, soixante et onze
            else:
                break
            i += 1
        out.append(str(total + current))
    return out


# --------------------------------------------------------------------------
# German — compound-token morpheme parser
# --------------------------------------------------------------------------

_DE_UNITS = {
    "ein": 1, "zwei": 2, "drei": 3, "vier": 4, "funf": 5, "sechs": 6,
    "sieben": 7, "acht": 8, "neun": 9,
}
_DE_TEENS = {
    "zehn": 10, "elf": 11, "zwolf": 12, "dreizehn": 13, "vierzehn": 14,
    "funfzehn": 15, "sechzehn": 16, "siebzehn": 17, "achtzehn": 18,
    "neunzehn": 19,
}
_DE_TENS = {
    "zwanzig": 20, "dreissig": 30, "vierzig": 40, "funfzig": 50,
    "sechzig": 60, "siebzig": 70, "achtzig": 80, "neunzig": 90,
}
# ordinal stems that are not (unit-stem + regular 't'): erste/dritte/siebte/achte
_DE_ORD_SPECIAL = {"ers": 1, "drit": 3, "sieb": 7, "ach": 8}

_DE_SUB100 = r"(?:{teens}|(?:(?:{units})und)?(?:{tens})|{units}|null)".format(
    teens="|".join(sorted(_DE_TEENS, key=len, reverse=True)),
    units="|".join(sorted(_DE_UNITS, key=len, reverse=True)),
    tens="|".join(sorted(_DE_TENS, key=len, reverse=True)),
)
_DE_NUMBER = re.compile(
    r"^(?:(?P<th>{sub}|(?:{units})?hundert(?:und)?(?:{sub})?)?tausend(?:und)?)?"
    r"(?:(?P<h>{units})?hundert(?:und)?)?"
    r"(?P<t>{sub})?$".format(
        sub=_DE_SUB100, units="|".join(sorted(_DE_UNITS, key=len, reverse=True))
    )
)
_DE_HAS_PART = re.compile(
    r"(?:hundert|tausend|und|{teens}|{tens})".format(
        teens="|".join(_DE_TEENS), tens="|".join(_DE_TENS)
    )
)


def _de_sub100(s: str) -> int:
    if not s:
        return 0
    if s == "null":
        return 0
    if s in _DE_TEENS:
        return _DE_TEENS[s]
    if s in _DE_UNITS:
        return _DE_UNITS[s]
    if "und" in s:
        u, _, t = s.partition("und")
        return _DE_UNITS[u] + _DE_TENS[t]
    return _DE_TENS[s]


def _de_sub_thousand(s: str) -> int:
    """Parse the thousands-multiplier span: either a plain sub-100 or
    (unit?)hundert(und?)(sub-100?)."""
    m = re.match(
        r"^(?:(?P<h>{units})?hundert(?:und)?)?(?P<t>{sub})?$".format(
            units="|".join(sorted(_DE_UNITS, key=len, reverse=True)),
            sub=_DE_SUB100,
        ),
        s,
    )
    if m is None:
        return _de_sub100(s)
    v = 0
    if "hundert" in s:
        v += (_DE_UNITS.get(m.group("h") or "", 1) or 1) * 100
    return v + _de_sub100(m.group("t") or "")


def german_number_value(tok: str) -> int | None:
    """Value of a German compound number token (< 1e6), else None.
    einundzwanzig→21, dreihundertfunfundzwanzig→325, zweitausendzehn→2010,
    standalone: eins→1, hundert→100, tausend→1000."""
    t = _fold_de_tok(tok)
    if t == "eins":
        return 1
    if t in _DE_UNITS:
        return _DE_UNITS[t]
    if t in _DE_TEENS:
        return _DE_TEENS[t]
    if t in _DE_TENS:
        return _DE_TENS[t]
    if t == "null":
        return 0
    if t == "hundert":
        return 100
    if t == "tausend":
        return 1000
    # compounds must contain a structural morpheme (rejects arbitrary words)
    if not _DE_HAS_PART.search(t):
        return None
    m = _DE_NUMBER.match(t)
    if m is None or not t:
        return None
    v = 0
    if "tausend" in t:
        v += (_de_sub_thousand(m.group("th") or "") or 1) * 1000
    # hundreds group applies iff 'hundert' appears after the tausend span
    tail = t.split("tausend", 1)[-1] if "tausend" in t else t
    if "hundert" in tail:
        v += _DE_UNITS.get(m.group("h") or "", 1) * 100
    v += _de_sub100(m.group("t") or "")
    return v


_DE_ORD_INFL = ("", "r", "n", "s", "m")


def german_ordinal_value(tok: str) -> int | None:
    """erste→1, einundzwanzigste→21, hundertste→100. Inflection suffixes
    (-r/-n/-s/-m after the -te/-ste) accepted."""
    t = _fold_de_tok(tok)
    for infl in _DE_ORD_INFL:
        if infl and not t.endswith(infl):
            continue
        base_full = t[: len(t) - len(infl)] if infl else t
        for suf in ("ste", "te"):
            if not base_full.endswith(suf):
                continue
            stem = base_full[: -len(suf)]
            if not stem:
                continue
            if stem in _DE_ORD_SPECIAL:
                return _DE_ORD_SPECIAL[stem]
            v = german_number_value(stem)
            if v is not None:
                # -ste attaches to tens/hundert/tausend stems, -te to units
                # and teens; accept either (parse already validated the stem)
                return v
    return None


def fold_de(tokens: list[str]) -> list[str]:
    """German token-stream folding: each compound token folds alone;
    'millionen'-scale multipliers are separate tokens (zwei millionen)."""
    out: list[str] = []
    i, n = 0, len(tokens)
    while i < n:
        tok = tokens[i]
        v = german_number_value(tok)
        if v is None:
            ov = german_ordinal_value(tok)
            if ov is not None:
                out.append(str(ov))
            else:
                out.append(tok)
            i += 1
            continue
        i += 1
        # multiplier continuation: "zwei millionen", "eine million"
        total = 0
        while i < n:
            nxt = _fold_de_tok(tokens[i])
            if nxt in ("million", "millionen"):
                total += max(v, 1) * 1_000_000
                v = 0
                i += 1
                # allow a following sub-million compound: "zwei millionen
                # dreihundert" — loop continues with the next token
                if i < n:
                    nv = german_number_value(tokens[i])
                    if nv is not None:
                        v = nv
                        i += 1
                        continue
                break
            break
        out.append(str(total + v))
    return out


# --------------------------------------------------------------------------
# Spanish
# --------------------------------------------------------------------------

_ES_UNITS = {
    "cero": 0, "uno": 1, "un": 1, "una": 1, "dos": 2, "tres": 3,
    "cuatro": 4, "cinco": 5, "seis": 6, "siete": 7, "ocho": 8, "nueve": 9,
}
_ES_TEENS = {
    "diez": 10, "once": 11, "doce": 12, "trece": 13, "catorce": 14,
    "quince": 15, "dieciseis": 16, "diecisiete": 17, "dieciocho": 18,
    "diecinueve": 19, "veinte": 20, "veintiuno": 21, "veintiun": 21,
    "veintidos": 22, "veintitres": 23, "veinticuatro": 24,
    "veinticinco": 25, "veintiseis": 26, "veintisiete": 27,
    "veintiocho": 28, "veintinueve": 29,
}
_ES_TENS = {
    "treinta": 30, "cuarenta": 40, "cincuenta": 50, "sesenta": 60,
    "setenta": 70, "ochenta": 80, "noventa": 90,
}
_ES_HUNDREDS = {
    "cien": 100, "ciento": 100, "doscientos": 200, "doscientas": 200,
    "trescientos": 300, "trescientas": 300, "cuatrocientos": 400,
    "cuatrocientas": 400, "quinientos": 500, "quinientas": 500,
    "seiscientos": 600, "seiscientas": 600, "setecientos": 700,
    "setecientas": 700, "ochocientos": 800, "ochocientas": 800,
    "novecientos": 900, "novecientas": 900,
}
_ES_ORDS = {
    "primero": 1, "primer": 1, "primera": 1, "segundo": 2, "segunda": 2,
    "tercero": 3, "tercer": 3, "tercera": 3, "cuarto": 4, "cuarta": 4,
    "quinto": 5, "quinta": 5, "sexto": 6, "sexta": 6, "septimo": 7,
    "septima": 7, "octavo": 8, "octava": 8, "noveno": 9, "novena": 9,
    "decimo": 10, "decima": 10, "undecimo": 11, "duodecimo": 12,
    "vigesimo": 20, "trigesimo": 30, "centesimo": 100, "milesimo": 1000,
}
_ES_ALL = (
    set(_ES_UNITS) | set(_ES_TEENS) | set(_ES_TENS) | set(_ES_HUNDREDS)
    | set(_ES_ORDS) | {"mil"}
)


def fold_es(tokens: list[str]) -> list[str]:
    """Spanish composition: fused teens/twenties/hundreds are direct
    lookups; 'y' joins tens+units (treinta y dos=32); mil/millón group
    multipliers (tres mil=3000, dos millones=2e6, mil=1000 bare)."""
    out: list[str] = []
    i, n = 0, len(tokens)
    folded = [_fold_accents(t) for t in tokens]
    while i < n:
        t = folded[i]
        if t not in _ES_ALL and t not in ("millon", "millones"):
            out.append(tokens[i])
            i += 1
            continue
        if t in ("millon", "millones"):
            out.append(tokens[i])             # needs a multiplicand before it
            i += 1
            continue
        total = 0
        current = 0
        terminal = False
        while i < n and not terminal:
            t = folded[i]
            if t in _ES_UNITS:
                v = _ES_UNITS[t]
                if v == 0:
                    if current == 0 and total == 0:
                        i += 1
                    break                     # cero is standalone
                if current == 0 or current % 10 == 0:
                    current += v
                else:
                    break
            elif t in _ES_TEENS:
                if current == 0 or current % 100 == 0:
                    current += _ES_TEENS[t]
                else:
                    break
            elif t in _ES_TENS:
                if current % 100 == 0:
                    current += _ES_TENS[t]
                else:
                    break
            elif t in _ES_HUNDREDS:
                if current % 1000 == 0:
                    current += _ES_HUNDREDS[t]
                else:
                    break
            elif t == "mil":
                total += max(current, 1) * 1_000
                current = 0
            elif t in ("millon", "millones"):
                if current == 0 and total == 0:
                    break
                total += max(current, 1) * 1_000_000
                current = 0
            elif t in _ES_ORDS:
                v = _ES_ORDS[t]
                if current == 0 or (v < 10 and current % 10 == 0):
                    current += v
                    # compound ordinals stay open after a round stem:
                    # vigesimo segundo = 22, decimo primero = 11
                    terminal = v % 10 != 0
                else:
                    break
            elif t == "y" and i + 1 < n and folded[i + 1] in _ES_UNITS and (
                current % 100 >= 30 and current % 10 == 0
            ):
                pass                          # treinta y dos
            else:
                break
            i += 1
        out.append(str(total + current))
    return out


# --------------------------------------------------------------------------
# prefilters + dispatch (used by numex.fold_spelled_numbers_batch)
# --------------------------------------------------------------------------

def _prefilter(words: set[str]) -> re.Pattern:
    return re.compile(
        r"(?:^| )(?:" + "|".join(sorted(words, key=len, reverse=True)) + r")(?: |$)"
    )


# German prefilter matches the structural morphemes anywhere inside a token.
# The probe string is accent-STRIPPED but not digraph-folded, so the list
# carries the ue/oe digraph spellings (and ß, which NFD does not decompose).
_DE_PREFILTER = re.compile(
    r"(?:^| )[a-zß]*(?:"
    + "|".join(
        sorted(
            set(_DE_UNITS) | set(_DE_TEENS) | set(_DE_TENS)
            | {"hundert", "tausend", "million", "eins", "null", "erste",
               "fuenf", "zwoelf", "dreißig"},
            key=len,
            reverse=True,
        )
    )
    + r")[a-zß]*(?: |$)"
)

LANG_FOLDERS = {
    "fr": (fold_fr, _prefilter(_FR_ALL)),
    "de": (fold_de, _DE_PREFILTER),
    "es": (fold_es, _prefilter(_ES_ALL)),
}
# the second table set (it/pt/nl/ru) lives in core/numex_ml2.py; the
# dispatch in core/numex.py merges both (importing it here would cycle:
# numex_ml2 uses this module's _fold_accents/_prefilter)
