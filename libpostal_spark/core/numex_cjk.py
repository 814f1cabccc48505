"""Multi-language numex, third table set: Chinese / Japanese Han-numeral
folding — the first non-alphabetic grammars in the set.

The reference's numex data ships ja/zh rule tables alongside the European
ones (/root/reference/src/numex_data.c, loader+composer
/root/reference/src/numex.c:1260-...).  Han numerals are positional-
multiplicative: digits 零〇一二三四五六七八九 combine with the in-section
multipliers 十/百/千 (10/100/1000) and the section markers 万/萬 (10^4)
and 亿/億 (10^8), e.g. 三万五千 = 3·10^4 + 5·10^3 = 35000.  Years and
room numbers are also read digit-by-digit (一九八四 = 1984) with no
multipliers at all.

Tokenizer contract: the repo's scanner emits every Han character as its
OWN single-char token (``core/canonicalize._RE_TOKEN``'s
``[^\\sa-zA-Z0-9_]`` arm), so — exactly like the Russian folder's additive
token runs — the CJK folders scan the token stream for maximal runs of
numeral characters and fold each run that parses.  These languages must
run with ``transliterate=False``: the Han-pinyin fold would rewrite 二十三
to the single token "ershisan" before numex ever saw it.

Grammar, shared by both languages (the composer loop of src/numex.c
applied to the ja/zh tables):

  * compositional parse: section-split at the first 亿/億 then 万/萬
    (recursively; a marker repeating to the right of its own split
    rejects the run), then in-section sum over strictly DECREASING
    multipliers with an optional pending digit (十三 = 13 via the
    implicit leading 一; 两千 = 2000; 一百零五 = 105 with 零 as the
    pending-must-be-empty filler);
  * digit-sequence parse: a run of length >= 3 consisting ONLY of plain
    digits folds positionally (一九八四 = 1984, 二零一零 = 2010,
    三零五 = 305).  Length-2 digit pairs like 二三 stay unfolded — that
    spelling is the "two or three" enumeration, not 23;
  * anything else (multiplier repeats or increases, digit adjacency
    outside positional mode) is left VERBATIM — same pass-through
    honesty as every other numex table;
  * ordinals: zh marks them with the 第 PREFIX (第三 = 3rd -> "3"), ja
    with the 番目 SUFFIX (三番目 -> "3"); both fold to the bare number,
    the folding the reference's ordinal entries perform.

Language-table differences (the reason zh and ja are separate entries,
as in numex_data.c): zh accepts simplified AND traditional section
markers (万/萬, 亿/億) plus the pre-multiplier digit 两 (两千 = 2000);
ja accepts 〇 (its everyday zero), the ja-only marker spellings 万/億,
and neither 两 nor the simplified 亿.
"""

from __future__ import annotations

import re

_DIGITS = {
    "零": 0, "〇": 0, "一": 1, "二": 2, "三": 3, "四": 4,
    "五": 5, "六": 6, "七": 7, "八": 8, "九": 9,
}
_PURE_DIGITS = frozenset(_DIGITS)      # positional (digit-by-digit) mode
_MULTS = {"十": 10, "百": 100, "千": 1000}

# (section markers, extra digit chars) per language
_ZH_SECTIONS = (("亿", 100_000_000), ("億", 100_000_000),
                ("万", 10_000), ("萬", 10_000))
_JA_SECTIONS = (("億", 100_000_000), ("万", 10_000))
_ZH_EXTRA = {"两": 2}                   # pre-multiplier two: 两千 = 2000
_JA_EXTRA: dict[str, int] = {}


def _base_value(chars: list[str], digits: dict[str, int]) -> int | None:
    """In-section compositional parse (no section markers): strictly
    decreasing multipliers, one pending digit, 零/〇 filler."""
    total = 0
    pending: int | None = None
    last_mult: int | None = None
    for c in chars:
        if c in ("零", "〇"):
            if pending is not None:
                return None             # 五零 composes nothing
            continue
        d = digits.get(c)
        if d is not None:
            if pending is not None:
                return None             # digit adjacency -> not compositional
            pending = d
            continue
        m = _MULTS.get(c)
        if m is None:
            return None
        if last_mult is not None and m >= last_mult:
            return None                 # 五十六百 is not a number
        total += (pending if pending is not None else 1) * m
        pending = None
        last_mult = m
    return total + (pending or 0)


def _han_value(chars: list[str], sections, digits: dict[str, int]
               ) -> int | None:
    """Full parse: recursive section split, then the in-section composer;
    falls back to the positional digit-by-digit reading for pure-digit
    runs of length >= 3."""
    for marker, mult in sections:
        if marker in chars:
            i = chars.index(marker)
            left, right = chars[:i], chars[i + 1:]
            if marker in right:
                return None
            lv = _han_value(left, sections, digits) if left else 1
            rv = _han_value(right, sections, digits) if right else 0
            if lv is None or rv is None or rv >= mult:
                return None
            return lv * mult + rv
    v = _base_value(chars, digits)
    if v is not None:
        return v
    if len(chars) >= 3 and all(c in _PURE_DIGITS for c in chars):
        return int("".join(str(_DIGITS[c]) for c in chars))
    return None


def _make_fold(sections, extra: dict[str, int], *, ordinal_prefix: bool,
               ordinal_suffix: bool):
    digits = dict(_DIGITS)
    digits.update(extra)
    charset = (frozenset(digits) | frozenset(_MULTS)
               | frozenset(m for m, _ in sections))

    def fold(tokens: list[str]) -> list[str]:
        out: list[str] = []
        i, n = 0, len(tokens)
        while i < n:
            start = i
            had_prefix = (ordinal_prefix and tokens[i] == "第"
                          and i + 1 < n and tokens[i + 1] in charset)
            j = i + 1 if had_prefix else i
            k = j
            while k < n and tokens[k] in charset:
                k += 1
            if k > j:
                run = tokens[j:k]
                # a SINGLE bare multiplier stays: 千 in the place name
                # 千葉 or 十 in 十字 is a morpheme, not a count.  Longer
                # digit-less runs are kept: 十万/百万/千万 are numbers
                # (increasing-order morpheme strings like 百千鳥's 百千
                # already reject in the composer)
                v = (_han_value(run, sections, digits)
                     if (len(run) >= 2
                         or run[0] in digits or run[0] in ("零", "〇"))
                     else None)
                if v is not None:
                    out.append(str(v))
                    i = k
                    if (ordinal_suffix and i + 1 < n
                            and tokens[i] == "番" and tokens[i + 1] == "目"):
                        i += 2
                    continue
                # invalid run: emit every token verbatim (incl. a consumed 第)
                out.extend(tokens[start:k])
                i = k
                continue
            out.append(tokens[i])
            i += 1
        return out

    return fold


fold_zh = _make_fold(_ZH_SECTIONS, _ZH_EXTRA,
                     ordinal_prefix=True, ordinal_suffix=False)
fold_ja = _make_fold(_JA_SECTIONS, _JA_EXTRA,
                     ordinal_prefix=False, ordinal_suffix=True)

# prefilters probe the space-joined canon string; any single numeral
# character is enough (runs are re-validated by the folder)
_ZH_PREFILTER = re.compile("[零〇一二三四五六七八九十百千万萬亿億两]")
_JA_PREFILTER = re.compile("[零〇一二三四五六七八九十百千万億]")

LANG_FOLDERS_CJK = {
    "zh": (fold_zh, _ZH_PREFILTER),
    "ja": (fold_ja, _JA_PREFILTER),
}
