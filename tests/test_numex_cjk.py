"""CJK numex goldens: Chinese / Japanese Han-numeral folding
(core/numex_cjk.py; reference rule tables in src/numex_data.c, composer
src/numex.c:1260).

The folders receive the tokenizer's per-character Han token stream, so
every golden is written as the SPACED canon form the pipeline actually
produces."""

import pandas as pd
import pytest

from libpostal_spark.core.canonicalize import canonicalize_batch
from libpostal_spark.core.numex_cjk import fold_ja, fold_zh


def _run(fold, s: str) -> str:
    # the tokenizer emits each Han char as its own token; spaces in the
    # input delimit them the same way
    return " ".join(fold(list(s.replace(" ", ""))))


ZH_CASES = [
    # in-section composition
    ("二十三", "23"),
    ("十三", "13"),
    ("五十六", "56"),
    ("一百零五", "105"),
    ("九百九十九", "999"),
    ("二千十年", "2010 年"),          # trailing non-numeral char stays
    ("八千七百六十五", "8765"),
    # section markers, simplified and traditional
    ("三万五千", "35000"),
    ("三萬", "30000"),
    ("十万", "100000"),
    ("二亿三千万", "230000000"),
    ("二億", "200000000"),
    # 两 as the pre-multiplier two (zh only)
    ("两千", "2000"),
    ("两百五十", "250"),
    # digit-by-digit positional reading (len >= 3)
    ("一九八四", "1984"),
    ("二零一零", "2010"),
    ("三零五", "305"),
    # 第-prefix ordinals
    ("第三", "3"),
    ("第三章", "3 章"),
    ("第二十一", "21"),
    # zero forms
    ("零", "0"),
    ("〇", "0"),
    # stays unfolded: enumeration pair, invalid composition, bare
    # multipliers (千葉/十字 morphemes), no numerals at all
    ("二三", "二 三"),
    ("五十六百", "五 十 六 百"),
    ("十", "十"),
    ("千", "千"),
    ("千葉", "千 葉"),
    ("没有数字", "没 有 数 字"),
]

JA_CASES = [
    ("二十三", "23"),
    ("百五", "105"),
    ("二千十年", "2010 年"),
    ("三万五千", "35000"),
    ("三億", "300000000"),
    ("一九八四", "1984"),
    ("〇", "0"),
    # 番目-suffix ordinals (ja arm)
    ("三番目", "3"),
    ("二十一番目", "21"),
    # ja table excludes the zh-only forms: 两 and the simplified 亿
    ("两千", "两 千"),
    ("二亿", "2 亿"),
    # bare-multiplier morphemes stay
    ("千葉", "千 葉"),
    ("十字", "十 字"),
    ("数字なし", "数 字 な し"),
]


@pytest.mark.parametrize("inp,want", ZH_CASES)
def test_fold_zh(inp, want):
    assert _run(fold_zh, inp) == want


@pytest.mark.parametrize("inp,want", JA_CASES)
def test_fold_ja(inp, want):
    assert _run(fold_ja, inp) == want


def test_zh_through_canonicalize_batch():
    """End-to-end dispatch: numex_lang='zh' routes the batch wrapper to
    the CJK table; transliterate stays OFF so the pinyin fold can't
    consume the numerals first."""
    s = pd.Series(["二千十年 竣工", "第三 号 楼", "共 三万五千 件", "没有 数字"])
    got = list(canonicalize_batch(
        s, fold_spelled_numbers=True, fold_roman=True, numex_lang="zh"))
    assert got == ["2010 年 竣 工", "3 号 楼", "共 35000 件", "没 有 数 字"]


def test_ja_through_canonicalize_batch():
    s = pd.Series(["三番目 の 建物", "一九八四 年", "数字 なし"])
    got = list(canonicalize_batch(
        s, fold_spelled_numbers=True, fold_roman=True, numex_lang="ja"))
    assert got == ["3 の 建 物", "1984 年", "数 字 な し"]


def test_ordinal_marker_not_consumed_on_invalid_run():
    # 第 followed by an unparseable numeral run re-emits everything
    assert _run(fold_zh, "第二三") == "第 二 三"


def test_positional_requires_length_three():
    # a length-2 digit pair is the "two or three" enumeration, never 23
    assert _run(fold_zh, "九八") == "九 八"
    assert _run(fold_ja, "九八") == "九 八"
