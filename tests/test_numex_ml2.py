"""Multi-language numex folding, second table set (core/numex_ml2.py):
Italian / Portuguese / Dutch / Russian hand goldens derived from each
grammar (reference rule tables: /root/reference/src/numex_data.c,
composer src/numex.c:1260). Russian cases run in BOTH scripts — raw
Cyrillic and the repo's own romanization — because the tables register
each key in the two forms."""

import pandas as pd
import pytest

from libpostal_spark.core.numex import fold_spelled_numbers_batch
from libpostal_spark.core.numex_ml2 import (
    dutch_number_value,
    dutch_ordinal_value,
    fold_it,
    fold_nl,
    fold_pt,
    fold_ru,
    italian_number_value,
    italian_ordinal_value,
)


def _run(fn, s: str) -> str:
    return " ".join(fn(s.split()))


IT_CASES = [
    ("ventuno", "21"),                       # elided tens+unit
    ("ventotto", "28"),
    ("trentatre", "33"),
    ("seicentoquarantadue", "642"),
    ("centottanta", "180"),                  # cento's o elides before otto
    ("centotto", "108"),
    ("centouno", "101"),
    ("millenovecentonovantaquattro", "1994"),
    ("duemilacinquecento", "2500"),
    ("duemila", "2000"),
    ("mille", "1000"),
    ("cento anni", "100 anni"),
    ("due milioni trecento", "2000300"),
    ("un milione", "1000000"),
    ("zero errori", "0 errori"),
    ("il primo piano", "il 1 piano"),
    ("ventesimo secolo", "20 secolo"),
    ("ventunesimo", "21"),
    ("ventitreesimo", "23"),
    ("centesimo", "100"),
    ("millesimo", "1000"),
    ("un due tre", "1 2 3"),                 # no false merging
    ("nessun numero qui", "nessun numero qui"),
    ("medesimo posto", "medesimo posto"),    # -esimo word, not an ordinal
    ("milanese", "milanese"),                # contains 'mila', not a number
]

PT_CASES = [
    ("vinte e dois", "22"),
    ("cento e vinte e tres", "123"),
    ("cem", "100"),
    ("quinhentos e quarenta e tres", "543"),
    ("mil novecentos e noventa e nove", "1999"),
    ("dois mil e vinte", "2020"),
    ("mil e um", "1001"),
    ("tres milhoes", "3000000"),
    ("um milhao de habitantes", "1000000 de habitantes"),
    ("dezesseis", "16"),
    ("dezasseis", "16"),                     # European spelling
    ("o primeiro andar", "o 1 andar"),
    ("vigesimo segundo andar", "22 andar"),
    ("dois e dois", "2 e 2"),                # conjunction 'e' not swallowed
    ("um dois tres", "1 2 3"),
    ("sem numeros aqui", "sem numeros aqui"),
    ("zero defeitos", "0 defeitos"),
]

NL_CASES = [
    ("eenentwintig", "21"),
    ("achtentachtig", "88"),
    ("tweeentwintig", "22"),                 # tweeëntwintig after fold
    ("driehonderdvijfentwintig", "325"),
    ("tweeduizendtien", "2010"),
    ("duizend", "1000"),
    ("honderd jaar", "100 jaar"),
    ("twee miljoen inwoners", "2000000 inwoners"),
    ("de eerste straat links", "de 1 straat links"),
    ("tweede", "2"),
    ("eenentwintigste etage", "21 etage"),
    ("twintigste eeuw", "20 eeuw"),
    ("zeventien", "17"),
    ("een twee drie", "1 2 3"),
    ("geen nummer hier", "geen nummer hier"),
    ("negeren is geen getal", "negeren is geen getal"),
    ("beste", "beste"),                      # -ste word, not an ordinal
]

RU_CASES = [
    ("сто двадцать три дома", "123 дома"),
    ("две тысячи десять", "2010"),
    ("пятьдесят восемь", "58"),
    ("девятьсот девяносто девять", "999"),
    ("тысяча девятьсот восемьдесят четыре", "1984"),
    ("первый этаж", "1 этаж"),
    ("двадцать первый век", "21 век"),
    ("два миллиона жителей", "2000000 жителей"),
    ("миллион жителей", "миллион жителей"),  # needs a multiplicand
    ("один два три", "1 2 3"),
    ("нет чисел здесь", "нет чисел здесь"),
    # romanized (exactly what the repo's translit stage emits)
    ("sto dvadtsat tri doma", "123 doma"),
    ("dve tysyachi desyat", "2010"),
    ("pervyy etazh", "1 etazh"),
    ("dvadtsatyy vek", "20 vek"),
    ("tysyacha devyatsot vosemdesyat chetyre", "1984"),
]


@pytest.mark.parametrize("phrase,want", IT_CASES)
def test_fold_it(phrase, want):
    assert _run(fold_it, phrase) == want


@pytest.mark.parametrize("phrase,want", PT_CASES)
def test_fold_pt(phrase, want):
    assert _run(fold_pt, phrase) == want


@pytest.mark.parametrize("phrase,want", NL_CASES)
def test_fold_nl(phrase, want):
    assert _run(fold_nl, phrase) == want


@pytest.mark.parametrize("phrase,want", RU_CASES)
def test_fold_ru(phrase, want):
    assert _run(fold_ru, phrase) == want


def test_italian_values():
    assert italian_number_value("ventuno") == 21
    assert italian_number_value("quarantadue") == 42
    assert italian_number_value("milanese") is None
    assert italian_ordinal_value("ventesimo") == 20
    assert italian_ordinal_value("medesimo") is None


def test_dutch_values():
    assert dutch_number_value("eenentwintig") == 21
    assert dutch_number_value("negeren") is None
    assert dutch_ordinal_value("achtste") == 8
    assert dutch_ordinal_value("beste") is None


def test_accent_insensitive():
    assert _run(fold_it, "ventitré") == "23"
    assert _run(fold_pt, "três milhões") == "3000000"
    assert _run(fold_nl, "tweeëntwintig") == "22"


@pytest.mark.parametrize(
    "lang,raw,want",
    [
        ("it", "ventuno gradi", "21 gradi"),
        ("pt", "vinte e dois", "22"),
        ("nl", "eenentwintig ramen", "21 ramen"),
        ("ru", "сто двадцать три", "123"),
        ("ru", "sto dvadtsat tri", "123"),
    ],
)
def test_batch_wrapper_routes_new_langs(lang, raw, want):
    out = fold_spelled_numbers_batch(pd.Series([raw]), lang=lang)
    assert out.iloc[0] == want


def test_batch_wrapper_prefilter_skips_clean_rows():
    # rows with no number words must come back identical (fast path)
    s = pd.Series(["just some words", "altro testo", "meer woorden"])
    for lang in ("it", "pt", "nl", "ru"):
        out = fold_spelled_numbers_batch(s, lang=lang)
        assert (out == s).all()
