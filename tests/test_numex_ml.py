"""Multi-language numex folding (core/numex_ml.py): hand goldens per
language, derived from the grammars (reference rule tables:
/root/reference/src/numex_data.c, composer src/numex.c:1260) — SURVEY
§2.3's own example "quatre vingt douze"→92 included."""

import pandas as pd
import pytest

from libpostal_spark.core.numex import fold_spelled_numbers_batch
from libpostal_spark.core.numex_ml import (
    fold_de,
    fold_es,
    fold_fr,
    german_number_value,
    german_ordinal_value,
)


def _run(fn, s: str) -> str:
    return " ".join(fn(s.split()))


FR_CASES = [
    ("quatre vingt douze", "92"),                       # SURVEY §2.3 example
    ("soixante dix", "70"),
    ("soixante et onze", "71"),
    ("vingt et un", "21"),
    ("quatre vingt dix sept", "97"),
    ("soixante seize", "76"),
    ("deux cents", "200"),
    ("neuf cent quatre", "904"),
    ("neuf cent quatre vingt", "980"),
    ("mille neuf cent quatre vingt quatorze", "1994"),
    ("deux mille vingt six", "2026"),
    ("trois millions", "3000000"),
    ("dix sept rue", "17 rue"),
    ("dix", "10"),
    ("zero defauts", "0 defauts"),
    ("un deux trois", "1 2 3"),                          # no false merging
    ("le premier etage", "le 1 etage"),
    ("deuxieme avenue", "2 avenue"),
    ("vingt et unieme siecle", "21 siecle"),
    # cent/million never START a run (noun more often than number)
    ("cent ans", "cent ans"),
    ("million", "million"),
    # 'et' kept when the next word cannot extend
    ("deux et la suite", "2 et la suite"),
]

DE_CASES = [
    ("einundzwanzig", "21"),
    ("dreihundertfünfundzwanzig", "325"),
    ("zweitausendzehn", "2010"),
    ("zweitausendfünfhundertdreiundvierzig", "2543"),
    ("fünfhundert", "500"),
    ("hundert", "100"),
    ("tausend", "1000"),
    ("hunderttausend", "100000"),
    ("dreitausendundzwei", "3002"),
    ("eins zwei drei", "1 2 3"),
    ("siebzehn", "17"),
    ("dreißig grad", "30 grad"),
    ("zwei millionen", "2000000"),
    ("erste strasse", "1 strasse"),
    ("dritter platz", "3 platz"),
    ("einundzwanzigste etage", "21 etage"),
    ("keine nummer hier", "keine nummer hier"),
    # digraph spellings fold to the same values as umlauts
    ("fuenfundzwanzig", "25"),
    ("zwoelf", "12"),
    # non-number compounds containing no structural morpheme pass through
    ("neue strasse", "neue strasse"),
]

ES_CASES = [
    ("treinta y dos", "32"),
    ("dieciséis", "16"),
    ("veintidós", "22"),
    ("quinientos cuarenta y tres", "543"),
    ("dos mil veinte", "2020"),
    ("ciento veinte", "120"),
    ("mil novecientos noventa y nueve", "1999"),
    ("un millón", "1000000"),
    ("tres millones", "3000000"),
    ("el primer piso", "el 1 piso"),
    ("vigésimo segundo", "22"),
    ("décimo primero", "11"),
    ("vigésimo piso", "20 piso"),
    ("el cuarto libro", "el 4 libro"),
    ("cero errores", "0 errores"),
    ("uno dos tres", "1 2 3"),
    ("y tu", "y tu"),
    # cien alone folds (unambiguous 100), millón without multiplicand kept
    ("cien años", "100 años"),
    ("millones", "millones"),
]


@pytest.mark.parametrize("phrase,want", FR_CASES)
def test_fr(phrase, want):
    assert _run(fold_fr, phrase) == want


@pytest.mark.parametrize("phrase,want", DE_CASES)
def test_de(phrase, want):
    assert _run(fold_de, phrase) == want


@pytest.mark.parametrize("phrase,want", ES_CASES)
def test_es(phrase, want):
    assert _run(fold_es, phrase) == want


def test_german_compound_parser_values():
    assert german_number_value("sechsundsechzig") == 66
    assert german_number_value("neunhundertneunundneunzig") == 999
    assert german_number_value("eintausendeinhundertelf") == 1111
    assert german_number_value("wort") is None
    assert german_number_value("") is None
    # ordinals, with inflection suffixes
    assert german_ordinal_value("erste") == 1
    assert german_ordinal_value("ersten") == 1
    assert german_ordinal_value("siebte") == 7
    assert german_ordinal_value("achte") == 8
    assert german_ordinal_value("zwanzigste") == 20
    assert german_ordinal_value("hundertste") == 100
    assert german_ordinal_value("strasse") is None


def test_batch_dispatch_and_prefilter():
    # accented rows are found by the accent-stripped probe even without an
    # upstream transliterate stage
    s = pd.Series(["zéro défauts", "rien ici", "soixante et onze"])
    out = fold_spelled_numbers_batch(s, lang="fr")
    assert out.tolist() == ["0 défauts", "rien ici", "71"]
    s = pd.Series(["fünfundzwanzig fenster", "kein wert"])
    assert fold_spelled_numbers_batch(s, lang="de").tolist() == [
        "25 fenster", "kein wert",
    ]
    s = pd.Series(["dieciséis velas"])
    assert fold_spelled_numbers_batch(s, lang="es").tolist() == ["16 velas"]
    # roman folding composes with every language table
    s = pd.Series(["chapitre xiv"])
    assert fold_spelled_numbers_batch(s, fold_roman=True, lang="fr").tolist() == [
        "chapitre 14"
    ]
    # english default path unchanged
    s = pd.Series(["three hundred twenty one"])
    assert fold_spelled_numbers_batch(s).tolist() == ["321"]
