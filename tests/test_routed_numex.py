"""Per-row numex-language routing (one Arrow UDF, grouped by lang inside
each batch) — the production analog of the reference applying the numex
table of the language in effect per record (src/numex.c:1260; the
language classifier selects it). Must be value-identical to running each
row through its language's dedicated canonicalize UDF."""

from pyspark.sql import functions as F

from libpostal_spark.functions.udfs import (
    make_canonicalize_routed_numex_udf,
    make_canonicalize_udf,
)

ROWS = [
    (1, "en", "three hundred twenty one files"),
    (2, "fr", "quatre vingt douze rues"),
    (3, "de", "einundzwanzig Häuser"),
    (4, "ru", "сто двадцать три дома"),
    (5, "zh", "共 三万五千 件"),
    (6, "ja", "三番目 の 建物"),
    (7, "xx", "three unknown lang rows fall back to en"),
    (8, None, "null lang rows fall back to en"),
]


def test_routed_equals_dedicated_udfs(spark):
    df = spark.createDataFrame(ROWS, "id long, lang string, text string")
    routed = make_canonicalize_routed_numex_udf()
    got = {
        r["id"]: r["folded"]
        for r in df.select(
            "id", routed(F.col("text"), F.col("lang")).alias("folded")
        ).collect()
    }
    for rid, lang, text in ROWS:
        lang_eff = lang if lang in ("en", "fr", "de", "ru", "zh", "ja") else "en"
        dedicated = make_canonicalize_udf(
            fold_spelled_numbers=True,
            fold_roman=True,
            transliterate=lang_eff not in ("en", "zh", "ja"),
            numex_lang=lang_eff,
        )
        want = (
            df.filter(F.col("id") == rid)
            .select(dedicated(F.col("text")).alias("c"))
            .collect()[0]["c"]
        )
        assert got[rid] == want, (rid, lang, got[rid], want)
    # spot-pin a few folds end-to-end
    assert got[1] == "321 files"
    assert got[2] == "92 rues"
    assert got[5] == "共 35000 件"
    assert got[6] == "3 の 建 物"
