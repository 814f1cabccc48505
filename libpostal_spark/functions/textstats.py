"""Text-analysis column expressions for training-data pipelines.

All JVM-side ``pyspark.sql.functions`` compositions (whole-stage codegen; no
Python). Each has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so
the DuckDB oracle can verify values bit-for-bit.

These are the large-scale pipeline ops (language-ID heuristic, quality
scoring, token counting, fingerprinting) that complement the dedup engine —
the reference's analog is its per-record classifiers and normalizers
(language classifier /root/reference/src/language_classifier.c, tokenizer
/root/reference/src/scanner.re) reconceived as columnar expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-language stopword marker sets for the stopword-voting language
# heuristic (deterministic, SQL-expressible; not a statistical langid model —
# the reference's analog is a trained classifier,
# /root/reference/src/language_classifier.c). The oracle SQL twin is
# GENERATED from this dict, so extending it never desyncs the harness.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "dans"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "it"]


def token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def n_chars(text: Column) -> Column:
    return F.length(text).cast("long")


def alpha_ratio(text: Column) -> Column:
    """fraction of characters that are ascii letters (4 dp)."""
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.round(
        F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
            alpha.cast("double") / F.length(text).cast("double")
        ),
        4,
    )


def punct_ratio(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}]", ""))
    return F.round(
        F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
            punct.cast("double") / F.length(text).cast("double")
        ),
        4,
    )


def _word_occurrences(text: Column, word: str) -> Column:
    """count of whole-word (whitespace-delimited) occurrences.

    Token-based: split on \\s+ and count exact matches. (An earlier
    regexp_replace length-diff version undercounted consecutive repeats —
    ' the the the ' counted 2 — because replacement is non-overlapping.)
    """
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(F.filter(toks, lambda t: t == F.lit(word))).cast("long")


def stopword_ratio(text: Column) -> Column:
    total = token_count(text)
    hits = None
    for w in STOPWORDS:
        c = _word_occurrences(text, w)
        hits = c if hits is None else hits + c
    return F.round(
        F.when(total == 0, F.lit(0.0)).otherwise(
            hits.cast("double") / total.cast("double")
        ),
        4,
    )


def quality_score(text: Column) -> Column:
    """toy composite quality score in [0,1]: rewards alpha-heavy, reasonably
    long, stopword-bearing text (4 dp; exact twin in oracle SQL)."""
    length_term = F.least(n_chars(text).cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        (alpha_ratio(text) + length_term + F.least(stopword_ratio(text) * 5, F.lit(1.0)))
        / F.lit(3.0),
        4,
    )


def lang_id(text: Column) -> Column:
    """argmax over marker-word counts; zero evidence → 'und', ties resolve
    to the FIRST language in LANG_MARKERS dict order (the strictly-greater
    fold below — the SQL twin replays the same rule)."""
    counts = {
        lang: sum([_word_occurrences(text, w) for w in words][1:],
                  _word_occurrences(text, words[0]))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_cnt = F.lit(0).cast("long")
    # deterministic order: first language in dict order wins ties strictly-greater
    for lang in langs:
        c = counts[lang]
        cond = c > best_cnt
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_cnt = F.when(cond, c).otherwise(best_cnt)
    return best


# BPE-ish pretokenizer (GPT-2-style, lookahead-free ASCII variant so the
# same pattern runs identically under Java regex and DuckDB's RE2):
# contractions | space?letters | space?digits | space?symbol-run | whitespace
BPE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'|\s+"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-pretokenizer segments — the token-count a GPT-2-style
    tokenizer would fan each document into (upper bound before merges)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast("long")


def norm_fingerprint(text: Column) -> Column:
    """sha256 of whitespace-collapsed, trimmed, lowercased text — the
    document-fingerprint op (rolling-hash analog: exact canonical digest)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.sha2(norm.cast("binary"), 256)


def lang_id_trigram(
    docs,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    fit_max_docs: int = 1000,
):
    """STATISTICAL language ID: character-trigram profile classifier
    (Cavnar–Trenkle-family; the distributed analog of the reference's
    trained classifier, /root/reference/src/language_classifier.c), fit AND
    applied as pure DataFrame ops in one pass over a labeled table.

    Train: per-language trigram counts + totals; each trigram's profile
    language is the argmax of cnt_L / total_L, compared EXACTLY via
    integer cross-multiplication (cnt_L × Π total_other — decimal(38)
    arithmetic, no float anywhere), ties to the lexicographically smaller
    language. Predict: each of a doc's trigram occurrences votes for its
    profile language; the doc's label is the majority vote (ties to the
    smaller language; docs with no modeled trigram → 'und'). Integer-exact
    end-to-end, which is what lets the DuckDB oracle replay it
    value-for-value.

    At scale: the model is a small (tri → lang) table bounded by the fit
    sample's text volume — it is collected to the driver (exact Python-int
    cross-multiplication, no width ceiling) and shipped back as an explicit
    broadcast join; prediction runs over everything in ONE distributed pass.

    Driver actions: exactly one — the fit-counts collect, which explodes
    trigrams for the SAMPLE only (the sample filter is pushed below the
    explode). The caller's action then runs the single full-corpus pass.
    Nothing is persisted, so repeated invocations leak no executor cache.
    """
    spark = docs.sparkSession

    lowered = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang_label"),
        F.lower(F.col(text_col)).alias("t"),
    ).filter(F.length("t") >= 3)
    # a NULL label must never enter the fit: it would become a None key in
    # the totals (and a None-vs-str tie-break TypeError on the driver) or a
    # silent NULL "language" in the broadcast model. The twin applies the
    # same filter.
    fit_input = lowered.filter(F.col("lang_label").isNotNull())

    def _explode_tris(frame):
        return frame.withColumn(
            "pos", F.explode(F.sequence(F.lit(1), F.length("t") - 2))
        ).select(
            id_col, "lang_label", F.expr("substring(t, pos, 3)").alias("tri")
        )

    # fit on a bounded, DETERMINISTIC document sample (first fit_max_docs
    # ids in sort order — reproducible, oracle-replayable). Applied
    # unconditionally: when the corpus has <= fit_max_docs documents the
    # sample IS the corpus, so no separate count action is ever needed, and
    # at the sf0.01 compare scale fit == full and the SQL twin's totals
    # match exactly. The sample join sits BELOW the explode, so the fit
    # job's trigram fan-out is bounded by the sample's text volume no
    # matter how large the corpus is.
    sample_ids = docs.select(id_col).orderBy(id_col).limit(fit_max_docs)
    counts = (
        _explode_tris(fit_input.join(F.broadcast(sample_ids), id_col))
        .groupBy("lang_label", "tri")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )

    # model fit is driver-side over the BOUNDED count table: per-language
    # totals, then each trigram's profile language = argmax of
    # cnt_L / total_L compared exactly via integer cross-multiplication
    # (cnt_L × Π total_other — Python ints, arbitrary precision), ties to
    # the lexicographically smaller language. Matches the DuckDB twin's
    # HUGEINT replay bit-for-bit at compare scale.
    totals: dict[str, int] = {}
    for r in counts:
        totals[r["lang_label"]] = totals.get(r["lang_label"], 0) + int(r["cnt"])
    prod_all = 1
    for v in totals.values():
        prod_all *= v
    best: dict[str, tuple[int, str]] = {}
    for r in counts:
        lang = r["lang_label"]
        score = int(r["cnt"]) * (prod_all // totals[lang])
        cur = best.get(r["tri"])
        if cur is None or score > cur[0] or (score == cur[0] and lang < cur[1]):
            best[r["tri"]] = (score, lang)
    model_rows = [(tri, lang) for tri, (_, lang) in best.items()]
    model = spark.createDataFrame(
        model_rows or [("", "und")], "tri string, profile_lang string"
    )
    if not model_rows:
        model = model.filter(F.lit(False))

    # one distributed pass over the FULL corpus: broadcast the model into
    # the vote join; the majority vote with (v desc, lang asc) tie-break is
    # a single min_by over (-v, lang) — no window sort
    top = (
        _explode_tris(lowered)
        .join(F.broadcast(model), "tri")
        .groupBy(id_col, "profile_lang")
        .agg(F.count("*").alias("v"))
        .groupBy(id_col)
        .agg(
            F.min_by(
                "profile_lang",
                F.struct((-F.col("v")).alias("nv"), F.col("profile_lang")),
            ).alias("lang_pred")
        )
    )

    # join on the NATIVE id type — force-casting to long would null out
    # string doc ids and silently degrade every prediction to 'und'
    out = (
        docs.select(F.col(id_col))
        .join(top, id_col, "left")
        .select(
            id_col, F.coalesce("lang_pred", F.lit("und")).alias("lang_pred")
        )
    )
    return out
