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

from collections.abc import Iterator

import pandas as pd
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


def _word_set_occurrences(toks: Column, words: list[str]) -> Column:
    """Total occurrences of ANY word of a distinct-word set, as ONE filter
    pass over the \\s+-split token array. Each token matches at most one
    word of a distinct set, so this equals the sum of per-word whole-word
    counts (exact token equality — the rule the SQL twins replay with
    their per-word ``len(list_filter(...))`` sums) — one expression
    instead of len(words) split/filter/size trees, which cuts both
    Catalyst analysis time (driver, every invocation) and the per-row
    evaluation from O(words · tokens) to O(tokens)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def stopword_ratio(text: Column) -> Column:
    total = token_count(text)
    hits = _word_set_occurrences(
        F.split(F.lower(F.trim(text)), r"\s+"), STOPWORDS
    )
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
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    counts = {
        lang: _word_set_occurrences(toks, words)
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
    sample's text volume — the sample itself (first ``fit_max_docs`` rows,
    the same bound the count table already carried) is collected to the
    driver, counted, and argmaxed there (exact Python-int
    cross-multiplication, no width ceiling), then shipped back as an
    explicit broadcast join; prediction runs over everything in ONE
    distributed pass.

    Driver actions: exactly one — the bounded sample collect (a
    TakeOrdered of ``fit_max_docs`` rows, no shuffle, no explode job: the
    former distributed count job spent its wall on job waves, not on the
    ~10^5-trigram tally a driver loop does in milliseconds; both transfers
    are bounded by the sample's text volume). The caller's action then
    runs the single full-corpus pass. Nothing is persisted, so repeated
    invocations leak no executor cache.
    """
    spark = docs.sparkSession  # noqa: F841 (kept: API parity, debugging)

    # fit on a bounded, DETERMINISTIC document sample (first fit_max_docs
    # ids in sort order — reproducible, oracle-replayable). When the corpus
    # has <= fit_max_docs documents the sample IS the corpus, so at the
    # sf0.01 compare scale fit == full and the SQL twin's totals match
    # exactly. NULL labels and sub-trigram texts never enter the tally —
    # the same filters the former distributed fit job applied (a None key
    # would TypeError the tie-break; the twin filters identically).
    sample = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(lang_col).alias("lang_label"),
            F.lower(F.col(text_col)).alias("t"),
        )
        .orderBy("_id")
        .limit(fit_max_docs)
        .collect()
    )
    counts: dict[tuple[str, str], int] = {}
    for r in sample:
        lang, t = r["lang_label"], r["t"]
        if lang is None or t is None or len(t) < 3:
            continue
        for i in range(len(t) - 2):
            key = (lang, t[i : i + 3])
            counts[key] = counts.get(key, 0) + 1

    # model fit is driver-side over the BOUNDED count table: per-language
    # totals, then each trigram's profile language = argmax of
    # cnt_L / total_L compared exactly via integer cross-multiplication
    # (cnt_L × Π total_other — Python ints, arbitrary precision), ties to
    # the lexicographically smaller language. Matches the DuckDB twin's
    # HUGEINT replay bit-for-bit at compare scale.
    totals: dict[str, int] = {}
    for (lang, _), c in counts.items():
        totals[lang] = totals.get(lang, 0) + c
    prod_all = 1
    for v in totals.values():
        prod_all *= v
    best: dict[str, tuple[int, str]] = {}
    for (lang, tri), c in counts.items():
        score = c * (prod_all // totals[lang])
        cur = best.get(tri)
        if cur is None or score > cur[0] or (score == cur[0] and lang < cur[1]):
            best[tri] = (score, lang)
    model_rows = [(tri, lang) for tri, (_, lang) in best.items()]

    # predict: ONE zero-shuffle Arrow pass with the (tri -> profile_lang)
    # dict in the UDF closure (the model is bounded by the fit sample, the
    # same broadcast-table contract as before). The former JVM form -
    # explode every character trigram (sequence+explode, ~1000x the corpus
    # row count), broadcast-join the model, aggregate votes twice, left-join
    # back - paid a broadcast build plus two aggregation exchanges per
    # invocation for work that is a per-row dict tally. Vote semantics are
    # IDENTICAL and integer-exact: per doc, each modeled trigram occurrence
    # votes for its profile language; majority wins, ties to the
    # lexicographically smaller language; no modeled trigram (or text
    # shorter than 3 chars, or null) -> 'und'. lower() stays JVM-side so
    # unicode case folding is byte-identical to the fit sample's.
    model_dict = dict(model_rows)

    @F.pandas_udf("string")
    def vote_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            out = []
            for t in texts:
                if t is None or len(t) < 3:
                    out.append("und")
                    continue
                votes: dict[str, int] = {}
                get = model_dict.get
                for i in range(len(t) - 2):
                    lang = get(t[i : i + 3])
                    if lang is not None:
                        votes[lang] = votes.get(lang, 0) + 1
                if not votes:
                    out.append("und")
                    continue
                out.append(
                    min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                )
            yield pd.Series(out, dtype=object)

    return docs.select(
        F.col(id_col), vote_udf(F.lower(F.col(text_col))).alias("lang_pred")
    )
