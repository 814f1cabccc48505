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
    """argmax over marker-word counts; ties and zero-evidence → 'und'."""
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
    fit_max_docs: int = 2000,
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

    At scale: the model is a small (tri → lang) table — broadcast it; the
    fit runs over a labeled sample, prediction over everything.
    """
    from pyspark.sql import Window

    lowered = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang_label"),
        F.lower(F.col(text_col)).alias("t"),
    ).filter(F.length("t") >= 3)
    tris = lowered.withColumn(
        "pos", F.explode(F.sequence(F.lit(1), F.length("t") - 2))
    ).select(
        id_col, "lang_label", F.expr("substring(t, pos, 3)").alias("tri")
    )
    # the trigram stream feeds BOTH the fit (counts) and the vote join —
    # materialize once instead of re-exploding the corpus per consumer
    tris = tris.persist()

    # fit on a bounded, DETERMINISTIC document sample at scale (first
    # fit_max_docs ids in sort order — reproducible, oracle-replayable);
    # prediction still covers every document. At the sf0.01 compare scale
    # the corpus is below the bound, so fit == full and the SQL twin's
    # totals match exactly.
    n_docs = docs.select(id_col).count()
    fit_src = tris
    if n_docs > fit_max_docs:
        sample_ids = (
            docs.select(id_col).orderBy(id_col).limit(fit_max_docs)
        )
        fit_src = tris.join(F.broadcast(sample_ids), id_col)

    counts = fit_src.groupBy("lang_label", "tri").agg(F.count("*").alias("cnt"))
    totals = {
        r["lang_label"]: int(r["n"])
        for r in counts.groupBy("lang_label")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    langs = sorted(totals)
    # cross-multiplied score: cnt_L * prod(totals of the OTHER languages)
    # orders exactly like cnt_L / total_L (all positive integers)
    prod_all = 1
    for v in totals.values():
        prod_all *= v
    # multipliers exceed int64 at modest corpus sizes (prod of other
    # languages' totals); ship them as DECIMAL STRING literals — F.lit on a
    # >64-bit python int throws. decimal(38,0) bounds the scheme: with L
    # languages, Π totals × max cnt must stay under 10^38 — fit the model
    # on a bounded labeled sample beyond that (enforced below).
    if prod_all * max(totals.values()) >= 10**38:
        raise ValueError(
            "lang_id_trigram: trigram totals too large for exact decimal(38) "
            "cross-multiplication — fit on a smaller labeled sample"
        )
    mult_expr = "CASE lang_label " + " ".join(
        f"WHEN '{lang}' THEN CAST('{prod_all // totals[lang]}' AS DECIMAL(38,0))"
        for lang in langs
    ) + " END"
    scored = counts.withColumn(
        "score", F.col("cnt").cast("decimal(38,0)") * F.expr(mult_expr)
    )
    w_tri = Window.partitionBy("tri").orderBy(
        F.desc("score"), F.asc("lang_label")
    )
    model = (
        scored.withColumn("rk", F.row_number().over(w_tri))
        .filter(F.col("rk") == 1)
        .select("tri", F.col("lang_label").alias("profile_lang"))
    )

    votes = (
        tris.join(model, "tri")
        .groupBy(id_col, "profile_lang")
        .agg(F.count("*").alias("v"))
    )
    w_doc = Window.partitionBy(id_col).orderBy(
        F.desc("v"), F.asc("profile_lang")
    )
    top = (
        votes.withColumn("rk", F.row_number().over(w_doc))
        .filter(F.col("rk") == 1)
        .select(id_col, F.col("profile_lang").alias("lang_pred"))
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
