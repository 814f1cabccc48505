"""Address parser (averaged perceptron) — core/perceptron.py +
operators/parser.py vs the reference tagger design
(src/averaged_perceptron_tagger.c greedy decode, src/address_parser.c)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_spark.core import crf  # noqa: E402
from libpostal_spark.core.perceptron import decode, fit  # noqa: E402
from libpostal_spark.operators import parser as P  # noqa: E402


def _holdout():
    for k in range(0, 5000, 7):
        yield P.render_address(
            k % P.N_DIALECTS,
            k % 9999 + 1,
            P.ROADS[(k // 3) % len(P.ROADS)],
            P.ROAD_KINDS[(k // 7) % len(P.ROAD_KINDS)],
            k % 97 + 1,
            P.CITIES[k % len(P.CITIES)],
            (k * 7919) % 90000 + 10000,
            P.COUNTRIES[(k // 11) % len(P.COUNTRIES)],
            state=f"nation_{k % 25}",
        )


def test_fit_deterministic():
    """Two independent fits produce bit-identical weight tables (pure
    function of its inputs — the property the SQL twin relies on)."""
    ex = P.training_examples()
    m1 = fit(ex, P.TAGS, P.address_features, iters=P.FIT_ITERS)
    m2 = fit(ex, P.TAGS, P.address_features, iters=P.FIT_ITERS)
    assert m1.tags == m2.tags
    assert m1.export_rows() == m2.export_rows()
    assert len(m1.export_rows()) > 50


def test_training_converges():
    """The grid is linearly separable under the feature templates: the
    trained model re-decodes every training sequence exactly."""
    m = P.get_address_model()
    errs = sum(
        decode(toks, m.weights, m.tags, P.address_features) != tags
        for toks, tags in P.training_examples()
    )
    assert errs == 0


def test_holdout_accuracy_exact():
    """Custkey-style generation (different number streams + unseen
    city/road/country combinations) decodes 100% — digit normalization
    plus the tag-history features generalize past the training grid."""
    for toks, gold in _holdout():
        assert P.parse_tokens(toks) == gold, toks


def test_crf_fit_deterministic_and_converges():
    """CRF variant: two fits are bit-identical; the trained model
    re-decodes every training sequence exactly and learns a genuinely
    nonzero transition matrix (Viterbi has something to use)."""
    ex = P.training_examples()
    m1 = crf.fit(ex, P.TAGS, P.obs_features, iters=P.FIT_ITERS)
    m2 = crf.fit(ex, P.TAGS, P.obs_features, iters=P.FIT_ITERS)
    assert m1.export_state_rows() == m2.export_state_rows()
    assert m1.export_trans_rows() == m2.export_trans_rows()
    assert len(m1.export_trans_rows()) > 10
    errs = sum(
        crf.decode(toks, m1, P.obs_features) != tags for toks, tags in ex
    )
    assert errs == 0


def test_crf_holdout_accuracy_exact():
    m = P.get_address_crf()
    for toks, gold in _holdout():
        assert crf.decode(toks, m, P.obs_features) == gold, toks


def test_crf_transitions_matter():
    """With the transition matrix zeroed, position-wise argmax over the
    observation features alone CANNOT separate the ambiguous digit
    roles — some holdout sequence must fail. The full model decodes
    them all (test above): the learned transitions are load-bearing,
    which is the point of the CRF (crf.h:4-8)."""
    import numpy as np

    m = P.get_address_crf()
    zeroed = crf.CRFModel(m.tags, m.state, np.zeros_like(m.trans))
    assert any(
        crf.decode(toks, zeroed, P.obs_features) != gold
        for toks, gold in _holdout()
    )


def test_history_features_matter():
    """The dialect-1 house number (digit after two road tokens) and the
    dialect-2 unit (digit after 'apt') are the SAME word shape — only
    the predicted-tag history separates them (the reference's reason
    for prev/prev2 conditioning, averaged_perceptron_tagger.c:16-68)."""
    assert P.parse_tokens(["oak", "road", "17", "fairview", "asia"]) == [
        "road", "road", "house_number", "city", "country",
    ]
    assert P.parse_tokens(
        ["17", "oak", "road", "apt", "4", "fairview", "90210", "asia"]
    ) == [
        "house_number", "road", "road", "unit", "unit", "city",
        "postcode", "country",
    ]


def test_distributed_matches_local(spark):
    """One Arrow-batched prediction pass == the local decode, row for
    row, and the synthesized gold labels agree with render_address."""
    sf_dir = "/root/testdata/sf0.001"
    pdf = P.parse_addresses(P.synth_addresses(spark, sf_dir)).toPandas()
    assert len(pdf) == 150
    for _, r in pdf.iterrows():
        assert r["tags_pred"] == " ".join(P.parse_tokens(r["address"].split(" ")))
        assert r["tags_pred"] == r["tags_gold"]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("model", ["greedy", "crf"])
def test_twin_scale_free(sf_dir, model):
    """Both SQL twins replay their full decode bit-exactly at two sf
    dirs without regeneration (weights are table-independent)."""
    con = duckdb.connect()
    try:
        for t in ("customer", "nation", "region"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        sql = P.twin_sql() if model == "greedy" else P.crf_twin_sql()
        df = con.sql(sql).df()
    finally:
        con.close()
    assert df["is_correct"].all()
    if model == "greedy":
        dec = lambda a: P.parse_tokens(a.split(" "))  # noqa: E731
    else:
        m = P.get_address_crf()
        dec = lambda a: crf.decode(a.split(" "), m, P.obs_features)  # noqa: E731
    for _, r in df.iterrows():
        assert r["tags_pred"] == " ".join(dec(r["address"]))


def test_null_address_yields_null_tags(spark):
    """NULL/empty address rows yield NULL tags, not a task crash — the
    CLI feeds arbitrary user columns into the parse UDFs."""
    df = spark.createDataFrame(
        [(1, "17 oak road fairview 90210 asia"), (2, None), (3, "")],
        "rid long, address string",
    )
    for parse in (P.parse_addresses, P.parse_addresses_crf):
        rows = {r["rid"]: r["tags_pred"] for r in parse(df).collect()}
        assert rows[1] == "house_number road road city postcode country"
        assert rows[2] is None and rows[3] is None


def test_noisy_heldout_accuracy_is_a_signal():
    """Round-7 VERDICT item 5: with the reference's failure modes injected
    (abbreviated/dropped road kinds, dropped postcode/country/apt, city
    typos at Damerau distance 1) held-out accuracy is a real model-quality
    signal, not a separability artifact. Fully deterministic, so the
    numbers are pinned exactly — they are the BASELINE.md accuracy table.
    With the base feature set (single <num> digit sentinel, no dictionary
    or character features) the same eval read greedy 0.9714/0.8233 and CRF
    0.9622/0.8000; the reference-parity features (length-preserving D
    digit shapes src/normalize.h:66, dictionary membership
    address_parser.c:1020, pre/suf 3-grams :1425) close the noise gap to
    0.9967 full-parse for BOTH model types — the reference's own reported
    regime (99.45%, README.md:685)."""
    ev = P.noisy_eval()
    assert ev["n_train"] == 1200 and ev["n_heldout"] == 300
    assert ev["greedy"] == {"token_acc": 0.9995, "seq_acc": 0.9967}
    assert ev["crf"] == {"token_acc": 0.9995, "seq_acc": 0.9967}
    # still genuinely sub-1.0 (signal) and far above the majority-tag floor
    for m in ("greedy", "crf"):
        assert 0.9 < ev[m]["token_acc"] < 1.0


def test_noisy_corpus_properties():
    """Injection invariants: tokens/tags stay aligned, every failure mode
    is present, and held-out typo'd city forms are unseen in training."""
    ex = P.noisy_examples()
    assert all(len(t) == len(g) for t, g in ex)
    all_toks = [t for toks, _ in ex for t in toks]
    assert "st" in all_toks and "ave" in all_toks      # abbreviations
    assert any("postcode" not in g for _, g in ex)     # dropped components
    train, held = P.noisy_heldout_split()
    train_vocab = {t for toks, _ in train for t in toks}
    held_city_typos = {
        toks[i]
        for toks, tags in held
        for i, g in enumerate(tags)
        if g == "city" and toks[i] not in P.CITIES
    }
    assert held_city_typos and not (held_city_typos & train_vocab)
