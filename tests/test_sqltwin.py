"""DuckDB SQL-twin parity for the sha256 oracle-replayable hash mode.

Pins that the HUGEINT mod-2^64 replay (libpostal_spark.sqltwin) reproduces
the engine's hashing core value-for-value: minhash permutations, simhash
majority bits, band-hash folds, winnow sliding minima — on a corpus with
empty docs, sub-k docs, exact dups, and a >winnow_window doc.
"""

import dataclasses

import duckdb
import numpy as np
import pandas as pd

from libpostal_spark import sqltwin
from libpostal_spark.config import PipelineConfig
from libpostal_spark.core import featurize as FZ
from libpostal_spark.core.canonicalize import canonicalize_batch

CFG = dataclasses.replace(PipelineConfig(), hash_mode="sha256")

TEXTS = [
    "def foo(): pass",
    "",
    "x",
    " ".join(f"tok{i} filler{i}" for i in range(120)),
    "def foo(): pass",
    "short one two three",
]


def _fixture():
    from __spark_entry__ import _canon_expr

    pdf = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    con = duckdb.connect()
    con.register("documents", pdf)
    canon = canonicalize_batch(pdf["text"])
    return con, _canon_expr("text"), FZ.featurize(canon, CFG)


def test_minhash_long_twin_value_exact():
    con, canon_expr, f = _fixture()
    odf = con.sql(sqltwin.minhash_long_sql(canon_expr, CFG)).df()
    assert len(odf) == len(TEXTS) * CFG.num_perm
    eng = f.minhash.view(np.int64)
    for _, r in odf.iterrows():
        assert eng[int(r["doc_id"]), int(r["perm_i"])] == int(r["mh"])


def test_signature_summary_twin_value_exact():
    con, canon_expr, f = _fixture()
    sdf = (
        con.sql(sqltwin.signature_summary_sql(canon_expr, CFG))
        .df()
        .set_index("doc_id")
        .sort_index()
    )
    for d in range(len(TEXTS)):
        bx = 0
        for b in f.bands[d]:
            bx ^= int(b)
        wx = 0
        for w in f.winnow[d]:
            wx ^= int(w)
        row = sdf.loc[d]
        assert int(row["n_tokens"]) == int(f.n_tokens[d])
        assert int(row["n_shingles"]) == len(f.shingles[d])
        assert int(row["simhash"]) == int(f.simhash[d])
        assert int(row["band_xor"]) == bx
        assert int(row["n_winnow"]) == len(f.winnow[d])
        assert int(row["winnow_xor"]) == wx


def test_sha_mode_only_changes_token_hash():
    """blake2b and sha256 modes must produce the same structure (counts)
    but different hash values — the machinery is shared."""
    canon = canonicalize_batch(pd.Series(TEXTS))
    f_sha = FZ.featurize(canon, CFG)
    f_blake = FZ.featurize(canon, PipelineConfig())
    assert list(f_sha.n_tokens) == list(f_blake.n_tokens)
    assert [len(s) for s in f_sha.shingles] == [len(s) for s in f_blake.shingles]
    assert f_sha.minhash.shape == f_blake.minhash.shape
    assert (f_sha.minhash != f_blake.minhash).any()


def test_candidate_pairs_twin_value_exact():
    """The full blocking replay: exact contraction, three key families,
    bucket pairing with min-kind provenance — python engine vs DuckDB."""
    import hashlib
    from collections import defaultdict

    from __spark_entry__ import _canon_expr

    cfg = dataclasses.replace(
        PipelineConfig(), hash_mode="sha256", max_bucket_size=1 << 30
    )
    texts = []
    for fam in range(4):
        base = " ".join(f"f{fam}tok{i} f{fam}fill{i}" for i in range(50))
        texts += [base, base + " tail", base + " other end bits", base]
    run = " ".join(f"clone{i}" for i in range(200))
    texts += ["A " + run, run + " B unrelated suffix here", "", "short"]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    f = FZ.featurize(canonicalize_batch(pdf["text"]), cfg)
    fid = [
        hashlib.sha256(f"s\x00{i}\x000".encode()).hexdigest()
        for i in range(len(texts))
    ]
    csha = [hashlib.sha256(t.encode()).hexdigest() for t in texts]
    repmap = {
        i: min(fid[j] for j in range(len(texts)) if csha[j] == csha[i])
        for i in range(len(texts))
    }
    reps = [i for i in range(len(texts)) if fid[i] == repmap[i]]
    buckets = defaultdict(list)
    for i in reps:
        for b, h in enumerate(f.bands[i]):
            buckets[(0, b, int(h))].append(fid[i])
        for t, h in enumerate(f.simhash_keys[i]):
            buckets[(1, t, int(h))].append(fid[i])
        for h in f.winnow[i]:
            buckets[(2, 0, int(h))].append(fid[i])
    pairs: dict = {}
    for (kind, _, _), members in buckets.items():
        for a in members:
            for b in members:
                if a < b:
                    pairs[(a, b)] = min(pairs.get((a, b), 99), kind)
    exp = {(a, b, s) for (a, b), s in pairs.items()}
    odf = con.sql(
        sqltwin.candidate_pairs_sql(_canon_expr("text"), cfg)
    ).df()
    got = {(r["fid1"], r["fid2"], int(r["source"])) for _, r in odf.iterrows()}
    assert exp and exp == got
