"""Blocking-stage tests: exact grouping, key families, bucket discipline."""

import pandas as pd
from pyspark.sql import functions as F

from libpostal_spark.config import PipelineConfig
from libpostal_spark.operators import blocking


def _files(spark, rows):
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    return spark.createDataFrame(pdf)


def test_with_ids_sha_invariant(spark):
    files = _files(spark, [("r", "p", "c", "python", "hello world")])
    row = blocking.with_ids(files).collect()[0]
    import hashlib

    assert row["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert row["fid"] == hashlib.sha256(b"r\x00p\x00c").hexdigest()


def test_exact_groups_star(spark, cfg):
    rows = [(f"r{i}", "p", "c", "python", "same content here") for i in range(5)]
    rows.append(("rx", "p", "c", "python", "different content"))
    sigs = blocking.signatures(_files(spark, rows), cfg)
    rep_sigs, exact_edges = blocking.exact_groups(sigs)
    assert rep_sigs.count() == 2          # two distinct contents
    edges = exact_edges.collect()
    assert len(edges) == 4                # 5 copies → 4 star edges
    assert len({e["fid1"] for e in edges}) == 1  # all point at one rep


def test_key_family_counts(spark, cfg):
    long_text = " ".join(f"tok{i}" for i in range(300))
    sigs = blocking.signatures(_files(spark, [("r", "p", "c", "python", long_text)]), cfg)
    keys = blocking.blocking_keys(sigs, cfg)
    by_kind = {r["kind"]: r["cnt"] for r in keys.groupBy("kind").agg(F.count("*").alias("cnt")).collect()}
    assert by_kind[blocking.KIND_BAND] == cfg.bands
    assert by_kind[blocking.KIND_SIMHASH] == cfg.simhash_tables
    assert by_kind.get(blocking.KIND_WINNOW, 0) >= 1  # 300 tokens > window


def test_bucket_cap_star_pairing(spark):
    """A bucket larger than max_bucket_size emits O(n) star pairs, not O(n²)."""
    cfg = PipelineConfig(max_bucket_size=4)
    n = 20
    keys = spark.createDataFrame(
        [(f"f{i:02d}", 0, 0, 12345) for i in range(n)], ["fid", "kind", "kid", "khash"]
    )
    pairs, stats = blocking.candidate_pairs(keys, cfg)
    got = pairs.collect()
    assert len(got) == n - 1              # star to min fid
    assert all(r["fid1"] == "f00" for r in got)
    s = {r["kind"]: r for r in stats.collect()}
    assert s[0]["n_oversized"] == 1


def test_small_bucket_all_pairs(spark, cfg):
    keys = spark.createDataFrame(
        [(f"f{i}", 0, 0, 7) for i in range(4)], ["fid", "kind", "kid", "khash"]
    )
    pairs, _ = blocking.candidate_pairs(keys, cfg)
    assert pairs.count() == 6             # C(4,2)


def test_pairs_deduped_across_families(spark, cfg):
    keys = spark.createDataFrame(
        [("a", 0, 0, 7), ("b", 0, 0, 7), ("a", 1, 0, 9), ("b", 1, 0, 9)],
        ["fid", "kind", "kid", "khash"],
    )
    pairs, _ = blocking.candidate_pairs(keys, cfg)
    rows = pairs.collect()
    assert len(rows) == 1
    assert sorted(rows[0]["sources"]) == [0, 1]
