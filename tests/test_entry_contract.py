"""Driver-contract sanity: queries()/oracle_sql() alignment and smoke runs
at sf0.001 (the cheap scale; the driver runs sf0.01 + DuckDB itself)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_registry_fits_driver_window():
    # the driver's correctness harness checks only the FIRST 50 registry
    # entries (measured in round 6: queries 51-53 went unverified); keep the
    # registry at <= 50 so every operator-bearing query stays hash-checked
    assert len(E.queries()) <= 50, (
        f"{len(E.queries())} queries registered; entries past position 50 "
        "silently skip the driver's correctness check — merge or reorder"
    )


def test_oracle_keys_subset_of_queries():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q, f"oracle keys without queries: {o - q}"
    # the SQL-expressible core must stay oracle-checked
    for name in ["canonicalize", "token_counts", "doc_fingerprint", "ann_cosine_topk"]:
        assert name in o


@pytest.mark.parametrize(
    "name",
    ["canonicalize", "token_counts", "quality_score", "lang_id",
     "token_jaccard_adjacent", "ann_cosine_topk", "minhash_signatures"],
)
def test_query_smoke(spark, name):
    df = E.queries()[name](spark, SF)
    assert df.count() > 0


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "component", "is_canonical"}
