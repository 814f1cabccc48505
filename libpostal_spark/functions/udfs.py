"""Pandas UDF wrappers around the numpy cores.

The engine's entire Python surface is these two vectorized UDFs (plus the
grouped-map substring verifier in operators/verify.py) — everything else is
JVM-side DataFrame expressions. This mirrors how the reference is "one big
UDF library" consumed from a MapReduce driver (SURVEY.md §2.9), but batched
over Arrow instead of row-at-a-time C calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..core.canonicalize import canonicalize_batch
from ..core.featurize import featurize

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("shingles", T.ArrayType(T.LongType())),
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("simhash", T.LongType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
        T.StructField("simhash_keys", T.ArrayType(T.LongType())),
        T.StructField("winnow", T.ArrayType(T.LongType())),
    ]
)


def make_canonicalize_udf():
    """content:string -> canon:string (vectorized; analog of
    expand_address_root, /root/reference/src/expand.c:1653-1655)."""

    @F.pandas_udf(T.StringType())
    def canonicalize_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for content in it:
            yield canonicalize_batch(content)

    return canonicalize_udf


def make_featurize_udf(cfg: PipelineConfig):
    """canon:string -> struct of every signature feature (one Arrow pass)."""

    @F.pandas_udf(FEATURE_SCHEMA)
    def featurize_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for canon in it:
            f = featurize(canon, cfg)
            yield pd.DataFrame(
                {
                    "n_tokens": f.n_tokens,
                    "shingles": f.shingles,
                    "minhash": list(f.minhash.view(np.int64)),
                    "simhash": f.simhash,
                    "bands": list(f.bands),
                    "simhash_keys": list(f.simhash_keys),
                    "winnow": f.winnow,
                }
            )

    return featurize_udf
