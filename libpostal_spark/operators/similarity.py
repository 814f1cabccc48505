"""Similarity search over embedding columns (array<float>).

Two paths, per the training-data-pipeline requirement:

* ``brute_force_topk`` — exact cosine top-k as a pure column expression
  (``zip_with`` dot product + ``aggregate`` fold), fully JVM-side. The
  correctness baseline; O(n) per query, broadcast the query vector.
* ``lsh_topk`` — random-hyperplane (SimHash-for-vectors) bucketing: a pandas
  UDF computes an H-bit sign signature per row; candidates = rows sharing a
  signature band with the query; exact cosine re-rank on candidates only.
  The 100 TB path: signatures are tiny, bucket join replaces the full scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cos_expr(vec_col: str, qvec: list[float]) -> F.Column:
    """cosine(embedding, q) as a sequential double fold (oracle-replicable)."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in qvec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    nq = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot / (na * F.lit(nq))


def brute_force_topk(
    embeddings: DataFrame, qvec: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cos_sim rounded to 4dp), deterministic order."""
    scored = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        F.round(_cos_expr("embedding", qvec), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def make_hyperplane_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """embedding → int signature of sign bits against seeded random planes."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))

    @F.pandas_udf(T.LongType())
    def sig_udf(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0        # (batch, n_bits)
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return sig_udf, planes


def lsh_topk(
    embeddings: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_bits: int = 12,
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket prefilter + exact cosine re-rank.

    Recall is tunable via n_bits (fewer bits → bigger buckets → higher
    recall/cost). At scale the signature column is precomputed and persisted;
    the probe is a partition-pruned equality lookup, not a scan.
    """
    dim = len(qvec)
    sig_udf, planes = make_hyperplane_udf(dim, n_bits, seed)
    q_sig = int(
        ((np.asarray(qvec) @ planes) > 0).astype(np.int64)
        @ (1 << np.arange(n_bits)).astype(np.int64)
    )
    with_sig = embeddings.withColumn("sig", sig_udf(F.col("embedding")))
    candidates = with_sig.filter(F.col("sig") == F.lit(q_sig))
    return brute_force_topk(candidates, qvec, k, id_col)
