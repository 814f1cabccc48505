#!/usr/bin/env python
"""Measure N-vs-4N scaling with parallelism capped by PARTITION COUNT inside
ONE warm JVM (master local[4N]): config N runs every stage at N partitions
(input repartition + spark.sql.shuffle.partitions=N), so at most N tasks are
in flight. Both configs share the same JVM heap, page pool, and python
workers — the substrate's JVM-restart fault asymmetry cannot bias the ratio.

    PROF_N=1 PROF_SF=0.2 python tools/profile_scaling_samejvm.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_spark.config import PipelineConfig
from libpostal_spark.corpus import cached_corpus_parquet
from libpostal_spark.pipeline import DedupPipeline
from libpostal_spark.session import get_spark

CFG = PipelineConfig()
N = int(os.environ.get("PROF_N", "1"))
SF = float(os.environ.get("PROF_SF", "0.2"))
ROUNDS = int(os.environ.get("PROF_ROUNDS", "2"))


def main():
    out = open(os.environ.get("PROF_OUT", "/tmp/profile_samejvm.log"), "a")

    def p(*a):
        print(*a, file=out, flush=True)

    n_base = max(200, int(SF * 200_000))
    path = cached_corpus_parquet(
        n_base=n_base,
        n_boilerplate_copies=max(20, n_base // 50),
        n_clone_embed=max(5, n_base // 200),
        seed=CFG.seed,
    )
    hi = 4 * N
    spark = get_spark(app_name="prof_same", master=f"local[{hi}]")
    inputs = {}
    for n in (N, hi):
        f = (
            spark.read.parquet(path)
            .select("repo", "path", "commit", "lang", "content")
            .repartition(n)
            .persist()
        )
        cnt = f.count()
        inputs[n] = f
    p(f"== samejvm local[{hi}] N={N} n_files={cnt}")

    def one_run(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum", str(n)
        )
        t0 = time.time()
        res = DedupPipeline(spark, CFG).run(inputs[n])
        res.clusters.count()
        dt = time.time() - t0
        res.release()
        return dt

    best = {N: float("inf"), hi: float("inf")}
    # warmup both configs once (discarded), then alternating measured rounds
    one_run(hi)
    one_run(N)
    order = [(N, hi), (hi, N)] * ((ROUNDS + 1) // 2)
    for rnd in order[:ROUNDS]:
        for n in rnd:
            t = one_run(n)
            best[n] = min(best[n], t)
            p(f"  run local[{hi}]/{n}part {t:.2f}s")
    eff = (best[N] / best[hi]) / 4.0
    p(f"T{N}={best[N]:.2f} T{hi}={best[hi]:.2f} speedup={best[N]/best[hi]:.2f} eff={eff:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
