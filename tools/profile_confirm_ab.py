#!/usr/bin/env python
"""A/B the two confirm strategies (store_shingles True/False) inside ONE
warm JVM, alternating, per-strategy minimum — the only comparison that
survives this host's time-varying bandwidth. Also A/Bs at two partition
caps so the 1-core vs 4-core ratio of each strategy is visible.

    PROF_SF=0.1 PROF_ROUNDS=2 python tools/profile_confirm_ab.py
"""
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_spark.config import PipelineConfig
from libpostal_spark.corpus import cached_corpus_parquet
from libpostal_spark.pipeline import DedupPipeline
from libpostal_spark.session import get_spark

SF = float(os.environ.get("PROF_SF", "0.1"))
ROUNDS = int(os.environ.get("PROF_ROUNDS", "2"))
# pin both strategies explicitly — the package DEFAULT was flipped to the
# lean path after this A/B measured it faster, so relying on the default
# here would silently compare lean vs lean
CFGS = {
    "jvm": replace(PipelineConfig(), store_shingles=True),
    "py": replace(PipelineConfig(), store_shingles=False),
}


def main():
    out = open(os.environ.get("PROF_OUT", "/tmp/prof_confirm_ab.log"), "a")

    def p(*a):
        print(*a, file=out, flush=True)

    n_base = max(200, int(SF * 200_000))
    path = cached_corpus_parquet(
        n_base=n_base,
        n_boilerplate_copies=max(20, n_base // 50),
        n_clone_embed=max(5, n_base // 200),
        seed=42,
    )
    spark = get_spark(app_name="prof_ab", master="local[4]")
    inputs = {}
    for n in (1, 4):
        f = (
            spark.read.parquet(path)
            .select("repo", "path", "commit", "lang", "content")
            .repartition(n)
            .persist()
        )
        cnt = f.count()
        inputs[n] = f
    p(f"== confirm A/B local[4] n_files={cnt} sf={SF}")

    def one_run(mode, n):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum", str(n)
        )
        t0 = time.time()
        res = DedupPipeline(spark, CFGS[mode]).run(inputs[n])
        res.clusters.count()
        dt = time.time() - t0
        res.release()
        return dt

    best = {}
    for mode in ("jvm", "py"):
        for n in (4, 1):
            one_run(mode, n)  # warmup each combo once
    for r in range(ROUNDS):
        for mode in ("jvm", "py") if r % 2 == 0 else ("py", "jvm"):
            for n in (4, 1) if r % 2 == 0 else (1, 4):
                t = one_run(mode, n)
                k = (mode, n)
                best[k] = min(best.get(k, 1e9), t)
                p(f"  r{r} {mode} n={n} {t:.2f}s")
    for mode in ("jvm", "py"):
        t1, t4 = best[(mode, 1)], best[(mode, 4)]
        p(f"{mode}: T1={t1:.2f} T4={t4:.2f} eff={(t1/t4)/4:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
