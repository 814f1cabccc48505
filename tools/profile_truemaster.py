#!/usr/bin/env python
"""A/B: partition-cap same-JVM scaling protocol vs TRUE-MASTER switching.

Hypothesis (round 6): the partition-cap protocol's hi config runs every
stage at exactly 4 partitions, so one page-fault-stalled worker idles 25%
of capacity for the whole stage (straggler tail).  Switching the MASTER
per config inside one Python process keeps the same JVM (py4j gateway is
process-cached; SparkContext.stop does not kill it), so the heap stays
warm, while local[4] with ~16 fine partitions lets the scheduler balance
stalls away.  The lo config (local[1]) is sequential either way.

Configs per round (interleaved, min-of-rounds reported):
  cap_hi   local[4] ctx, repartition(4)  + shuffle=4   (current protocol)
  cap_lo   local[4] ctx, repartition(1)  + shuffle=1   (current protocol)
  t4_p16   local[4] ctx, repartition(16) + shuffle=16, minPartitionNum=8
  t1_p16   local[1] ctx, repartition(16) + shuffle=16
  t1_p1    local[1] ctx, repartition(1)  + shuffle=1

    PROF_SF=0.1 PROF_ROUNDS=2 python tools/profile_truemaster.py
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
SF = float(os.environ.get("PROF_SF", "0.1"))
ROUNDS = int(os.environ.get("PROF_ROUNDS", "2"))
OUT = open(os.environ.get("PROF_OUT", "/tmp/profile_truemaster.log"), "a")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def corpus(sf):
    n_base = max(200, int(sf * 200_000))
    return cached_corpus_parquet(
        n_base=n_base,
        n_boilerplate_copies=max(20, n_base // 50),
        n_clone_embed=max(5, n_base // 200),
        seed=CFG.seed,
    )


PATH = corpus(SF)
WARM_PATH = corpus(max(0.01, SF / 10))  # small warmup corpus (worker cold-start)


def run_once(spark, files):
    t0 = time.time()
    res = DedupPipeline(spark, CFG).run(files)
    res.clusters.count()
    dt = time.time() - t0
    res.release()
    return dt


def load(spark, path, n_part):
    f = (
        spark.read.parquet(path)
        .select("repo", "path", "commit", "lang", "content")
        .repartition(n_part)
        .persist()
    )
    f.count()
    return f


def session_for(master, shuffle, min_part):
    s = get_spark(app_name=f"prof_tm_{master}_{shuffle}", master=master,
                  shuffle_partitions=shuffle)
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionNum",
               str(min_part))
    return s


def measure_true(master, n_part, shuffle, min_part, warm):
    """Fresh context for this config (same JVM); small warmup absorbs the
    python-worker cold start; one measured run on the main corpus."""
    s = session_for(master, shuffle, min_part)
    if warm:
        wf = load(s, WARM_PATH, n_part)
        run_once(s, wf)
        wf.unpersist()
    f = load(s, PATH, n_part)
    dt = run_once(s, f)
    f.unpersist()
    s.stop()
    return dt


def main():
    t_all = time.time()
    best = {}

    def note(name, dt):
        best[name] = min(best.get(name, float("inf")), dt)
        p(f"  {name:8s} {dt:7.2f}s  at={time.time()-t_all:7.1f}s")

    for rnd in range(ROUNDS):
        # --- partition-cap leg (one local[4] ctx, both configs inside) ---
        s = get_spark(app_name="prof_cap", master="local[4]")
        inputs = {n: load(s, PATH, n) for n in (1, 4)}
        wf = load(s, WARM_PATH, 4)
        s.conf.set("spark.sql.shuffle.partitions", "4")
        s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionNum", "4")
        run_once(s, wf)  # warmup
        wf.unpersist()
        for n, name in ((4, "cap_hi"), (1, "cap_lo")):
            s.conf.set("spark.sql.shuffle.partitions", str(n))
            s.conf.set(
                "spark.sql.adaptive.coalescePartitions.minPartitionNum", str(n)
            )
            note(name, run_once(s, inputs[n]))
        for f in inputs.values():
            f.unpersist()
        s.stop()

        # --- true-master legs (fresh ctx each, same JVM) ---
        note("t4_p16", measure_true("local[4]", 16, 16, 8, warm=True))
        note("t1_p16", measure_true("local[1]", 16, 16, 1, warm=True))
        note("t1_p1", measure_true("local[1]", 1, 1, 1, warm=True))
        p(f"-- round {rnd} done at {time.time()-t_all:.1f}s")

    p("== minima ==")
    for k, v in best.items():
        p(f"  {k:8s} {v:7.2f}s")
    cap_eff = best["cap_lo"] / best["cap_hi"] / 4
    t_eff16 = best["t1_p16"] / best["t4_p16"] / 4
    t_eff1 = best["t1_p1"] / best["t4_p16"] / 4
    p(f"cap eff={cap_eff:.3f}  true eff(lo=p16)={t_eff16:.3f}  "
      f"true eff(lo=p1)={t_eff1:.3f}")


if __name__ == "__main__":
    main()
