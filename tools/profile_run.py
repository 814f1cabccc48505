#!/usr/bin/env python
"""Decompose one DedupPipeline.run into its driver actions.

Mirrors pipeline.py's in-memory path step by step with wall-clock marks, so
the serial floor (per-action planning/scheduling + driver CC) is visible
next to the parallel work. Use PROF_MASTER / PROF_SF / PROF_REPS to vary.

    PROF_MASTER=local[4] PROF_SF=0.2 python tools/profile_run.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_spark.config import PipelineConfig
from libpostal_spark.corpus import cached_corpus_parquet
from libpostal_spark.operators import blocking, cluster, verify
from libpostal_spark.session import get_spark

CFG = PipelineConfig()
MASTER = os.environ.get("PROF_MASTER", "local[4]")
SF = float(os.environ.get("PROF_SF", "0.2"))
REPS = int(os.environ.get("PROF_REPS", "3"))
_m = __import__("re").search(r"\[(\d+)\]", MASTER)
NPART = int(os.environ.get("PROF_NPART", _m.group(1) if _m else "4"))


def main():
    out = open(os.environ.get("PROF_OUT", "/tmp/profile_run.log"), "a")

    def p(*a):
        print(*a, file=out, flush=True)

    n_base = max(200, int(SF * 200_000))
    path = cached_corpus_parquet(
        n_base=n_base,
        n_boilerplate_copies=max(20, n_base // 50),
        n_clone_embed=max(5, n_base // 200),
        seed=CFG.seed,
    )
    extra = {}
    if os.environ.get("PROF_SMJ") == "0":
        extra["spark.sql.join.preferSortMergeJoin"] = "false"
    spark = get_spark(
        app_name="prof",
        master=MASTER,
        shuffle_partitions=(
            int(os.environ["PROF_SHUF"]) if "PROF_SHUF" in os.environ else None
        ),
        extra_conf=extra,
    )
    files = (
        spark.read.parquet(path)
        .select("repo", "path", "commit", "lang", "content")
        .repartition(NPART)
        .persist()
    )
    n = files.count()
    p(f"== {MASTER} npart={NPART} n={n}")

    for rep in range(REPS):
        t_run = time.time()
        marks = []

        def mark(label, t0):
            marks.append((label, time.time() - t0))

        t0 = time.time()
        with_rep = blocking.exact_rep_frame(
            blocking.signatures(files, CFG)
        ).persist()
        with_rep.count()
        mark("featurize+shawin", t0)

        t0 = time.time()
        sigs = with_rep.drop("rep_fid")
        rep_sigs, exact_edges = blocking.exact_groups(with_rep)
        keys = blocking.blocking_keys(rep_sigs, CFG)
        pairs, stats, keyed = blocking.candidate_pairs(keys, CFG)
        mark("keys+bucket_agg", t0)

        t0 = time.time()
        confirmed = verify.verified_pairs(pairs, rep_sigs, CFG).persist()
        n_conf = confirmed.count()
        mark(f"confirm({n_conf})", t0)

        t0 = time.time()
        rep_labels = cluster.connected_components_auto(
            confirmed, n_conf, CFG.cc_driver_max_edges
        )
        mark("cc", t0)

        t0 = time.time()
        from pyspark.sql import functions as F

        universe = with_rep.select("fid", "rep_fid")
        clusters = (
            universe.join(
                rep_labels.select(
                    F.col("fid").alias("rep_fid"),
                    F.col("component").alias("cc_component"),
                ),
                "rep_fid",
                "left",
            )
            .select(
                "fid", F.coalesce("cc_component", "rep_fid").alias("component")
            )
            .withColumn("is_canonical", F.col("fid") == F.col("component"))
        )
        clusters.count()
        mark("label+count", t0)

        total = time.time() - t_run
        p(
            f"run{rep} total {total:.2f}s :: "
            + " | ".join(f"{lbl} {t:.2f}" for lbl, t in marks)
        )
        for df in (with_rep, confirmed, keyed):
            if df is not None:
                df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
