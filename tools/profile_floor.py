#!/usr/bin/env python
"""Profile the pipeline's per-run serial floor: phase-by-phase wall times on a
tiny corpus (overhead-dominated) so the non-scaling component is visible."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from libpostal_spark.config import PipelineConfig
from libpostal_spark.corpus import cached_corpus_parquet
from libpostal_spark.operators import blocking, cluster, verify
from libpostal_spark.session import get_spark

CFG = PipelineConfig()
MASTER = os.environ.get("PROF_MASTER", "local[4]")
NBASE = int(os.environ.get("PROF_NBASE", "200"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def main():
    t_all = time.time()
    path = cached_corpus_parquet(
        n_base=NBASE,
        n_boilerplate_copies=max(20, NBASE // 50),
        n_clone_embed=max(5, NBASE // 200),
        seed=CFG.seed,
    )
    t0 = time.time()
    spark = get_spark(app_name="prof", master=MASTER)
    print(f"session_start {time.time()-t0:.2f}s")

    files = spark.read.parquet(path).select(
        "repo", "path", "commit", "lang", "content"
    ).repartition(int(os.environ.get("PROF_NPART", "4"))).persist()
    t0 = time.time(); n = files.count(); print(f"input_count({n}) {time.time()-t0:.2f}s")

    for rep in range(REPS):
        marks = []
        t_run = time.time()

        def mark(label):
            marks.append((label, time.time() - t_run))

        sigs = blocking.signatures(files, CFG).persist()
        t0 = time.time(); sigs.count(); mark(f"sigs_count {time.time()-t0:.2f}")

        rep_sigs, exact_edges = blocking.exact_groups(sigs)
        rep_sigs = rep_sigs.persist()
        keys = blocking.blocking_keys(rep_sigs, CFG)
        pairs, stats, keyed = blocking.candidate_pairs(keys, CFG)
        mark("keyed_count(in candidate_pairs)")

        confirmed = verify.verified_pairs(pairs, rep_sigs, CFG).persist()
        t0 = time.time(); n_conf = confirmed.count(); mark(f"confirmed_count({n_conf}) {time.time()-t0:.2f}")

        rep_labels = cluster.connected_components_auto(
            confirmed, n_conf, CFG.cc_driver_max_edges
        )
        mark("cc")

        member_labels = (
            exact_edges.select("fid1", "fid2")
            .join(rep_labels.withColumnRenamed("fid", "fid1"), "fid1", "left")
            .select(
                F.col("fid2").alias("fid"),
                F.coalesce("component", "fid1").alias("component"),
            )
        )
        labels = rep_labels.unionByName(member_labels)
        clusters = cluster.label_universe(labels, sigs).withColumn(
            "is_canonical", F.col("fid") == F.col("component")
        )
        t0 = time.time(); clusters.count(); mark(f"clusters_count {time.time()-t0:.2f}")

        total = time.time() - t_run
        print(f"run{rep} total {total:.2f}s :: " + " | ".join(f"{l} @{t:.2f}" for l, t in marks))
        for df in (sigs, rep_sigs, confirmed, keyed):
            if df is not None:
                df.unpersist()
    print(f"all {time.time()-t_all:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
