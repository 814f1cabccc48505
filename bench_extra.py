#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is frozen).

Replicates bench.py's per-query phase exactly — ONE local[$SPARK_GRAFT_CPUS]
session, registry order, `fn(spark, sf_dir).count()` timing, cold first run —
then optionally:

  * a SECOND timed run per query (warm-cache number, diagnostic only),
  * an `explain("formatted")` dump per query into plans/r08/<q>_<tag>.txt
    (dumped AFTER the timed run so eager caches match bench behavior).

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_EXTRA_PLANS    tag -> dump plans/r08/<q>_<tag>.txt ('' = no dump)
  BENCH_EXTRA_REPEAT   extra warm runs per query (default 0)
  BENCH_EXTRA_ONLY     comma-separated query names (default: all)

Prints one JSON line: {"queries": {...cold sec...}, "warm": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libpostal_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = os.environ.get("BENCH_EXTRA_PLANS", "")
    repeat = int(os.environ.get("BENCH_EXTRA_REPEAT", "0"))
    only = {
        q for q in os.environ.get("BENCH_EXTRA_ONLY", "").split(",") if q
    }
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r08")
    if tag:
        os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    import __spark_entry__ as entrymod

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            cold[name] = round(time.time() - t0, 3)
        except Exception as ex:  # pragma: no cover
            cold[name] = -1.0
            print(f"query {name} failed: {ex}", file=sys.stderr)
            continue
        for _ in range(repeat):
            t0 = time.time()
            fn(spark, sf_dir).count()
            warm[name] = round(time.time() - t0, 3)
        if tag:
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")
                )
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"),
                          "w") as fh:
                    fh.write(plan)
            except Exception as ex:  # pragma: no cover
                print(f"plan dump {name} failed: {ex}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    out = {"queries": cold, "total": round(sum(cold.values()), 3)}
    if warm:
        out["warm"] = warm
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
