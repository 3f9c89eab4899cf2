#!/usr/bin/env python
"""Split a query's bench wall into DRIVER PLAN-BUILD vs EXECUTE time.

`bench.py` times `fn(spark, sf_dir)` (pure driver-side DataFrame construction:
py4j traffic, literal trees, any parameter collects) plus the noop-sink write
(analysis + optimization + execution). A query whose build phase dominates is
a DRIVER-overhead problem (guide §5: the driver should do almost no work) —
invisible in the Spark UI and in any plan fact, so it needs its own timer.

Usage::

    python tools/phase_time.py q_sim_lsh q_sim_lsh_batch        # sf0.1, 3 reps
    python tools/phase_time.py --all --reps 1                   # whole registry
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_observer_es_spark.registry import all_queries  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("phase-time", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = sorted(queries) if args.all else args.queries

    # warmup (same as bench.py)
    for w in ("q_scan_project", "q_join_star"):
        df = queries[w](spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        builds, execs = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        out[name] = {
            "build_s": round(statistics.median(builds), 3),
            "exec_s": round(statistics.median(execs), 3),
            "build_min_s": round(min(builds), 3),
            "exec_min_s": round(min(execs), 3),
        }
        print(f"{name:28s} build {out[name]['build_s']:7.3f}  exec {out[name]['exec_s']:7.3f}", file=sys.stderr)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
