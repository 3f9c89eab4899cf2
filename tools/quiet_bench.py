#!/usr/bin/env python
"""Round-end quiet-host bench protocol (r14, hardened r16): run the full
``bench.py`` N times over the SAME tree and record TWO absolute
estimators of the quiet-host level this hypervisor-steal-prone box
cannot show in any single run (BASELINE.md: identical code measures
±20-30% between sessions):

* ``quiet_total_s``   — the r14 estimator: MINIMUM of the N run totals.
  Kept for cross-round continuity, but NOT robust to one in-run
  outlier: in r15 a single ``s_join_stream`` 18.9 s spike inflated the
  min-of-totals +24% while per-query medians fell 27% (r15 VERDICT
  "What's wrong" #1).
* ``quiet_total_v2_s`` — the r16 estimator: SUM over queries of the
  MINIMUM across the N runs of that query's (median-of-3) time. Each
  query's quietest observation is taken independently, so one slow
  query in one run cannot poison the total. Slight optimistic bias
  (min of medians), disclosed — the point is robust round-over-round
  comparability, not an absolute throughput claim.

Each child run is the standard ``bench.py`` (median-of-3 per query,
noop sink); its BENCH_DETAIL.json is snapshotted per run. The scale
probe is disabled in all but the LAST run (SPARK_GRAFT_RATIO_SF_DIR="")
so the committed BENCH_DETAIL.json keeps its scale section without
paying the probe N times.

Usage: python tools/quiet_bench.py --round 16 [--runs 3] [--note "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--note", default="")
    ap.add_argument("--out", default=os.path.join(REPO, "QUIET_BENCH.json"))
    args = ap.parse_args()

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    run_totals: dict[str, float] = {}
    run_queries: list[dict[str, float]] = []
    for i in range(args.runs):
        env = dict(os.environ)
        if i < args.runs - 1:
            env["SPARK_GRAFT_RATIO_SF_DIR"] = ""  # scale probe: last run only
        print(f"quiet-bench run {i + 1}/{args.runs} ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            check=True,
            env=env,
            cwd=REPO,
            stdout=subprocess.DEVNULL,
        )
        with open(detail_path) as f:
            detail = json.load(f)
        run_totals[f"run{i + 1}"] = detail["value"]
        run_queries.append(
            {n: t for n, t in detail["queries"].items() if t >= 0}
        )

    names = sorted(set().union(*run_queries))
    per_query_min = {
        n: round(min(q[n] for q in run_queries if n in q), 3) for n in names
    }
    v1 = round(min(run_totals.values()), 3)
    v2 = round(sum(per_query_min.values()), 3)
    out = {
        "metric": "quiet_host_total_s",
        "protocol": (
            f"{args.runs} full bench.py runs (median-of-3 per query, "
            "local[32], sf0.1, noop sink) over the SAME final tree within "
            "one round. quiet_total_s = min of run totals (r14 estimator, "
            "kept for continuity; not robust to one in-run outlier). "
            "quiet_total_v2_s = sum over queries of the min across runs "
            "(r16 estimator; robust to per-run outliers, slight optimistic "
            "bias disclosed)"
        ),
        "recorded_round": args.round,
        "runs_total_s": run_totals,
        "quiet_total_s": v1,
        "quiet_total_v2_s": v2,
        "n_queries": len(names),
    }
    if args.note:
        out["note"] = args.note
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"quiet_total_s={v1} quiet_total_v2_s={v2} over {len(names)} "
        f"queries -> {args.out}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
