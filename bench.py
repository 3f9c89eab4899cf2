#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...,
 "runs": N, "spread": {name: max_minus_min_sec}}

Each query is forced through full execution with the noop sink (no driver collect,
no result materialization cost) — wall-clock measures the distributed plan, which is
what must hold at 100 TB. Streaming queries execute their own write path and are
timed end-to-end including micro-batch replay.

Per-query numbers are the MEDIAN of $SPARK_GRAFT_BENCH_RUNS (default 3) runs
inside ONE Spark session, with the per-query spread (max−min) reported
alongside: host contention on this box moves identical code ±20-30% between
sessions (BASELINE.md), so single-shot numbers masquerade as regressions.
Medians within a session are the comparable signal; A/B only within one run.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_observer_es_spark.registry import all_queries  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402

def run_one(spark, fn, name: str, sf_dir: str) -> tuple[float, float]:
    """(total, build) wall-clock of building + fully executing the plan into
    the noop sink. Streaming queries (s_*) execute their own micro-batch
    pipeline inside fn; their final-result read is included the same way.

    The TOTAL is timed exactly as in every prior round (one timer around
    fn + the noop write); the build component (fn() return — driver-side
    plan construction, plus any actions a query runs inside fn) is split
    out ADDITIONALLY (r17) so the driver can separate driver-side overhead
    from plan execution — the sf0.1 fixture makes per-query fixed cost
    dominate wall clock, which made the r16 core-scaling probe read ~1
    everywhere."""
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    return t2 - t0, t1 - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # JVM/codegen warmup outside the measurement: one scan-shaped and one
    # join+agg-shaped query warm the codegen/shuffle/broadcast machinery
    run_one(spark, queries["q_scan_project"], "q_scan_project", sf_dir)
    run_one(spark, queries["q_join_star"], "q_join_star", sf_dir)

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    builds: dict[str, float] = {}
    for name in sorted(queries):
        samples: list[float] = []
        build_samples: list[float] = []
        for _ in range(runs):
            try:
                t, b = run_one(spark, queries[name], name, sf_dir)
                samples.append(t)
                build_samples.append(b)
            except Exception as exc:  # a failing query must not hide the others
                print(f"bench error {name}: {exc}", file=sys.stderr)
                break  # a query that errors once will error again
        if samples:
            times[name] = round(statistics.median(samples), 3)
            spread[name] = round(max(samples) - min(samples), 3)
            builds[name] = round(statistics.median(build_samples), 3)
        else:
            times[name] = -1.0

    total = round(sum(t for t in times.values() if t >= 0), 3)
    build_total = round(sum(b for b in builds.values() if b >= 0), 3)

    # Scale-shape probe: one extra pass at a smaller SF and the per-query wall
    # ratio. Plan tests pin shuffle/broadcast/pushdown structure; this is the
    # empirical complement — a query whose wall grows much faster than the data
    # ratio (plus fixed overhead, which DEFLATES the ratio) has a scale smell no
    # plan string shows. Threshold: 1.5× the data ratio. Streaming queries sit
    # near 1× (state-commit fixed cost dominates both SFs) — also informative.
    ratio_dir = os.environ.get("SPARK_GRAFT_RATIO_SF_DIR", "/root/testdata/sf0.01")
    scale: dict = {}
    if ratio_dir and os.path.isdir(ratio_dir) and ratio_dir != sf_dir:
        m2 = re.search(r"sf([0-9.]+)", ratio_dir)
        small_sf = float(m2.group(1).rstrip(".")) if m2 else -1.0
        data_ratio = sf / small_sf if small_sf > 0 else -1.0
        small_times: dict[str, float] = {}
        ratios: dict[str, float] = {}
        flagged: list[str] = []
        for name in sorted(queries):
            try:
                small_times[name] = round(
                    run_one(spark, queries[name], name, ratio_dir)[0], 3
                )
            except Exception as exc:
                print(f"bench ratio error {name}: {exc}", file=sys.stderr)
        for name, small in small_times.items():
            if times.get(name, -1) > 0 and small > 0:
                r = round(times[name] / small, 2)
                ratios[name] = r
                if data_ratio > 0 and r > 1.5 * data_ratio:
                    flagged.append(name)
        scale = {
            "sf_dir": ratio_dir,
            "sf": small_sf,
            "data_ratio": data_ratio,
            "runs": 1,
            "queries": small_times,
            "wall_ratio": ratios,
            "flag_threshold": round(1.5 * data_ratio, 1) if data_ratio > 0 else None,
            "flagged": sorted(flagged, key=lambda n: -ratios[n]),
        }

    # Full per-query detail (all queries, medians + spread) goes to a repo file;
    # stdout must stay under the harness's 2000-char tail capture or the line is
    # truncated mid-JSON and recorded as unparseable (BENCH_r01..r03 all show
    # "parsed": null for exactly this reason).
    detail = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "runs": runs,
        "spread": spread,
        "scale": scale,
        # r17 additions (timing methodology unchanged — the split reuses the
        # same timer endpoints): per-query driver-side build phase (fn()
        # return) and the build/exec totals, so the driver can separate
        # driver overhead from plan execution at this fixed-cost-dominated SF
        "build": builds,
        "build_total_s": build_total,
        "exec_total_s": round(total - build_total, 3),
    }
    # Quiet-host absolute totals (round-14 protocol, hardened r16):
    # this host's contention moves identical code ±20-30% between
    # sessions, so the committed artifact trail needs absolute numbers
    # that AREN'T weather — min-of-run-totals (quiet_total_s, kept for
    # continuity) and the outlier-robust sum-of-per-query-min
    # (quiet_total_v2_s), both recorded by tools/quiet_bench.py into
    # QUIET_BENCH.json and passed through here verbatim (with the
    # recording round, so a stale file is visible as such) into both
    # the detail artifact and the stdout line the driver records.
    quiet_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "QUIET_BENCH.json"
    )
    quiet = None
    if os.path.exists(quiet_path):
        # a malformed protocol file must not discard the whole measured
        # run at the very last step — degrade to omitting the fields
        try:
            with open(quiet_path) as f:
                quiet = json.load(f)
            if not isinstance(quiet, dict):
                raise ValueError(f"QUIET_BENCH.json is {type(quiet).__name__}")
        except (ValueError, OSError) as exc:
            print(f"quiet-bench file unreadable, skipping: {exc}", file=sys.stderr)
            quiet = None
    if quiet is not None:
        detail["quiet_total_s"] = quiet.get("quiet_total_s")
        detail["quiet_total_v2_s"] = quiet.get("quiet_total_v2_s")
        detail["quiet_recorded_round"] = quiet.get("recorded_round")
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"full per-query detail written to {detail_path}", file=sys.stderr)

    # stdout line: total + slowest-first per-query entries until the budget is
    # spent, so the recorded tail always parses and carries the queries that
    # dominate the total.
    budget = 1900
    shown: dict[str, float] = {}
    summary = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": shown,
        "sf": sf,
        "runs": runs,
        "queries_total": len(times),
        "queries_omitted": len(times),
        "scale_flagged": len(scale.get("flagged", [])) if scale else None,
        "detail": "BENCH_DETAIL.json",
        "build_total_s": build_total,
        "exec_total_s": round(total - build_total, 3),
    }
    if quiet is not None:
        summary["quiet_total_s"] = quiet.get("quiet_total_s")
        summary["quiet_total_v2_s"] = quiet.get("quiet_total_v2_s")
        summary["quiet_recorded_round"] = quiet.get("recorded_round")
    # stdout entries are rounded to 2 decimals (the full 3-decimal medians
    # stay in BENCH_DETAIL.json) — every character saved lets more of the
    # fast tail fit the budget instead of surfacing as phantom
    # "dropped_from_bench" rows in the driver's diff (r16 VERDICT item 5)
    for name in sorted(times, key=lambda n: -times[n]):
        shown[name] = round(times[name], 2)
        summary["queries_omitted"] = len(times) - len(shown)
        if len(json.dumps(summary, separators=(",", ":"))) > budget:
            del shown[name]
            summary["queries_omitted"] = len(times) - len(shown)
            break
    print(json.dumps(summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
