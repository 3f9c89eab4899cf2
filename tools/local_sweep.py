"""Record the full-registry local oracle sweep as a committed artifact.

The driver's per-round correctness window covers ~50 of the 173 registered
queries (CORRECTNESS_r{N}.json); the other rows ride on their last green check.
The builder's discipline has always been a FULL local sweep — every query vs its
DuckDB oracle at sf0.01, plus an adversarial-partitioning pass — but until now
that sweep was only claimed in prose. This tool runs it and writes
``SWEEP_r{N}.json`` so each round's full-registry evidence is in git, per query,
with wall time and the exact session config it ran under.

Three passes by default:

* ``standard``  — ``local[*]`` / 32 shuffle partitions (the bench config),
  with BOTH comparison modes per query: exact-tuple AND the pandas
  driver-parity path (r15 — round 14 proved exact-green can be driver-red
  on DECIMAL coercion; ``pandas_ok`` is recorded per query).
* ``adversarial`` — ``local[4]`` / 3 shuffle partitions: hostile parallelism
  that surfaces any partition-count/order dependence (README "Partition
  independence, verified").
* ``degenerate`` — ``local[2]`` / ONE shuffle partition with AQE disabled:
  the other extreme (no runtime re-planning, a single reducer, minimal task
  parallelism) — catches results that only hold because AQE coalescing or a
  particular partition count hides an order dependence.

All passes run in ONE interpreter: each non-standard pass stops the previous
SparkSession and builds a fresh one (master is session-scoped, not JVM-scoped,
so local[4]/local[2] take effect; verified via ``defaultParallelism`` recorded
in the artifact).

Usage::

    python tools/local_sweep.py                      # all three passes, sf0.01
    python tools/local_sweep.py --skip-adversarial   # standard pass only
    python tools/local_sweep.py --round 7 --out SWEEP_r07.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle_harness import compare, compare_pandas, duckdb_con  # noqa: E402

from hbase_observer_es_spark.registry import all_oracles, all_queries  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402


def infer_round() -> int:
    """Latest CORRECTNESS_r{N}.json + 1 — the round currently being built."""
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def run_pass(spark, sf_dir: str, queries, oracles, pandas_mode: bool = False) -> dict:
    """One full-registry pass. ``pandas_mode`` additionally re-runs every
    oracle comparison through :func:`compare_pandas` — the driver-parity
    path (toPandas vs rel.df()) that round 14 proved can fail where the
    exact-tuple mode passes (DECIMAL coercion asymmetry). A query is only
    ``ok`` when BOTH modes agree; the artifact records ``pandas_ok`` so a
    parity-only failure is distinguishable."""
    con = duckdb_con(sf_dir)
    out: dict[str, dict] = {}
    try:
        for name in sorted(queries):
            t0 = time.monotonic()
            pandas_ok = None
            try:
                df = queries[name](spark, sf_dir)
                if name in oracles:
                    res = compare(name, df, con, oracles[name])
                    ok, detail, mode = res.ok, res.detail, "oracle"
                    rows = res.row_count_spark
                    if pandas_mode and ok:
                        # reuse the SAME DataFrame: toPandas re-executes
                        # the job (unavoidable) but not a rebuilt plan
                        res2 = compare_pandas(name, df, con, oracles[name])
                        pandas_ok = res2.ok
                        if not res2.ok:
                            ok, detail = False, f"pandas-parity: {res2.detail}"
                else:
                    rows = df.count()  # executor-side; never pull rows to driver
                    ok, detail, mode = True, "", "rows-only"
            except Exception as e:  # noqa: BLE001 - artifact records the failure
                ok, detail, mode, rows = False, f"{type(e).__name__}: {e}"[:300], "error", -1
            rec = {"ok": ok, "rows": rows, "sec": round(time.monotonic() - t0, 3), "mode": mode}
            if pandas_ok is not None:
                rec["pandas_ok"] = pandas_ok
            if detail:
                rec["detail"] = detail
            out[name] = rec
            status = "ok " if ok else "FAIL"
            print(f"  {status} {name} ({rec['sec']}s)", flush=True)
    finally:
        con.close()
    return out


def summarize(results: dict) -> dict:
    failed = sorted(n for n, r in results.items() if not r["ok"])
    return {
        "total": len(results),
        "passed": len(results) - len(failed),
        "failed": failed,
        "wall_s": round(sum(r["sec"] for r in results.values()), 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--skip-adversarial",
        action="store_true",
        help="run only the standard pass (skips BOTH the adversarial and "
        "degenerate configs)",
    )
    args = ap.parse_args()

    rnd = args.round if args.round is not None else infer_round()
    out_path = args.out or os.path.join(REPO, f"SWEEP_r{rnd:02d}.json")
    queries, oracles = all_queries(), all_oracles()

    artifact: dict = {"round": rnd, "sf_dir": args.sf_dir, "registry_size": len(queries)}

    def pass_record(spark, results) -> dict:
        """One shape for every pass — ALWAYS records aqe, so the artifact
        witnesses the setting the degenerate pass exists to vary."""
        return {
            "config": {
                "master": spark.sparkContext.master,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            },
            **summarize(results),
            "queries": results,
        }

    from hbase_observer_es_spark import session as _session

    saved_cpus = os.environ.pop("SPARK_GRAFT_CPUS", None)
    saved_aqe = _session.RUNTIME_CONF["spark.sql.adaptive.enabled"]
    try:
        # env cleared above: a stray SPARK_GRAFT_CPUS would silently turn the
        # "standard local[*]" pass into whatever the caller exported
        print(f"standard pass: {len(queries)} queries at {args.sf_dir}", flush=True)
        spark = get_spark("local-sweep")
        # the standard pass carries the driver-parity pandas mode (r15): both
        # comparison paths must agree for a query to count as passed
        artifact["standard"] = pass_record(
            spark, run_pass(spark, args.sf_dir, queries, oracles, pandas_mode=True)
        )

        if not args.skip_adversarial:
            spark.stop()
            os.environ["SPARK_GRAFT_CPUS"] = "4"
            spark = get_spark("local-sweep-adversarial", shuffle_partitions=3)
            print("adversarial pass: local[4], 3 shuffle partitions", flush=True)
            artifact["adversarial"] = pass_record(
                spark, run_pass(spark, args.sf_dir, queries, oracles)
            )

            spark.stop()
            os.environ["SPARK_GRAFT_CPUS"] = "2"
            # io.table re-applies session.RUNTIME_CONF on every load (the
            # driver-session hardening path), which would silently turn AQE
            # back ON — pin the override at the RUNTIME_CONF source so it
            # sticks for the pass.
            _session.RUNTIME_CONF["spark.sql.adaptive.enabled"] = "false"
            spark = get_spark("local-sweep-degenerate", shuffle_partitions=1)
            print("degenerate pass: local[2], 1 shuffle partition, AQE off", flush=True)
            artifact["degenerate"] = pass_record(
                spark, run_pass(spark, args.sf_dir, queries, oracles)
            )
        spark.stop()
    finally:
        # leave NO trace in module-global state: in-process callers (tests,
        # follow-up tooling) must get the normal config back
        _session.RUNTIME_CONF["spark.sql.adaptive.enabled"] = saved_aqe
        if saved_cpus is None:
            os.environ.pop("SPARK_GRAFT_CPUS", None)
        else:
            os.environ["SPARK_GRAFT_CPUS"] = saved_cpus

    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")

    ok = all(
        not artifact[p]["failed"] for p in ("standard", "adversarial", "degenerate") if p in artifact
    )
    for p in ("standard", "adversarial", "degenerate"):
        if p in artifact:
            s = artifact[p]
            print(f"{p}: {s['passed']}/{s['total']} passed, {s['wall_s']}s wall"
                  + (f", FAILED: {s['failed']}" if s["failed"] else ""))
    print(f"wrote {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
