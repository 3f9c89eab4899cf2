#!/usr/bin/env python
"""Dump `explain("formatted")` for registered queries to per-query text files.

Optimization-round evidence: `plans/r{N}/<query>_before.txt` / `_after.txt`
hold the formatted physical plan of every query the round touches, so plan
claims in OPTIMIZATION_r{N}.md are checkable without running Spark.

Batch queries capture `df.explain("formatted")` (the pre-execution AQE plan —
the same thing a reader of the code reasons about). True streaming queries
(s_* in streaming/stateful.py) execute and capture their final micro-batch's
EXECUTED plan via the stateful.LAST_PLANS hook, like tools/plan_audit.py.

Usage::

    python tools/dump_plans.py --suffix before                # all queries
    python tools/dump_plans.py --suffix after -q q_sim_lsh    # selected
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_observer_es_spark.registry import all_queries  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402
from hbase_observer_es_spark.streaming import stateful  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--round", type=int, default=16)
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    args = ap.parse_args()

    out_dir = os.path.join(REPO, "plans", f"r{args.round}")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = args.queries or sorted(queries)

    stateful.LAST_PLANS = {}
    n_ok = 0
    failed: list[str] = []
    for name in names:
        fn = queries[name]
        try:
            if name.startswith("s_") and name not in (
                "s_win_tumbling", "s_win_sliding", "s_win_session",
            ):
                # true stream: executing it populates LAST_PLANS
                fn(spark, args.sf_dir)
                text = stateful.LAST_PLANS.get(name, "<no plan captured>")
            else:
                df = fn(spark, args.sf_dir)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                text = buf.getvalue()
            n_ok += 1
        except Exception as exc:  # noqa: BLE001 - record the failure, keep going
            text = f"<plan capture failed: {type(exc).__name__}: {exc}>"
            failed.append(name)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
    stateful.LAST_PLANS = None
    # r17 (ADVICE): failures are counted apart and fail the exit code — a
    # silently-broken query must not look like full plan coverage
    print(f"wrote {n_ok} plans to {out_dir}"
          + (f", {len(failed)} FAILED: {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
