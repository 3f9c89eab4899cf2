#!/usr/bin/env python
"""Record every batch query's physical-plan facts as a committed artifact.

tests/test_plans.py pins the scale posture of SELECTED queries; this tool
inventories it for ALL of them — per query: exchange count, broadcast vs
sort-merge joins, TakeOrdered, whole-stage codegen, Python eval nodes, RDD
scans, and every parquet scan's projected columns + pushed/partition filters.
``PLAN_AUDIT.json`` makes the registry-wide posture diffable round-over-round:
a query whose exchange count or scan width silently grows shows up as an
artifact diff, not as a 10x wall-clock surprise three rounds later.

Streaming queries (s_*) execute on call rather than returning a plannable
frame — they are listed under "streaming_skipped" (their state/shuffle
posture is pinned by their own tests).

Usage::

    python tools/plan_audit.py                 # writes PLAN_AUDIT.json at sf0.01
    python tools/plan_audit.py --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_observer_es_spark.plans.inspect import plan_facts  # noqa: E402
from hbase_observer_es_spark.registry import all_queries  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "PLAN_AUDIT.json"))
    args = ap.parse_args()

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    audit: dict[str, dict] = {}
    skipped: list[str] = []
    errors: dict[str, str] = {}
    for name in sorted(queries):
        if name.startswith("s_"):
            skipped.append(name)
            continue
        try:
            f = plan_facts(queries[name](spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001 - artifact records the failure
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        audit[name] = dataclasses.asdict(f)
    spark.stop()

    summary = {
        "queries": len(audit),
        "streaming_skipped": sorted(skipped),
        "errors": errors,
        "totals": {
            "exchanges": sum(a["exchanges"] for a in audit.values()),
            "broadcast_joins": sum(a["broadcast_joins"] for a in audit.values()),
            "sortmerge_joins": sum(a["sortmerge_joins"] for a in audit.values()),
            "python_eval": sum(1 for a in audit.values() if a["python_eval"]),
            "rdd_scan": sum(1 for a in audit.values() if a["rdd_scan"]),
            "take_ordered": sum(1 for a in audit.values() if a["take_ordered"]),
        },
    }
    with open(args.out, "w") as fh:
        json.dump({"sf_dir": args.sf_dir, "summary": summary, "plans": audit}, fh,
                  indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(summary["totals"]))
    print(f"wrote {args.out} ({len(audit)} plans, {len(skipped)} streaming skipped,"
          f" {len(errors)} errors)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
