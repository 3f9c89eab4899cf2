#!/usr/bin/env python
"""Record every batch query's physical-plan facts as a committed artifact.

tests/test_plans.py pins the scale posture of SELECTED queries; this tool
inventories it for ALL of them — per query: exchange count, broadcast vs
sort-merge joins, TakeOrdered, whole-stage codegen, Python eval nodes, RDD
scans, and every parquet scan's projected columns + pushed/partition filters.
``PLAN_AUDIT.json`` makes the registry-wide posture diffable round-over-round:
a query whose exchange count or scan width silently grows shows up as an
artifact diff, not as a 10x wall-clock surprise three rounds later.

Streaming queries (s_*) are audited too (round 9): true streams execute on
call, then their final micro-batch's EXECUTED plan is captured via
``query.lastExecution`` (the ``stateful.LAST_PLANS`` hook) and parsed into
StreamingPlanFacts — state-store operators, watermark nodes, exchanges;
batch-expressed streaming shapes (windows.py) go through the normal
``plan_facts`` path on their returned frame. ``summary.streaming_skipped``
stays for compatibility and must be empty.

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

from hbase_observer_es_spark.plans.inspect import (  # noqa: E402
    plan_facts,
    streaming_plan_facts,
)
from hbase_observer_es_spark.registry import all_queries  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402
from hbase_observer_es_spark.streaming import stateful  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "PLAN_AUDIT.json"))
    args = ap.parse_args()

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    audit: dict[str, dict] = {}
    streaming: dict[str, dict] = {}
    skipped: list[str] = []
    errors: dict[str, str] = {}
    for name in sorted(queries):
        if name.startswith("s_"):
            # true streams execute on call and leave their last micro-batch
            # executed plan in LAST_PLANS; batch-expressed streaming shapes
            # (windows.py) return a plannable frame like any batch query
            stateful.LAST_PLANS = {}
            try:
                df = queries[name](spark, args.sf_dir)
                if name in stateful.LAST_PLANS:
                    captured = stateful.LAST_PLANS[name]
                    # the capture hook stores a sentinel instead of raising so
                    # the QUERY never fails; the AUDIT must not mistake that
                    # sentinel for a plausible all-zero plan
                    if captured.startswith("<capture failed"):
                        errors[name] = captured[:200]
                        continue
                    f = streaming_plan_facts(captured)
                    streaming[name] = {"mode": "true-stream", **dataclasses.asdict(f)}
                else:
                    streaming[name] = {
                        "mode": "batch-expressed",
                        **dataclasses.asdict(plan_facts(df)),
                    }
            except Exception as e:  # noqa: BLE001 - artifact records the failure
                errors[name] = f"{type(e).__name__}: {e}"[:200]
            finally:
                stateful.LAST_PLANS = None
            continue
        try:
            f = plan_facts(queries[name](spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001 - artifact records the failure
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        audit[name] = dataclasses.asdict(f)
    spark.stop()

    summary = {
        "queries": len(audit) + len(streaming),
        "streaming_queries": len(streaming),
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
        "streaming_totals": {
            "true_stream": sum(
                1 for a in streaming.values() if a["mode"] == "true-stream"
            ),
            "batch_expressed": sum(
                1 for a in streaming.values() if a["mode"] == "batch-expressed"
            ),
            "state_store_saves": sum(
                a.get("state_store_saves", 0) for a in streaming.values()
            ),
            "stream_stream_joins": sum(
                a.get("stream_stream_joins", 0) for a in streaming.values()
            ),
            "exchanges": sum(a.get("exchanges", 0) for a in streaming.values()),
        },
    }
    with open(args.out, "w") as fh:
        json.dump(
            {
                "sf_dir": args.sf_dir,
                "summary": summary,
                "plans": audit,
                "streaming_plans": streaming,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(json.dumps(summary["totals"]))
    print(json.dumps(summary["streaming_totals"]))
    print(f"wrote {args.out} ({len(audit)} batch plans, {len(streaming)} streaming"
          f" plans, {len(errors)} errors)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
