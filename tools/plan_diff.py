#!/usr/bin/env python
"""Diff PLAN_AUDIT.json against a prior round: mechanized posture regression
detection.

``PLAN_AUDIT.json`` exists so the registry-wide physical-plan posture is
diffable round-over-round; this tool performs that diff the way
``tools/bench_adjudicate.py`` does for wall-clock — so a silent plan
regression (an extra exchange, a Python eval appearing in a hot path, a scan
that stopped pruning columns) surfaces as a classified artifact instead of a
by-hand JSON comparison.

Classification per changed fact:

* REGRESSION-class (exit 1): ``exchanges`` increased, ``python_eval`` newly
  true, ``rdd_scan`` newly true, a broadcast join degraded to sort-merge
  (broadcast down AND sortmerge up), any scan's projected column count grew,
  or a streaming query's ``state_store_saves``/``stream_stream_joins``
  changed at all (state topology is checkpoint-breaking).
* NEUTRAL: everything else (fewer exchanges, narrower scans, TakeOrdered
  appearing, pushed-filter string wording) — reported, never fatal.

New/removed queries are listed, not judged (coverage is the harness guard
test's job).

Usage::

    python tools/plan_diff.py                 # vs last driver round boundary
    python tools/plan_diff.py --ref <sha>
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# one boundary-detection implementation for all round-over-round differs
from bench_adjudicate import _git, last_round_boundary  # noqa: E402


def _scan_widths(entry: dict) -> list[int]:
    return sorted(len(s.get("columns", [])) for s in entry.get("scans", []))


def diff_plans(base: dict, cur: dict) -> dict:
    """Pure diff over two PLAN_AUDIT documents (unit-testable)."""
    old = {**base.get("plans", {}), **base.get("streaming_plans", {})}
    new = {**cur.get("plans", {}), **cur.get("streaming_plans", {})}
    changed: dict[str, dict] = {}
    regressions: list[str] = []
    for name in sorted(old.keys() & new.keys()):
        o, n = old[name], new[name]
        facts: dict[str, list] = {}
        for key in sorted(set(o) | set(n)):
            if key == "scans":
                ow, nw = _scan_widths(o), _scan_widths(n)
                if ow != nw:
                    facts["scan_columns"] = [ow, nw]
                continue
            if o.get(key) != n.get(key):
                facts[key] = [o.get(key), n.get(key)]
        if not facts:
            continue
        bad = []
        if "exchanges" in facts and (facts["exchanges"][1] or 0) > (facts["exchanges"][0] or 0):
            bad.append("exchanges_up")
        if facts.get("python_eval") == [False, True]:
            bad.append("python_eval_appeared")
        if facts.get("rdd_scan") == [False, True]:
            bad.append("rdd_scan_appeared")
        if (
            "broadcast_joins" in facts
            and "sortmerge_joins" in facts
            and facts["broadcast_joins"][1] < facts["broadcast_joins"][0]
            and facts["sortmerge_joins"][1] > facts["sortmerge_joins"][0]
        ):
            bad.append("broadcast_degraded_to_sortmerge")
        if "scan_columns" in facts and sum(facts["scan_columns"][1]) > sum(
            facts["scan_columns"][0]
        ):
            bad.append("scan_width_grew")
        for key in ("state_store_saves", "stream_stream_joins"):
            if key in facts:
                bad.append(f"{key}_changed")
        changed[name] = {"facts": facts, "regression": bad}
        if bad:
            regressions.append(name)
    return {
        "compared": len(old.keys() & new.keys()),
        "added": sorted(new.keys() - old.keys()),
        "removed": sorted(old.keys() - new.keys()),
        "changed": changed,
        "regressions": sorted(regressions),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=None, help="git ref of the baseline PLAN_AUDIT")
    args = ap.parse_args()
    ref = args.ref or last_round_boundary()

    with open(os.path.join(REPO, "PLAN_AUDIT.json")) as f:
        cur = json.load(f)
    try:
        base = json.loads(_git("show", f"{ref}:PLAN_AUDIT.json"))
    except subprocess.CalledProcessError:
        raise SystemExit(f"no PLAN_AUDIT.json at {ref}")

    out = {"baseline_ref": ref, **diff_plans(base, cur)}
    print(json.dumps(out, indent=1, sort_keys=True))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
