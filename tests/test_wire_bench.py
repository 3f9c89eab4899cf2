"""tools/wire_bench.py smoke: the wire-to-wire measurement must keep running
as the parsers/sinks evolve — one tiny-SF invocation, JSON-shape checked."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_wire_bench_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "wire_bench.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["metric"] == "wire_to_wire_mutations_per_sec"
    assert d["n_mutations"] > 0 and d["value"] > 0 and d["n_bulk_bodies"] >= 1
