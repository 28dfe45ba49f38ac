#!/usr/bin/env python
"""Alternating same-session A/B of the DEFAULT_SUITE bench between two
repo checkouts (CLAUDE.md measurement protocol: only alternating
same-window arms are trustworthy at fixed-cost-dominated sizes).

Usage: python tools/ab_suite.py OLD_DIR NEW_DIR [ROUNDS] [DOCS]

Each arm is one `bench.py --suite-only` subprocess (no page-cache drop —
this is a code-vs-code comparison, not the scaling protocol), emitting a
primary median run + 2 warm reruns. Arms alternate old,new,old,new so
host drift lands on both sides.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_arm(repo: str, docs: int, master: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_NO_CACHE_DROP"] = "1"
    env["SPARK_GRAFT_BENCH_DOCS"] = str(docs)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--suite-only", "--master", master],
        capture_output=True,
        text=True,
        check=True,
        cwd=repo,
        env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    old_dir, new_dir = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    docs = int(sys.argv[4]) if len(sys.argv) > 4 else 4_000_000
    master = os.environ.get("AB_MASTER", "local[32]")
    results: dict[str, list[dict]] = {"old": [], "new": []}
    for r in range(rounds):
        for name, repo in (("old", old_dir), ("new", new_dir)):
            res = run_arm(repo, docs, master)
            results[name].append(res)
            print(
                json.dumps(
                    {
                        "round": r,
                        "arm": name,
                        "suite_sec": res["suite_sec"],
                        "docs_per_sec": res["docs_per_sec"],
                        "warm_runs_sec": res.get("suite_runs_warm_sec"),
                    }
                ),
                flush=True,
            )
    summary = {
        arm: {
            "primary_sec": [r["suite_sec"] for r in runs],
            "warm_sec": [t for r in runs for t in r.get("suite_runs_warm_sec", [])],
        }
        for arm, runs in results.items()
    }
    print(json.dumps({"summary": summary, "docs": docs, "master": master}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
