#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (guide §1).

NOT the driver contract — bench.py is frozen for measurement. This file
times individual queries with the noop sink at any SF dir, prints one JSON
line, and can dump .explain("formatted") plans for the plan-diff record.

Usage:
  python bench_extra.py q1 q2 ...            # time listed queries (median of reps)
  python bench_extra.py --reps 3 q1 q2
  python bench_extra.py --sf /root/testdata/sf1.0 q1
  python bench_extra.py --explain-dir plans/r06 --suffix before q1 q2
  python bench_extra.py --all                # every HEADLINE query
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]

    def opt(name: str, default=None):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    reps = int(opt("--reps", "3"))
    explain_dir = opt("--explain-dir")
    suffix = opt("--suffix", "plan")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from sat_val_framework_spark.session import get_spark

    qs = entrymod.queries()
    if "--all" in args:
        args.remove("--all")
        import bench as benchmod

        names = list(benchmod.HEADLINE)
    else:
        names = [a for a in args if not a.startswith("-")]

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    # warm JVM/JIT/parquet reader (same protocol as bench.py)
    qs["stats_per_source"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(statistics.median(times), 3)
        spread[name] = round(max(times) - min(times), 3)
        print(f"#  {name}: {out[name]}s  (spread {spread[name]}, runs {[round(t,2) for t in times]})", file=sys.stderr)
    print(json.dumps({"sf": sf_dir, "reps": reps, "queries": out, "spread": spread,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
