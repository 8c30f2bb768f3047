#!/usr/bin/env python
"""Per-query build/force split profiler (r13 measurement aid).

For each named query (argv, default: all), times
  build  = registry.QUERIES[name](spark, sf_dir)   (driver-side work:
           plan construction + any jobs the build itself runs —
           localCheckpoint, guard aggs, driver fits, edge collects)
  force  = noop write of the built frame (the distributed execution)
over SPARK_GRAFT_BENCH_REPS reps (default 3), reporting min of each.
The bench's timed number is build+force; this splits it so fixes
target the right half. Caches are cleared per rep like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bbdc20_submission_spark import registry
from bbdc20_submission_spark.session import get_spark

registry.load_all()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:] or sorted(registry.QUERIES)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("profile")

    from bbdc20_submission_spark.sources.harness import HARNESS_TABLES, load_table

    spark.sparkContext.setJobDescription("warmup")
    registry.QUERIES["w6_sessionize_rle"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    for t in HARNESS_TABLES:
        load_table(spark, t, sf_dir).count()

    out = {}
    for name in names:
        builds, forces = [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}: build")
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: force")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            forces.append(t2 - t1)
        out[name] = {
            "build_min": round(min(builds), 3),
            "force_min": round(min(forces), 3),
            "total_min": round(min(b + f for b, f in zip(builds, forces)), 3),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
