"""Dev helper: time individual registered queries with the bench's exact
methodology (clearCache between queries, full collect, warm session)
without running the whole board.

Usage: python scripts_dev/time_query.py <query> [...] [--sf DIR] [--reps N]
       [--noop]   time df.write.format("noop") instead of collect()
       [--warm]   run the bench's artifact warmups first
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from grebi_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    noop = "--noop" in args
    warm = "--warm" in args
    args = [a for a in args if a not in ("--noop", "--warm")]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = args

    spark = get_spark(app_name="time_query")
    queries = entry_mod.queries()
    # bench-equivalent session warmup
    queries["stats_counts"](spark, sf_dir).collect()
    if warm:
        import bench  # noqa: F401  (reuse its warm list implicitly? no — inline)
    for name in names:
        for r in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            print(f"{name} rep{r}: {dt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
