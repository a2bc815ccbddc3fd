"""Dump `.explain("formatted")` for registered queries to plans/<tag>/.

Usage: python scripts_dev/dump_plans.py <tag> [query ...] [--sf DIR] [--suffix before|after]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: all).
Plan capture runs at sf0.001 by default — plan SHAPE (Exchange count,
join strategy, pushdown) is what the files evidence; timings live in
the bench records.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from grebi_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    suffix = "before"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2:]
    tag = args[0]
    names = args[1:]
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump_plans", shuffle_partitions=8)
    queries = entry_mod.queries()
    if not names:
        names = sorted(queries)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
