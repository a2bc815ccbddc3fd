"""Dev helper: wall-clock phase breakdowns for the multi-phase queries
(streaming drains, probe streams, version snapshots) by monkey-patching
timers around their internal building blocks. Measurement only — never
imported by the engine or the tests.

Usage: python scripts_dev/profile_phases.py <query> [--sf DIR] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from grebi_spark.session import get_spark  # noqa: E402


class _Timer:
    def __init__(self) -> None:
        self.spans: list[tuple[str, float]] = []

    def wrap(self, mod, name: str) -> None:
        fn = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            self.spans.append((name, time.perf_counter() - t0))
            return out

        setattr(mod, name, timed)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]

    spark = get_spark(app_name="profile_phases")
    queries = entry_mod.queries()
    queries["stats_counts"](spark, sf_dir).collect()

    from grebi_spark.streaming import ops as sops

    t = _Timer()
    for name in (
        "_run_to_memory_sink",
        "_session_stage",
        "_outer_stage",
        "_late_stage",
        "_events_stream",
    ):
        if hasattr(sops, name):
            t.wrap(sops, name)
    from grebi_spark.functions import dedup as ddp

    for name in ("_band_table", "_probe_index_root"):
        if hasattr(ddp, name):
            t.wrap(ddp, name)

    for qname in args:
        for r in range(reps):
            spark.catalog.clearCache()
            t.spans.clear()
            t0 = time.perf_counter()
            queries[qname](spark, sf_dir).collect()
            total = time.perf_counter() - t0
            spans = ", ".join(f"{n}={dt:.2f}" for n, dt in t.spans)
            print(f"{qname} rep{r}: total={total:.2f}s [{spans}]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
