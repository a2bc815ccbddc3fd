"""Snapshot-cost scale soak: the manifest claim under test is that
``save_state_version`` after a fold costs ∝ the fold's DELTA, not the
corpus (incremental.py — the round-6 verdict's one surviving
scale-killer was the previous full-corpus rewrite per snapshot).

Grow the star-graph corpus N× (replicated customers with shifted keys),
snapshot the built state (v1 — the full base, expected to grow with N),
apply ONE fixed-size fold (add_datasource of the zones source — the
same delta at every N), snapshot again (v2 — the delta manifest,
expected FLAT as N grows), and report wall time + bytes written per
version. A final load of v2 value-checks the delta manifest.

Usage: python scripts_dev/soak_snapshots.py [N ...]   (default: 1 8 64)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from grebi_spark.incremental import (  # noqa: E402
    add_datasource,
    build_graph_stateful,
    load_state_version,
    save_state_version,
)
from grebi_spark.plans.parity import (  # noqa: E402
    INC_CONFIG,
    _star_graph_long,
    _zone_source,
)
from grebi_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"


def _bytes_for_version(root: str, vname: str) -> int:
    """Bytes of data files the given version ADDED to the pool (its
    delta artifacts carry the version name in their directory name)."""
    total = 0
    data = os.path.join(root, "data")
    for frame in os.listdir(data):
        for seg in os.listdir(os.path.join(data, frame)):
            if f"-{vname}-" in seg:
                d = os.path.join(data, frame, seg)
                total += sum(
                    os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
                )
    return total


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1, 8, 64]
    spark = get_spark("soak_snap", shuffle_partitions=32)
    for n in ns:
        customers, nations, regions = _star_graph_long(spark, BASE)
        if n > 1:
            reps = [customers] + [
                customers.withColumn(
                    "entity_id",
                    F.concat(F.lit(f"c{i}_"), F.col("entity_id")),
                ).withColumn(
                    "value",
                    F.when(
                        F.col("prop_key").isin("id"),
                        F.concat(F.lit(f"c{i}_"), F.col("value")),
                    ).otherwise(F.col("value")),
                )
                for i in range(1, n)
            ]
            customers = reps[0]
            for p in reps[1:]:
                customers = customers.unionByName(p)
        customers = customers.localCheckpoint()
        zones = _zone_source(spark, BASE).localCheckpoint()

        state = build_graph_stateful([customers, nations, regions], INC_CONFIG)
        n_merged = state.graph.merged.count()
        root = tempfile.mkdtemp(prefix=f"soak_snap_{n}x_")

        t0 = time.time()
        v1 = save_state_version(state, root)
        t_full = time.time() - t0
        b_full = _bytes_for_version(root, v1)

        s2 = add_datasource(state, zones)
        t0 = time.time()
        v2 = save_state_version(s2, root)
        t_delta = time.time() - t0
        b_delta = _bytes_for_version(root, v2)

        reloaded = load_state_version(spark, root, v2)
        ok = reloaded.graph.merged.count() == s2.graph.merged.count()
        print(
            f"SOAK-SNAP {n}x: corpus={n_merged} merged rows | "
            f"full save {t_full:.1f}s / {b_full/1e6:.1f} MB | "
            f"delta save {t_delta:.1f}s / {b_delta/1e6:.1f} MB | "
            f"delta/full bytes = {b_delta/max(b_full,1):.3f} | "
            f"reload value-check={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
