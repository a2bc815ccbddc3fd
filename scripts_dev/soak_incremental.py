"""Incremental-maintenance scale soak: grow the star-graph corpus N x
(replicated customers with shifted keys) and compare the cost of
maintaining the graph incrementally (add_datasource of a small fusing
source) against a from-scratch rebuild over the union.

The scale claim under test (incremental.py module docstring): the add
path's re-group / re-merge / index / materialise stages are DELTA-scoped,
so its cost is bounded by one corpus scan (reference invalidation + the
born-edge semi-join legs, both map-side against broadcast delta ids)
plus delta-sized shuffles - while the rebuild pays corpus-sized CC,
merge shuffle, index aggregation, and the materialise join every time.

Usage: python scripts_dev/soak_incremental.py [N ...]   (default: 1 8 64)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from grebi_spark.incremental import add_datasource, build_graph_stateful  # noqa: E402
from grebi_spark.pipeline import build_graph  # noqa: E402
from grebi_spark.plans.parity import (  # noqa: E402
    INC_CONFIG,
    _star_graph_long,
    _zone_source,
)
from grebi_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"


def _force(graph) -> tuple[int, int]:
    """Materialise EVERY table a build persists — merged, edges, node
    headers, the index side tables, display types, the edge summary —
    on both sides: the rebuild baseline must pay the same stages the
    incremental path maintains, or the comparison flatters it."""
    counts = (
        graph.merged.count(),
        graph.edges.count(),
        graph.nodes.count(),
        graph.index.prop_counts.count(),
        graph.index.type_counts.count(),
        graph.index.names.count(),
        graph.index.ids.count(),
        graph.display_types.count(),
        graph.edge_summary.count(),
    )
    return counts[0], counts[1]


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1, 8, 64]
    spark = get_spark("soak_inc", shuffle_partitions=32)
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
        sources = [customers, nations, regions]
        zones = _zone_source(spark, BASE).localCheckpoint()

        t0 = time.time()
        state = build_graph_stateful(sources, INC_CONFIG)
        base_counts = _force(state.graph)
        t_build = time.time() - t0

        t0 = time.time()
        s2 = add_datasource(state, zones)
        inc_counts = _force(s2.graph)
        t_add = time.time() - t0

        t0 = time.time()
        scratch = build_graph(sources + [zones], INC_CONFIG)
        scratch_counts = _force(scratch)
        t_rebuild = time.time() - t0

        match = inc_counts == scratch_counts
        print(
            f"SOAK-INC {n}x: corpus={base_counts[0]} merged rows | "
            f"build {t_build:.1f}s | incremental add {t_add:.1f}s | "
            f"from-scratch rebuild {t_rebuild:.1f}s | "
            f"counts match={match} ({inc_counts} vs {scratch_counts})",
            flush=True,
        )

        # the other two verbs, chained on the maintained state: remove
        # must return exactly to the pre-add table counts; update (half
        # the zones) must land between the two. Same delta-cost claim.
        from grebi_spark.incremental import remove_datasource, update_datasource

        zones_half = _zone_source(spark, BASE, even_only=True).localCheckpoint()
        t0 = time.time()
        s3 = remove_datasource(s2, "map")
        rm_counts = _force(s3.graph)
        t_rm = time.time() - t0
        t0 = time.time()
        s4 = update_datasource(s2, "map", zones_half)
        up_counts = _force(s4.graph)
        t_up = time.time() - t0
        print(
            f"SOAK-INC {n}x verbs: remove {t_rm:.1f}s "
            f"(counts back to base={rm_counts == base_counts}) | "
            f"update(half) {t_up:.1f}s (merged {up_counts[0]}, "
            f"edges {up_counts[1]})",
            flush=True,
        )

        # serving tier: refresh the executed sqlite KV with the add
        # verb's delta vs rebuilding the store from the grown state
        import tempfile

        from grebi_spark.sinks.kv import build_kv_store, refresh_kv_store

        kvdir = tempfile.mkdtemp(prefix=f"soak_kv_{n}x_")
        t0 = time.time()
        n_rows = build_kv_store(
            state.graph.merged, state.graph.nodes, f"{kvdir}/base.sqlite",
            edges=state.graph.edges,
        )
        t_kv_build = time.time() - t0
        t0 = time.time()
        ref_counts = refresh_kv_store(s2, f"{kvdir}/base.sqlite")
        t_kv_refresh = time.time() - t0
        t0 = time.time()
        build_kv_store(
            s2.graph.merged, s2.graph.nodes, f"{kvdir}/rebuild.sqlite",
            edges=s2.graph.edges,
        )
        t_kv_rebuild = time.time() - t0
        print(
            f"SOAK-INC {n}x serving: base KV build {t_kv_build:.1f}s "
            f"({n_rows} rows) | delta refresh {t_kv_refresh:.1f}s "
            f"(upserts {ref_counts['nodes']}, dels "
            f"{ref_counts['deleted_nodes']}) | "
            f"full KV rebuild {t_kv_rebuild:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
