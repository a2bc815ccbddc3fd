"""Long-run CONTINUOUS maintenance soak: N sequential folds on ONE
growing state, with the serving tier (sqlite KV + solr segment core)
delta-refreshed after every fold and the LSM compactions
(compact_state / compact_solr_core) exercised mid-run.

The claim under test: per-batch cost stays DELTA-BOUNDED (flat) as the
maintained state grows — the verb soaks replay one delta at three corpus
scales; this replays ~50 deltas on one state, which is what an always-on
deployment actually does. Prints one table row per batch
(fold / kv / solr seconds) for PERFORMANCE.md.

Usage: python scripts_dev/soak_continuous.py [N_BATCHES] [COMPACT_EVERY]
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
    compact_state,
    load_state_current,
    rollback_state,
    save_state_version,
)
from grebi_spark.plans.parity import INC_CONFIG, _star_graph_long  # noqa: E402
from grebi_spark.session import get_spark  # noqa: E402
from grebi_spark.sinks.kv import build_kv_store, refresh_kv_store  # noqa: E402
from grebi_spark.sinks.solr_jsonl import (  # noqa: E402
    build_solr_core,
    compact_solr_core,
    refresh_solr_core,
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENTITIES_PER_BATCH = 50


def batch_source(spark, i: int):
    """One small dump: 50 new entities in datasource batch<i>, each
    referencing an existing nation (born edges on every fold)."""
    b = spark.range(ENTITIES_PER_BATCH).select(
        F.lit("star").alias("subgraph"),
        F.lit(f"batch{i:03d}").alias("datasource"),
        F.concat(F.lit(f"b{i:03d}:x"), F.col("id").cast("string")).alias(
            "entity_id"
        ),
    )
    rows = None
    for key, val in (
        ("id", F.col("entity_id")),
        ("grebi:type", F.lit("soak:Widget")),
        ("grebi:name", F.concat(F.lit("widget "), F.col("entity_id"))),
        (
            "soak:nation",
            F.concat(F.lit("n:"), (F.crc32(F.col("entity_id")) % 25).cast("string")),
        ),
    ):
        part = b.select(
            "subgraph",
            "datasource",
            "entity_id",
            F.lit(key).alias("prop_key"),
            val.alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        )
        rows = part if rows is None else rows.unionAll(part)
    return rows


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("soak_continuous", shuffle_partitions=32)

    customers, nations, regions = _star_graph_long(spark, BASE)
    state = build_graph_stateful([customers, nations, regions], INC_CONFIG)
    base_nodes = state.graph.nodes.count()

    work = tempfile.mkdtemp(prefix="grebi_soak_cont_")
    db = f"{work}/store.sqlite"
    core = f"{work}/core"
    t0 = time.time()
    build_kv_store(
        state.graph.merged, state.graph.nodes, db, shards=4,
        edges=state.graph.edges,
    )
    build_solr_core(state.graph.merged, state.graph.nodes, state.graph.edges, core)
    print(
        f"base: {base_nodes} nodes; serving tier built in {time.time()-t0:.1f}s",
        flush=True,
    )
    print("batch | fold_s | kv_s | solr_s | note", flush=True)

    for i in range(1, n_batches + 1):
        t = time.time()
        state = add_datasource(state, batch_source(spark, i))
        state.graph.merged.count()  # force the fold
        fold_s = time.time() - t

        t = time.time()
        refresh_kv_store(state, db, shards=4)
        kv_s = time.time() - t

        t = time.time()
        refresh_solr_core(spark, state, core)
        solr_s = time.time() - t

        note = ""
        if i % compact_every == 0:
            t = time.time()
            state = compact_state(state)
            merged = compact_solr_core(spark, core)
            note = f"compacted state + {merged} solr segs in {time.time()-t:.1f}s"
            # durable checkpoint cadence: one versioned snapshot per
            # compaction window — a MANIFEST save: the window's pending
            # FrameLevels (delta-sized) + a manifest sharing everything
            # else with the previous version; rollback to it is O(1)
            t = time.time()
            vname = save_state_version(state, f"{work}/snapshots")
            note += f"; snapshot {vname} in {time.time()-t:.1f}s"
        print(
            f"{i:5d} | {fold_s:6.2f} | {kv_s:4.2f} | {solr_s:6.2f} | {note}",
            flush=True,
        )

    # value sanity: every batch's entities are present exactly once
    import sqlite3

    final_nodes = state.graph.nodes.count()
    expect = base_nodes + n_batches * ENTITIES_PER_BATCH
    con = sqlite3.connect(db)
    kv_n = con.execute("SELECT count(*) FROM kv").fetchone()[0]
    con.close()
    from grebi_spark.sinks.solr_jsonl import read_solr_core

    core_n = read_solr_core(spark, core, "nodes").count()
    print(
        f"FINAL nodes={final_nodes} (expect {expect}) kv={kv_n} core={core_n}",
        flush=True,
    )
    assert final_nodes == expect == kv_n == core_n

    # operational undo across the whole run: roll the snapshot root back
    # one version (O(1) pointer swap) and verify the restored state is
    # exactly the previous compaction window's graph
    if n_batches >= 2 * compact_every:
        t = time.time()
        vname = rollback_state(spark, f"{work}/snapshots")
        swap_s = time.time() - t
        restored = load_state_current(spark, f"{work}/snapshots")
        prev_window = (n_batches // compact_every - 1) * compact_every
        expect_prev = base_nodes + prev_window * ENTITIES_PER_BATCH
        got = restored.graph.nodes.count()
        print(
            f"ROLLBACK to {vname}: pointer swap {swap_s*1000:.0f} ms; "
            f"restored nodes={got} (expect {expect_prev})",
            flush=True,
        )
        assert got == expect_prev
    spark.stop()


if __name__ == "__main__":
    main()
