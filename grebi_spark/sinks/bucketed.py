"""Bucketed graph store: the co-located-join layout for 100 TB serving.

The reference keeps its merged graph as SORTED files so downstream
stages (materialise's existence probe, the Neo4j/Solr/Rocks exports) can
k-way-merge without re-sorting (02_assign_ids sorts, 03_merge merges
sorted runs). Spark's equivalent of "keep the big table pre-organised by
its join key" is BUCKETING: ``bucketBy(node_id)`` + ``sortBy`` at write
time puts every node_id deterministically in one bucket file, and any
join or aggregation keyed on node_id then reads co-located buckets with
NO shuffle on either pre-bucketed side — at 100 TB this deletes the
dominant exchange from every node-keyed query (edge hydration, property
lookups, `_refs` denormalisation, the KV build).

``tests/test_bucketed.py`` locks the contract: a nodes⋈edges join over
the bucketed tables must plan zero ``Exchange hashpartitioning`` on the
bucketed sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS_DEFAULT = 16  # tests; a 100 TB graph would use O(10k) buckets


def write_bucketed_graph(
    nodes: DataFrame,
    edges: DataFrame,
    database: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> None:
    """Persist the built graph as bucketed+sorted managed tables.

    nodes bucketed by node_id; edges bucketed by from_id (the hydration
    key — an edge page or edge hydration joins edges.from_id = nodes.
    node_id). Both sorted within buckets so merge-join needs no sort
    either. The bucket count must match between tables for a
    shuffle-free join (Spark requires compatible bucketing)."""
    spark = nodes.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    (
        nodes.write.format("parquet")
        .bucketBy(n_buckets, "node_id")
        .sortBy("node_id")
        .mode("overwrite")
        .saveAsTable(f"{database}.graph_nodes_bucketed")
    )
    (
        edges.write.format("parquet")
        .bucketBy(n_buckets, "from_id")
        .sortBy("from_id")
        .mode("overwrite")
        .saveAsTable(f"{database}.graph_edges_bucketed")
    )


def bucketed_edge_hydration(spark: SparkSession, database: str) -> DataFrame:
    """Hydrate every edge with its source node's metadata — the J6
    `_refs` shape — reading the bucketed tables: both sides scan their
    co-located buckets, so the join plans with no exchange."""
    nodes = spark.table(f"{database}.graph_nodes_bucketed")
    edges = spark.table(f"{database}.graph_edges_bucketed")
    return edges.join(
        nodes, edges["from_id"] == nodes["node_id"], "inner"
    ).select(edges["from_id"], edges["edge_type"], edges["to_id"], nodes["types"])
