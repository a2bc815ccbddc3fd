"""K6 — the id→object resolution table (RocksDB replacement).

Reference: 07_create_db/rocksdb/grebi_make_rocks/src/main.rs:32-78 — key =
nodeId/edgeId, value = the whole JSON line; bulk-loaded then compacted.

Spark design: a parquet table sorted+bucketed by id. Point lookups at
serve time either (a) hit this table with a pushed-down id predicate
(parquet min/max pruning on the sorted key makes it a near-point read),
or (b) bulk-load it into any external KV store. ``resolve`` implements
the resolver-service semantics (multiGet incl. alias resolution) as one
broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merged_to_wide


def kv_node_table(merged: DataFrame) -> DataFrame:
    """(id, json) — one row per node, value = full merged-node JSON."""
    wide = merged_to_wide(merged)
    return wide.select(
        F.col("node_id").alias("id"),
        F.to_json(F.struct("node_id", "subgraph", "properties")).alias("json"),
    )


def kv_alias_table(node_meta: DataFrame) -> DataFrame:
    """(alias, node_id) — every sourceId resolves to its merged node
    (the Id-node star in Neo4j / resolver-service lookup, Q5)."""
    return node_meta.select(
        F.explode("source_ids").alias("alias"), "node_id"
    ).distinct()


def write_kv(merged: DataFrame, node_meta: DataFrame, out_dir: str, buckets: int = 64) -> None:
    """Persist sorted-by-key for pruning-friendly point reads."""
    kv_node_table(merged).repartitionByRange(buckets, "id").sortWithinPartitions(
        "id"
    ).write.mode("overwrite").parquet(f"{out_dir}/nodes_kv")
    kv_alias_table(node_meta).repartitionByRange(buckets, "alias").sortWithinPartitions(
        "alias"
    ).write.mode("overwrite").parquet(f"{out_dir}/alias_kv")


def resolve(
    spark: SparkSession, ids: list[str], kv_dir: str
) -> DataFrame:
    """multiGet with alias resolution: ids may be any source id."""
    probe = spark.createDataFrame([(i,) for i in ids], ["alias"])
    alias_kv = spark.read.parquet(f"{kv_dir}/alias_kv")
    nodes_kv = spark.read.parquet(f"{kv_dir}/nodes_kv")
    resolved = alias_kv.join(F.broadcast(probe), "alias")
    return resolved.join(nodes_kv, resolved.node_id == nodes_kv.id).select(
        "alias", "node_id", "json"
    )
