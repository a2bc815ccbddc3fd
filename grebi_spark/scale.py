"""Scale utilities: persisted graph layout and skew handling.

These encode the decisions that matter at 100 TB and are invisible at
test scale:

- **Layout**: the long-form props table is bucketed by ``node_id`` so
  merge-shaped aggregations and node hydration joins are co-located
  (no shuffle on re-read); edges are written twice-partitionable —
  physically sorted by ``from_id`` with a parquet-pruned ``to_id``
  secondary — because both edge-page directions (Q8) are hot paths.
- **Skew**: identifier graphs have mega-cliques (the reference warns at
  >50 members for a reason) and web corpora have mega-duplicates. AQE's
  skew-join split handles most cases; ``salted_join`` is the explicit
  fallback for aggregations/joins AQE can't rewrite (e.g. a skewed
  groupBy where one key holds 1% of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import BuiltGraph

GRAPH_TABLES = ("merged", "nodes", "edges", "groups")


def write_graph(graph: BuiltGraph, out_dir: str, buckets: int = 64) -> None:
    """Persist a built graph in query-ready layout."""
    (
        graph.merged.repartition(buckets, "node_id")
        .sortWithinPartitions("node_id", "prop_key")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/merged")
    )
    graph.nodes.repartition(buckets, "node_id").sortWithinPartitions(
        "node_id"
    ).write.mode("overwrite").parquet(f"{out_dir}/nodes")
    (
        graph.edges.repartition(buckets, "from_id")
        .sortWithinPartitions("from_id", "edge_type")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/edges")
    )
    graph.groups.write.mode("overwrite").parquet(f"{out_dir}/groups")


def read_graph_views(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Re-open a persisted graph and register the standard views."""
    out = {}
    for name in GRAPH_TABLES:
        df = spark.read.parquet(f"{out_dir}/{name}")
        df.createOrReplaceTempView(f"graph_{name if name != 'merged' else 'props'}")
        out[name] = df
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a random-ish salt
    derived from a sibling column hash (deterministic — no Math.random),
    the small side is exploded across all salt values. Turns one hot
    reducer into ``salt_buckets`` even ones.

    Use when AQE's skew split can't help (e.g. the skew is in a
    downstream aggregation, or the join is a broadcast candidate that
    doesn't fit memory).
    """
    salt = (F.abs(F.xxhash64(*big.columns)) % salt_buckets).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def skewed_key_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """The mega-clique canary as a reusable tool: top key cardinalities,
    for sizing salt_buckets / validating AQE took the skew path."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), key)  # key tiebreak: deterministic top-N
        .limit(top)
    )
