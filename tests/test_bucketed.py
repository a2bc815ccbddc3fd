"""Bucketed graph store: the write layout must buy back the shuffle —
a node-keyed join over the bucketed tables plans ZERO exchanges on the
bucketed sides (the 100 TB contract), and the hydration result matches
a plain join of the same data.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from grebi_spark.sinks.bucketed import (
    bucketed_edge_hydration,
    write_bucketed_graph,
)


def plan_of(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    nodes = spark.createDataFrame(
        [(f"n:{i}", ["T%d" % (i % 3)]) for i in range(100)],
        "node_id string, types array<string>",
    )
    edges = spark.createDataFrame(
        [(f"n:{i}", "rel", f"n:{(i * 7) % 100}") for i in range(100)],
        "from_id string, edge_type string, to_id string",
    )
    db = "bucketed_test"
    write_bucketed_graph(nodes, edges, db, n_buckets=4)
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


@pytest.fixture()
def no_broadcast(spark):
    """Force the non-broadcast join path so the plan proves the
    bucketing (a broadcast join would also show no exchange, but for
    the wrong reason — at 100 TB neither side broadcasts)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_db, no_broadcast):
    df = bucketed_edge_hydration(spark, bucketed_db)
    plan = plan_of(df)
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_hydration_matches_plain_join(spark, bucketed_db):
    bucketed = {
        tuple(r)
        for r in bucketed_edge_hydration(spark, bucketed_db)
        .withColumn("types", F.array_join("types", ","))
        .collect()
    }
    nodes = spark.table(f"{bucketed_db}.graph_nodes_bucketed")
    edges = spark.table(f"{bucketed_db}.graph_edges_bucketed")
    plain = {
        tuple(r)
        for r in edges.join(nodes, edges.from_id == nodes.node_id)
        .select("from_id", "edge_type", "to_id", F.array_join("types", ",").alias("types"))
        .collect()
    }
    assert bucketed == plain and len(bucketed) == 100


def test_bucketed_groupby_needs_no_shuffle(spark, bucketed_db):
    """An aggregation keyed on the bucket key reuses the bucketing —
    outDegree per node plans without an exchange."""
    edges = spark.table(f"{bucketed_db}.graph_edges_bucketed")
    df = edges.groupBy("from_id").agg(F.count("*").alias("out_degree"))
    plan = plan_of(df)
    assert "Exchange hashpartitioning" not in plan
