"""Cytoscape JSON (.cyjs) export — parity for the reference's notebook
flow (notebooks/util_networkx.py:nx_to_cytoscape + fipronil.ipynb: a
2-hop ``subgraphAll`` neighbourhood dumped as cytoscape_data JSON for
the Cytoscape viewer).

Matches the reference's element shape: node data carries the canonical
node id as ``id`` (and the notebook's ``ids`` echo), the labels under
``grebi:type``, names and datasources; edge data carries source/target
node ids, the relationship type under ``grebi:type``, and the edge id.
Per-element JSON rendering happens engine-side (``to_json`` over a
struct — codegen, not Python); only the export-sized document assembly
collects, mirroring graphml_string.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cytoscape_node_json(nodes: DataFrame) -> DataFrame:
    data = F.struct(
        F.col("node_id").alias("id"),
        F.col("node_id").alias("ids"),
        F.col("types").alias("grebi:type"),
        F.col("names").alias("names"),
        F.col("datasources").alias("datasources"),
    )
    return nodes.select(
        F.col("node_id").alias("sort_key"), F.to_json(data).alias("j")
    )


def cytoscape_edge_json(edges: DataFrame) -> DataFrame:
    data = F.struct(
        F.col("edge_id").alias("id"),
        F.col("from_id").alias("source"),
        F.col("to_id").alias("target"),
        F.col("edge_type").alias("grebi:type"),
        F.col("datasources").alias("datasources"),
    )
    return edges.select(
        F.col("edge_id").alias("sort_key"), F.to_json(data).alias("j")
    )


def cytoscape_json(nodes: DataFrame, edges: DataFrame) -> dict:
    """The cytoscape_data document (directed multigraph), assembled from
    the engine-rendered element JSON.

    BOUNDEDNESS: the collect()s here are a deliberate driver-side
    document assembly and assume an export-sized (notebook
    neighbourhood) subgraph — element rendering
    (cytoscape_node_json/cytoscape_edge_json) is distributed; only the
    dict construction is driver-side, because the output is one JSON
    document for a visualisation client, inherently bounded by what a
    browser can draw."""
    n = [
        {"data": json.loads(r["j"])}
        for r in cytoscape_node_json(nodes).orderBy("sort_key").collect()
    ]
    e = [
        {"data": json.loads(r["j"])}
        for r in cytoscape_edge_json(edges).orderBy("sort_key").collect()
    ]
    return {
        "data": [],
        "directed": True,
        "multigraph": True,
        "elements": {"nodes": n, "edges": e},
    }
