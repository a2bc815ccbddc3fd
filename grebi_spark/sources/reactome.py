"""Reactome (neo4j-dump) ingest (reference S10,
01_ingest/grebi_ingest_reactome/src/main.rs:14-140).

Input JSONL mixes {type:"node", id, labels, properties} and
{type:"relationship", label, start, end, properties}. Nodes become
entities (with CURIE-equivalence extraction from a small prefix map);
each relationship becomes a reified value on its source node.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# databaseName → CURIE prefix, the reference's equivalence attempts
CURIE_ATTEMPTS = {
    "ChEBI": "chebi:",
    "UniProt": "uniprot:",
    "ENSEMBL": "ensembl:",
    "GeneOntology": "go:",
    "PubMed": "pmid:",
}


def reactome_to_nodes(
    spark: SparkSession,
    path: str,
    datasource: str = "reactome",
    subgraph: str = "default",
) -> DataFrame:
    raw = spark.read.json(path).persist()
    rid = F.concat(F.lit("reactome:"), F.col("id").cast("string"))

    nodes = raw.filter(F.col("type") == "node")
    node_cols = [c for c in nodes.select("properties.*").columns] if "properties" in raw.columns else []

    def node_prop(key: str, val, vprops=None):
        return nodes.select(
            F.lit(subgraph).alias("subgraph"),
            F.lit(datasource).alias("datasource"),
            rid.alias("entity_id"),
            F.lit(key).alias("prop_key") if isinstance(key, str) else key.alias("prop_key"),
            val.alias("value"),
            (vprops if vprops is not None else F.lit(None).cast("string")).alias(
                "value_props"
            ),
        ).filter(F.col("value").isNotNull() & (F.col("value") != ""))

    out = node_prop("id", rid)
    if "labels" in raw.columns:
        out = out.unionByName(
            nodes.select(
                F.lit(subgraph).alias("subgraph"),
                F.lit(datasource).alias("datasource"),
                rid.alias("entity_id"),
                F.lit("grebi:type").alias("prop_key"),
                F.explode(
                    F.transform("labels", lambda l: F.concat(F.lit("reactome:"), l))
                ).alias("value"),
                F.lit(None).cast("string").alias("value_props"),
            )
        )
    for c in node_cols:
        out = out.unionByName(
            node_prop(f"reactome:{c}", F.col(f"properties.{c}").cast("string"))
        )
    # CURIE equivalence: databaseName + identifier → grebi:equivalentTo
    if "databaseName" in node_cols and "identifier" in node_cols:
        curie = None
        for db, pfx in CURIE_ATTEMPTS.items():
            cond = F.col("properties.databaseName") == db
            val = F.concat(F.lit(pfx), F.col("properties.identifier").cast("string"))
            curie = F.when(cond, val) if curie is None else curie.when(cond, val)
        out = out.unionByName(node_prop("grebi:equivalentTo", curie))

    rels = raw.filter(F.col("type") == "relationship")
    if rels.limit(1).count() > 0:
        rel_prop_cols = (
            sorted(rels.select("properties.*").columns) if "properties" in raw.columns else []
        )
        pairs = F.array(
            *[
                F.when(
                    F.col(f"properties.{c}").isNotNull(),
                    F.concat(
                        F.lit(json.dumps(f"reactome:{c}") + ':["'),
                        F.regexp_replace(
                            F.col(f"properties.{c}").cast("string"), r'(["\\])', r"\\$1"
                        ),
                        F.lit('"]'),
                    ),
                )
                for c in rel_prop_cols
            ]
        ) if rel_prop_cols else F.array().cast("array<string>")
        vprops = F.concat(
            F.lit("{"),
            F.array_join(F.filter(pairs, lambda x: x.isNotNull()), ","),
            F.lit("}"),
        )
        out = out.unionByName(
            rels.select(
                F.lit(subgraph).alias("subgraph"),
                F.lit(datasource).alias("datasource"),
                F.concat(F.lit("reactome:"), F.col("start").cast("string")).alias(
                    "entity_id"
                ),
                F.concat(F.lit("reactome:"), F.col("label")).alias("prop_key"),
                F.concat(F.lit("reactome:"), F.col("end").cast("string")).alias("value"),
                vprops.alias("value_props"),
            )
        )
    return out
