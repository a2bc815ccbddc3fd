"""K1/K2/J10 — Neo4j bulk-import CSV export.

Reference: 06_prepare_db_import/grebi_make_neo_csv/src/main.rs:49-427 —
long→wide pivot with the column universe taken from the global summary
(main.rs:62-70): header = union of all property keys; ``:LABEL`` =
GraphNode + types (:184-193); multi-values joined with the 0x1F unit
separator (neo4j_import.dockersh:19-27); plus (:GraphNode)-[:id]->(:Id)
rows from sourceIds (grebi_make_neo_ids_csv/src/main.rs:13-31).

Spark design: the "dynamic schema" problem is two passes — (1) aggregate
the property-key universe (tiny), (2) driver-side build the select list
and pivot via map lookup. The pivot itself is one groupBy(node) over the
long form, then a select of map_from_entries lookups — no per-column
shuffle, one pass over the data regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARRAY_SEP = ""  # the reference's --array-delimiter U+001F


def node_prop_universe(merged: DataFrame) -> list[str]:
    """Pass 1: the global property-key list (sorted, stable header)."""
    return sorted(
        r["prop_key"] for r in merged.select("prop_key").distinct().collect()
    )


def neo4j_node_rows(merged: DataFrame, node_meta: DataFrame, prop_keys: list[str] | None = None) -> DataFrame:
    """Pass 2: one CSV-ready row per node: grebi:nodeId:ID, :LABEL, one
    column per property key with 0x1F-joined values."""
    keys = prop_keys or node_prop_universe(merged)
    per_node = (
        merged.groupBy("node_id", "prop_key")
        .agg(F.array_join(F.array_sort(F.collect_set("value")), ARRAY_SEP).alias("joined"))
        .groupBy("node_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("prop_key", "joined"))).alias("props"))
    )
    labeled = per_node.join(
        node_meta.select(
            "node_id",
            F.concat(
                F.lit("GraphNode"),
                F.when(
                    F.size("types") > 0,
                    F.concat(F.lit(";"), F.array_join(F.col("types"), ";")),
                ).otherwise(F.lit("")),
            ).alias(":LABEL"),
            F.array_join(F.col("datasources"), ARRAY_SEP).alias("grebi:datasources"),
            F.array_join(F.col("source_ids"), ARRAY_SEP).alias("grebi:sourceIds"),
        ),
        "node_id",
    )
    cols = [
        F.col("node_id").alias("grebi:nodeId:ID"),
        F.col(":LABEL"),
        F.col("grebi:datasources"),
        F.col("grebi:sourceIds"),
    ] + [
        F.element_at(F.col("props"), k).alias(k) for k in keys if not k.startswith("grebi:")
    ]
    return labeled.select(*cols)


def neo4j_edge_rows(edges: DataFrame) -> DataFrame:
    """:START_ID,:TYPE,:END_ID + fixed edge columns (main.rs:105-111)."""
    return edges.select(
        F.col("from_id").alias(":START_ID"),
        F.col("edge_type").alias(":TYPE"),
        F.col("to_id").alias(":END_ID"),
        F.col("edge_id").alias("grebi:edgeId"),
        F.array_join("datasources", ARRAY_SEP).alias("grebi:datasources"),
        F.col("subgraph").alias("grebi:subgraph"),
        F.array_join("from_source_ids", ARRAY_SEP).alias("grebi:fromSourceIds"),
        F.col("value_props").alias("grebi:edgeProps"),
    )


def neo4j_id_rows(node_meta: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J10 — the id-resolution star: every sourceId becomes an (:Id) node
    and a (GraphNode)-[:id]->(Id) edge (grebi_make_neo_csv/src/main.rs:
    234-237,390-413; grebi_make_neo_ids_csv/src/main.rs:13-31)."""
    id_edges = node_meta.select(
        F.col("node_id").alias(":START_ID"),
        F.lit("id").alias(":TYPE"),
        F.explode("source_ids").alias(":END_ID"),
    )
    id_nodes = id_edges.select(F.col(":END_ID").alias("id:ID")).distinct().select(
        "id:ID", F.lit("Id").alias(":LABEL")
    )
    return id_nodes, id_edges


# K3 — the bulk-load command + index DDL the reference runs after the
# CSVs exist (07_create_db/neo4j/neo4j_import.dockersh:19-27,
# create_indexes.cypher). The engine's boundary is generating these —
# executing them needs a Neo4j install, which is serving-side.

INDEX_STATEMENTS = (
    "CREATE INDEX node_id FOR (n:GraphNode) ON n.`grebi:nodeId`",
    "CREATE INDEX subgraph FOR (n:GraphNode) ON n.`grebi:subgraph`",
    "CREATE INDEX id_id FOR (n:Id) ON n.`id`",
    "CALL db.awaitIndexes(10800)",
)


def import_command(
    out_dir: str,
    threads: int = 32,
    max_off_heap: str = "50G",
) -> list[str]:
    """argv for ``neo4j-admin database import full`` over the CSV sets
    written by write_neo4j_csvs — one --nodes/--relationships per part
    file (the reference globs its split files the same way), plus the
    0x1F array delimiter and sizing flags from the reference script."""
    import glob
    import os

    def parts(sub: str) -> list[str]:
        return sorted(glob.glob(os.path.join(out_dir, sub, "part-*.csv")))

    cmd = ["neo4j-admin", "database", "import", "full"]
    cmd += [f"--nodes={f}" for f in parts("nodes") + parts("id_nodes")]
    cmd += [f"--relationships={f}" for f in parts("edges") + parts("id_edges")]
    cmd += [
        "--ignore-empty-strings=true",
        '--array-delimiter=U+001F',
        f"--threads={threads}",
        f"--max-off-heap-memory={max_off_heap}",
        "--verbose",
        "--read-buffer-size=256m",
    ]
    return cmd


def _serialize_escape(col: Column) -> Column:
    """The reference's byte-level value escaping at CSV-write time
    (grebi_make_neo_csv/src/main.rs:347-359 write_escaped_value):
    backslash doubles FIRST (single pass in the reference — each input
    byte maps independently, so doubling first then mapping the control
    chars is equivalent), then \\n, \\r, \\t become two-char backslash
    sequences. Embedded quotes are NOT handled here: the reference
    doubles them (b'\"' -> \"\") which is exactly the RFC-4180 quoting
    layer — Spark's writer reproduces it with escape='\"' + quoteAll.
    0x1F passes through raw (it IS the array delimiter; the reference
    writes joined arrays around it and never escapes it)."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _escaped_strings(df: DataFrame) -> DataFrame:
    cols = [
        _serialize_escape(F.col(f.name)).alias(f.name)
        if f.dataType.simpleString() == "string"
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


# quoteAll + escape='"' = every field quoted with embedded quotes
# doubled — byte-for-byte the reference's convention (it wraps every
# field in quotes and writes b'"' as "" — main.rs:341,358)
_CSV_OPTS = {"header": True, "quoteAll": True, "escape": '"'}


def write_neo4j_csvs(
    merged: DataFrame,
    node_meta: DataFrame,
    edges: DataFrame,
    out_dir: str,
) -> None:
    """Write the four CSV sets for `neo4j-admin database import full`."""
    _escaped_strings(neo4j_node_rows(merged, node_meta)).write.mode(
        "overwrite"
    ).options(**_CSV_OPTS).csv(f"{out_dir}/nodes")
    _escaped_strings(neo4j_edge_rows(edges)).write.mode("overwrite").options(
        **_CSV_OPTS
    ).csv(f"{out_dir}/edges")
    id_nodes, id_edges = neo4j_id_rows(node_meta)
    _escaped_strings(id_nodes).write.mode("overwrite").options(**_CSV_OPTS).csv(
        f"{out_dir}/id_nodes"
    )
    _escaped_strings(id_edges).write.mode("overwrite").options(**_CSV_OPTS).csv(
        f"{out_dir}/id_edges"
    )
