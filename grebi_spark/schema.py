"""Canonical entity schemas.

The reference streams open-schema JSONL entities (any key may appear —
04_index/grebi_index/src/main.rs:54-56). The natural Spark shape for a
dynamic key space is the **long form** (EAV): one row per
(entity, property, value). Long form is what the reference's own stages
iterate over anyway, and it keeps every downstream step a plain
filter/join/groupBy that Catalyst can push down and prune — no
per-dataset schema inference, no wide-row explosion at 40+ datasources.

Shapes
------
ingested (stage-01 output; one row per property value of one source entity):
    subgraph      string   -- constant/partition column
    datasource    string
    entity_id     string   -- the source entity's local id ("id" prop value #1)
    prop_key      string
    value         string   -- scalar rendered to string (reference keeps raw
                              JSON bytes; all its comparisons are byte-wise —
                              03_merge/grebi_merge/src/main.rs:259-282)
    value_props   string   -- reified statement metadata as *canonical JSON*
                              (sorted keys): {"prop": ["v", ...], ...}. The
                              reference compares values byte-wise, reification
                              included (03_merge/grebi_merge/src/main.rs:259-282),
                              so a canonical string is the faithful dedup key —
                              and unlike MapType it is group-able/orderable.
                              Parse with from_json(value_props, VALUE_PROPS) when
                              querying statement metadata. Null for plain values.
                              (Reified shape in the reference: {"grebi:value": v,
                              "grebi:properties": {...}} —
                              grebi_shared/src/slice_merged_entity.rs:143-202.)

merged (stage-03 output; one row per (node, property, distinct value)):
    node_id, prop_key, value, value_props,
    datasources   array<string>  -- sorted distinct provenance
    source_ids    array<string>  -- sorted distinct contributing source ids

node-level (side table; cf. metadata.jsonl, 04_index/grebi_index/src/main.rs:80-199):
    node_id, subgraph, datasources, source_ids, types, names, display_type

edges (stage-05 output):
    edge_id, edge_type, subgraph, from_id, to_id, datasources,
    from_source_ids, value_props
"""

from __future__ import annotations

from pyspark.sql import types as T

# parsed view of the value_props canonical-JSON column
VALUE_PROPS = T.MapType(T.StringType(), T.ArrayType(T.StringType()))

INGESTED = T.StructType(
    [
        T.StructField("subgraph", T.StringType(), False),
        T.StructField("datasource", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("prop_key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("value_props", T.StringType(), True),
    ]
)

MERGED = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("subgraph", T.StringType(), False),
        T.StructField("prop_key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("value_props", T.StringType(), True),
        T.StructField("datasources", T.ArrayType(T.StringType()), False),
        T.StructField("source_ids", T.ArrayType(T.StringType()), False),
    ]
)

NODE_META = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("subgraph", T.StringType(), False),
        T.StructField("datasources", T.ArrayType(T.StringType()), False),
        T.StructField("source_ids", T.ArrayType(T.StringType()), False),
        T.StructField("types", T.ArrayType(T.StringType()), False),
        T.StructField("names", T.ArrayType(T.StringType()), False),
    ]
)

EDGE = T.StructType(
    [
        T.StructField("edge_id", T.StringType(), False),
        T.StructField("edge_type", T.StringType(), False),
        T.StructField("subgraph", T.StringType(), False),
        T.StructField("from_id", T.StringType(), False),
        T.StructField("to_id", T.StringType(), False),
        T.StructField("datasources", T.ArrayType(T.StringType()), False),
        T.StructField("from_source_ids", T.ArrayType(T.StringType()), True),
        T.StructField("value_props", T.StringType(), True),
    ]
)
