"""J2 + N6/N7 — the clique merge: one node per equivalence group with
per-value provenance.

Reference: a k-way sorted merge of pre-sorted gzip streams
(03_merge/grebi_merge/src/main.rs:45-380) with, per group:
  - union + sort + dedup of datasources and sourceIds (:214-218)
  - property rows sorted by (key, value, datasource) and deduped on that
    key (:259-282)
  - equal (key, value) rows from different datasources merged, combining
    their datasource/sourceId lists (:287-371)
  - excluded props dropped (--exclude-props, :52,203)
  - groups where no constituent row carried grebi:type dropped (:173-193)

Spark design: the reference hand-built a sort-merge aggregation with
external sort + streaming merge; Spark's sort-based shuffle aggregation IS
that operator. One ``groupBy(node_id, prop_key, value, value_props)``
produces the provenance merge; a second node-level aggregate produces the
entity header. Both are partial-aggregated map-side, spill-safe, and AQE
re-splits skew (e.g. a mega-clique) at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SubgraphConfig


def merge_nodes(assigned: DataFrame, config: SubgraphConfig | None = None) -> DataFrame:
    """Assigned long rows (from all datasources, unioned) → MERGED rows.

    One output row per (node_id, prop_key, value, value_props) with sorted
    distinct datasource and source-id provenance arrays.
    """
    # N7: drop cliques in which *no* constituent row had grebi:type —
    # a group-level predicate → semi-join against the typed node ids.
    # Evaluated on the *pre-exclusion* rows, as the reference sets has_type
    # during parsing, before --exclude-props applies (parse_entity.rs:49-51,
    # main.rs:203).
    typed = (
        assigned.filter(F.col("prop_key") == "grebi:type")
        .select("node_id")
        .distinct()
    )
    rows = assigned.join(typed, "node_id", "left_semi")
    if config and config.exclude_props:
        rows = rows.filter(~F.col("prop_key").isin(list(config.exclude_props)))

    # collect_set, not collect_list+array_distinct: the set dedups IN the
    # aggregation buffer, so a mega-clique hot key (100k aliases sharing
    # one (node, prop, value)) costs memory proportional to its DISTINCT
    # provenance, not its input rows — same sorted-distinct result
    return rows.groupBy("node_id", "subgraph", "prop_key", "value", "value_props").agg(
        F.array_sort(F.collect_set("datasource")).alias("datasources"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("source_ids")))).alias(
            "source_ids"
        ),
    )


def node_table(merged: DataFrame) -> DataFrame:
    """Node-level header: datasources / sourceIds / types per node —
    the fixed-prefix keys of the reference's merged JSON
    (grebi:nodeId, grebi:datasources, grebi:sourceIds, grebi:subgraph —
    main.rs:220-379)."""
    return merged.groupBy("node_id", "subgraph").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("datasources")))).alias(
            "datasources"
        ),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("source_ids")))).alias(
            "source_ids"
        ),
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.when(F.col("prop_key") == "grebi:type", F.array("value")).otherwise(
                            F.array().cast("array<string>")
                        )
                    )
                )
            )
        ).alias("types"),
    )


def merged_to_wide(merged: DataFrame) -> DataFrame:
    """Merged long rows → one row per node with a properties map —
    the reference's merged-node JSON shape
    (prop → [{datasources, sourceIds, value}] — main.rs:220-379).
    Used by sinks; analytical operators stay on long form.
    """
    per_prop = merged.groupBy("node_id", "subgraph", "prop_key").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("value"),
                    F.col("value_props"),
                    F.col("datasources"),
                    F.col("source_ids"),
                )
            )
        ).alias("values")
    )
    return per_prop.groupBy("node_id", "subgraph").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("prop_key", "values")))
        ).alias("properties")
    )
