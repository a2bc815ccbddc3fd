"""Incremental graph maintenance: fold a new datasource into an
already-built graph without re-running grouping + merge over unchanged
cliques.

The reference rebuilds the whole graph for any input change (the
Nextflow DAG has no incremental path — every run re-ingests, re-groups
with a 300 GB union-find, and re-merges everything). Here the update is
scoped to the *affected* cliques:

1. **Groups**: the old ``(id, group_id)`` mapping is itself a star-edge
   set whose connected components equal the old cliques, so new
   identifier pairs ∪ old star edges re-converge in O(1) label rounds —
   the CC loop never revisits the full historical pair set.
2. **Affected cliques** = components containing at least one identifier
   from the new datasource. Memberships only ever grow by new ids
   linking in, so a clique with no new id is exactly its old self,
   canonical id included.
3. **Re-merge** only the affected cliques, from the retained
   pre-assignment rows (so untyped cliques that *become* typed through
   the new link are revived correctly — the N7 drop is re-evaluated on
   the re-merged group). Unchanged merged rows pass through untouched.
4. Index + materialise are recomputed over the combined merged frame:
   they are single broadcast-join/aggregate passes. (The further
   refinement — additive count deltas and materialising only
   changed-node edges plus unchanged-node⋈new-meta — is a documented
   optimisation, not needed for correctness.)

Equivalence with a from-scratch build over the union of sources is the
correctness contract, asserted by ``tests/test_incremental.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import SubgraphConfig
from .operators.assign_ids import assign_ids, lift_types
from .operators.groups import build_groups
from .operators.identifiers import extract_identifiers, identifier_pairs
from .operators.index import build_index
from .operators.materialise import display_types, edge_summary, materialise_edges
from .operators.merge import merge_nodes, node_table
from .operators.normalise import PrefixMap, normalise_prefixes
from .pipeline import BuiltGraph, build_graph


@dataclass
class GraphState:
    """A built graph plus the retained pre-assignment rows that make
    incremental updates possible (at scale: a bucketed Parquet table)."""

    rows: DataFrame  # normalised long rows, union of every ingested source
    graph: BuiltGraph
    config: SubgraphConfig


def build_graph_stateful(
    ingested: list[DataFrame],
    config: SubgraphConfig,
    prefix_map: PrefixMap | None = None,
) -> GraphState:
    """Full build that also retains the incremental-update state."""
    if prefix_map:
        ingested = [normalise_prefixes(df, prefix_map) for df in ingested]
    rows = reduce(DataFrame.unionByName, ingested)
    return GraphState(rows=rows, graph=build_graph(ingested, config), config=config)


def add_datasource(
    state: GraphState,
    new_rows: DataFrame,
    prefix_map: PrefixMap | None = None,
) -> GraphState:
    """Fold one new datasource's long rows into the built graph,
    re-merging only the cliques its identifiers touch."""
    config = state.config
    if prefix_map:
        new_rows = normalise_prefixes(new_rows, prefix_map)

    # -- 1. incremental grouping: new pairs ∪ old star edges ------------
    new_ids = extract_identifiers(new_rows, config)
    old_star = state.graph.groups.select(
        F.col("group_id").alias("src"), F.col("id").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    # localCheckpoint (eager): groups and merged are read by many
    # downstream branches — without cutting lineage here, the CC loop's
    # plan is re-inlined into every consumer and the composed plan
    # explodes (driver OOM at analysis time on deep graphs)
    groups = build_groups(
        identifier_pairs(new_ids).unionAll(old_star), config
    ).localCheckpoint()

    # -- 2. affected cliques: canonical ids touched by any new id -------
    ids_new = new_ids.select("id").distinct()
    affected = (
        ids_new.join(groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
        .cache()
    )
    # every member id of an affected clique (non-clique new ids map to
    # themselves — their singleton is "affected" too)
    member_ids = (
        groups.join(affected, groups.group_id == affected.node_id, "left_semi")
        .select("id")
        .unionAll(affected.select(F.col("node_id").alias("id")))
        .distinct()
    )

    # -- 3. re-merge affected cliques from pre-assignment rows ----------
    all_rows = state.rows.unionByName(new_rows)
    touched_entities = (
        extract_identifiers(all_rows, config)
        .join(member_ids, "id", "left_semi")
        .select("datasource", "entity_id")
        .distinct()
    )
    changed_rows = all_rows.join(
        touched_entities, ["datasource", "entity_id"], "left_semi"
    )
    merged_delta = merge_nodes(
        lift_types(assign_ids(changed_rows, groups, config), config), config
    )

    # unchanged rows: old merged rows whose clique gained no new member.
    # An absorbed old canonical maps to a different new canonical, so the
    # filter must test the row's NEW canonical against the affected set.
    old_merged = state.graph.merged
    with_canon = old_merged.join(
        groups.withColumnRenamed("id", "node_id").withColumnRenamed(
            "group_id", "new_canon"
        ),
        "node_id",
        "left",
    ).withColumn("new_canon", F.coalesce("new_canon", F.col("node_id")))
    unchanged = (
        with_canon.join(
            affected, with_canon.new_canon == affected.node_id, "left_anti"
        )
        .drop("new_canon")
        .select(*old_merged.columns)
    )
    merged = unchanged.unionByName(merged_delta).localCheckpoint()

    # -- 4. global single-pass stages over the combined frame -----------
    # same stage barriers as build_graph(materialize="checkpoint"):
    # meta and edges feed multiple consumers, and their plans would
    # otherwise re-embed the whole incremental-merge tree per action
    index = build_index(merged)
    meta = index.metadata.localCheckpoint()
    edges = materialise_edges(merged, meta, config).localCheckpoint()

    graph = BuiltGraph(
        groups=groups,
        merged=merged,
        nodes=meta,
        edges=edges,
        index=index,
        display_types=display_types(meta, index.type_counts),
        edge_summary=edge_summary(edges, meta),
    )
    return GraphState(rows=all_rows, graph=graph, config=config)
