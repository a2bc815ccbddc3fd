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


def remove_datasource(state: GraphState, datasource: str) -> GraphState:
    """Retire one datasource from the built graph — the hard inverse of
    ``add_datasource``: dropping a source's identifier pairs can SPLIT a
    clique into several components, each needing a fresh canonical
    election and re-merge, and entities that existed only in the retired
    source must vanish entirely.

    Correctness rests on two closure facts:

    * *Affected cliques* = old components containing any identifier the
      retired source's rows mention (singletons included via
      coalesce-to-self). Components only ever split on removal — the
      remaining pair set is a subset — so an unaffected clique keeps its
      exact membership AND canonical id; its old merged rows pass
      through untouched, and they contain no retired-source data
      (any entity with a retired-source row contributes that row's
      identifiers, which marks its clique affected).
    * *Re-grouping is local*: every identifier of a remaining entity
      that touches an affected clique lies inside affected cliques (its
      within-entity pairs glued them into one old component), so the CC
      over the touched entities' remaining pairs reproduces exactly the
      from-scratch components — no pair can reach outside the affected
      set. Seed-equivalence edges (config) are re-applied; a seed clique
      the delta re-emits unchanged dedups against the retained mapping.

    Scale shape: identical to the add path — the CC runs over the
    touched cliques' pairs only, the re-merge over the touched entities'
    rows only; the global index/materialise stages are the same
    single-pass aggregates a full build runs.
    """
    config = state.config
    remaining = state.rows.filter(F.col("datasource") != datasource)
    removed = state.rows.filter(F.col("datasource") == datasource)
    old_groups = state.graph.groups

    # -- 1. affected cliques: canonicals of every retired identifier ----
    removed_ids = extract_identifiers(removed, config).select("id").distinct()
    affected = (
        removed_ids.join(old_groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
        .cache()
    )
    member_ids = (
        old_groups.join(affected, old_groups.group_id == affected.node_id, "left_semi")
        .select("id")
        .unionAll(affected.select(F.col("node_id").alias("id")))
        .distinct()
    )

    # -- 2. re-group ONLY the touched entities' remaining pairs ---------
    rem_ids = extract_identifiers(remaining, config)
    touched_entities = (
        rem_ids.join(member_ids, "id", "left_semi")
        .select("datasource", "entity_id")
        .distinct()
        .cache()
    )
    touched_pairs = identifier_pairs(
        rem_ids.join(touched_entities, ["datasource", "entity_id"], "left_semi")
    )
    # build_groups re-adds the config seed edges; restrict its output to
    # affected members so an UNaffected seed clique is not re-emitted as
    # the seed-only sub-component (its retained rows already map it, and
    # a shrunken re-election could conflict). A delta component can never
    # mix member and non-member ids — the bridging seed edge would have
    # made them one old component, i.e. all members.
    groups_delta = build_groups(touched_pairs, config).join(
        member_ids, "id", "left_semi"
    )
    groups = (
        old_groups.join(member_ids, "id", "left_anti")
        .unionAll(groups_delta)
        .localCheckpoint()
    )

    # -- 3. re-merge the touched entities; pass the rest through --------
    changed_rows = remaining.join(
        touched_entities, ["datasource", "entity_id"], "left_semi"
    )
    merged_delta = merge_nodes(
        lift_types(assign_ids(changed_rows, groups, config), config), config
    )
    unchanged = state.graph.merged.join(
        affected,
        state.graph.merged.node_id == affected.node_id,
        "left_anti",
    )
    merged = unchanged.unionByName(merged_delta).localCheckpoint()

    # -- 4. global single-pass stages (same barriers as the add path) ---
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
    return GraphState(rows=remaining, graph=graph, config=config)
