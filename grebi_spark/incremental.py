"""Incremental graph maintenance: fold a new datasource into an
already-built graph (add), retire one (remove), or replace one in place
(update) without re-running grouping + merge + index + materialise over
unchanged cliques.

The reference rebuilds the whole graph for any input change (the
Nextflow DAG has no incremental path — every run re-ingests, re-groups
with a 300 GB union-find, and re-merges everything). Here the update is
scoped to the *affected* cliques end to end:

1. **Groups**: the old ``(id, group_id)`` mapping is itself a star-edge
   set whose connected components equal the old cliques, so new
   identifier pairs ∪ old star edges re-converge in O(1) label rounds —
   the CC loop never revisits the full historical pair set. Removal
   re-groups only the touched cliques' remaining raw pairs.
2. **Affected cliques** = components containing at least one identifier
   from the changed datasource. Memberships only grow on add and only
   split on remove, so a clique with no changed id is exactly its old
   self, canonical id included.
2b. **Reference invalidation**: cliques whose rows REFERENCE (by value
   or property key) an id whose canonical mapping changed join the
   affected set — assign_ids rewrites those strings through the groups
   table, so passing them through verbatim would leave stale canonicals
   (``_expand_affected_for_references``).
3. **Re-merge** only the affected cliques, from the retained
   pre-assignment rows. Unchanged merged rows pass through untouched.
4. **Delta index**: the count side tables (prop counts, reified-prop
   counts, type counts, and the refcounted name/id sets) are maintained
   ADDITIVELY — aggregate the removed and re-merged rows only, then
   merge the per-key deltas into the stored counts with an outer join
   (old-side corpus table ⋈ delta-sized update; bucketed at rest this
   is a zero-shuffle merge). The node-header table is node-granular:
   drop the affected canonicals, append the re-merged cliques' headers.
5. **Delta materialise**: new edges =
   (old edges whose from-node is unchanged and whose target survives)
   ∪ (re-merged clique rows ⋈ ALL node ids)
   ∪ (unchanged rows ⋈ NEWLY-BORN node ids only)
   — the two materialise joins see a delta-sized side each; the old
   edge set passes through behind two anti-joins. The edge-summary cube
   is maintained additively the same way, re-aggregating only edges
   that touch an affected canonical on either endpoint.

``display_types`` is recomputed (a narrow per-node argmin against the
broadcast type counts): a changed GLOBAL type count can legally flip the
display type of an untouched node, so the pass is corpus-wide by
semantics — but it scans two slim columns, not the merged long table.

Equivalence with a from-scratch build over the union of sources is the
correctness contract, asserted by ``tests/test_incremental.py``; the
same tests assert the delta paths' materialise inputs are delta-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import SubgraphConfig
from .operators.assign_ids import assign_ids, lift_types
from .operators.groups import build_groups
from .operators.identifiers import extract_identifiers, identifier_pairs
from .operators.index import (
    GraphIndex,
    edge_prop_counts_of,
    id_counts_of,
    name_counts_of,
    node_metadata,
    prop_counts_of,
    type_counts_of,
)
from .operators.materialise import display_types, edge_summary, materialise_edges
from .operators.merge import merge_nodes
from .operators.normalise import PrefixMap, normalise_prefixes
from .pipeline import BuiltGraph, build_graph


@dataclass
class IndexCounts:
    """Refcounted name/id side state (the counts behind GraphIndex's
    distinct name/id sets — needed so removals can decrement instead of
    forcing a corpus re-distinct). At scale: two stored keyed tables."""

    name_counts: DataFrame  # (name, n)
    id_counts: DataFrame    # (id, n)


@dataclass
class GraphState:
    """A built graph plus the retained pre-assignment rows and count
    side tables that make incremental updates possible (at scale:
    bucketed Parquet tables)."""

    rows: DataFrame  # normalised long rows, union of every ingested source
    graph: BuiltGraph
    config: SubgraphConfig
    counts: IndexCounts | None = None
    delta_stats: dict = field(default_factory=dict)  # diagnostics of the last update


def _pin(df: DataFrame) -> DataFrame:
    """Eagerly materialise a DELTA-SIZED intermediate and cut its lineage.

    ``cache()`` keeps the full logical plan behind the cached data, so a
    frame reused by several downstream branches re-inlines its whole
    subtree into every consumer — across the 4-5 levels of derived frames
    in one update the composed plan's *tree* expansion of the shared DAG
    grows exponentially (observed: driver OOM inside plan stringification
    on a toy fixture). ``localCheckpoint`` replaces the plan with the
    materialised rows, keeping every consumer's plan linear. All pinned
    frames are delta-sized (affected canonicals, member ids, changed
    rows); at 100 TB these are exactly the stored side tables a
    maintenance job would persist between stages."""
    return df.localCheckpoint()


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


def _ensure_counts(state: GraphState) -> IndexCounts:
    """Bootstrap the refcounted name/id state from the built graph on
    first incremental use (one corpus pass, then maintained forever)."""
    if state.counts is None:
        merged = state.graph.merged
        state.counts = IndexCounts(
            name_counts=name_counts_of(merged).localCheckpoint(),
            id_counts=id_counts_of(merged).localCheckpoint(),
        )
    return state.counts


def _apply_count_delta(
    old: DataFrame, removed: DataFrame, added: DataFrame, keys: list[str], n: str
) -> DataFrame:
    """new = old − removed + added, per key; keys that hit zero vanish.
    ``removed``/``added`` are already-aggregated DELTA-SIZED frames; the
    single outer join against the stored table is the merge a bucketed
    layout runs shuffle-free."""
    upd = (
        removed.select(*keys, (-F.col(n)).alias(n))
        .unionByName(added)
        .groupBy(*keys)
        .agg(F.sum(n).alias("__dn"))
    )
    return (
        old.join(upd, keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col(n), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
            ).alias(n),
        )
        .filter(F.col(n) > 0)
    )


def _delta_finish(
    state: GraphState,
    groups: DataFrame,
    all_rows: DataFrame,
    unchanged: DataFrame,
    removed_old: DataFrame,
    merged_delta: DataFrame,
    with_stats: bool = False,
) -> GraphState:
    """Shared tail of add/remove/update: given the clique-granular split
    of the old merged frame (``unchanged`` passes through, ``removed_old``
    is retired) and the re-merged delta, produce the new GraphState with
    DELTA index + materialise stages (module docstring, steps 4-5)."""
    config = state.config
    counts = _ensure_counts(state)
    old = state.graph

    # Materialise the three delta frames FIRST: every eager job below
    # (count deltas, metadata, edge legs) reads one of them, and without
    # this barrier each job would re-run the split join + re-merge chain
    # from scratch (measured 4×+ slower at test scale).
    merged_delta = merged_delta.localCheckpoint()
    unchanged = unchanged.localCheckpoint()
    removed_old = removed_old.localCheckpoint()
    # cheap union of two checkpointed frames — no barrier needed
    merged = unchanged.unionByName(merged_delta)

    # canonical-id bookkeeping: R = retired canonicals, born/vanished =
    # node ids that appear/disappear (all delta-sized; cached — each
    # feeds several joins below)
    R = _pin(removed_old.select("node_id").distinct())
    new_canons = _pin(merged_delta.select("node_id").distinct())
    vanished = _pin(R.join(new_canons, "node_id", "left_anti"))
    born = _pin(new_canons.join(R, "node_id", "left_anti"))

    # -- delta index: additive counts + node-granular metadata ----------
    prop_counts = _apply_count_delta(
        old.index.prop_counts,
        prop_counts_of(removed_old),
        prop_counts_of(merged_delta),
        ["prop_key"],
        "n_values",
    ).localCheckpoint()
    edge_prop_counts = _apply_count_delta(
        old.index.edge_prop_counts,
        edge_prop_counts_of(removed_old),
        edge_prop_counts_of(merged_delta),
        ["prop_key"],
        "n_values",
    ).localCheckpoint()
    type_counts = _apply_count_delta(
        old.index.type_counts,
        type_counts_of(removed_old),
        type_counts_of(merged_delta),
        ["type"],
        "n_nodes",
    ).localCheckpoint()
    name_counts = _apply_count_delta(
        counts.name_counts,
        name_counts_of(removed_old),
        name_counts_of(merged_delta),
        ["name"],
        "n",
    ).localCheckpoint()
    id_counts = _apply_count_delta(
        counts.id_counts,
        id_counts_of(removed_old),
        id_counts_of(merged_delta),
        ["id"],
        "n",
    ).localCheckpoint()
    meta = (
        old.nodes.join(R, "node_id", "left_anti")
        .unionByName(node_metadata(merged_delta))
        .localCheckpoint()
    )

    # -- delta materialise (module docstring step 5) --------------------
    Rf = R.withColumnRenamed("node_id", "from_id")
    Vt = vanished.withColumnRenamed("node_id", "to_id")
    kept = (
        old.edges.join(Rf, "from_id", "left_anti")
        .join(Vt, "to_id", "left_anti")
        .select(*old.edges.columns)  # the USING joins front the join keys
    )
    delta_edges = materialise_edges(merged_delta, meta, config)
    born_edges = materialise_edges(unchanged, born, config)
    new_edge_rows = delta_edges.unionByName(born_edges).localCheckpoint()
    edges = kept.unionByName(new_edge_rows).localCheckpoint()

    # -- delta edge summary: re-aggregate only edges touching R ---------
    # dropped-from-summary = every old edge with an endpoint in R
    # (vanished ⊆ R and persisting ⊆ R, so this covers both); edges to a
    # PERSISTING affected canonical stay in the edge set but their
    # to-node's types may have changed, so they are re-added against the
    # new metadata alongside the genuinely new edge rows.
    Rt = R.withColumnRenamed("node_id", "to_id")
    e_fromR = old.edges.join(Rf, "from_id", "left_semi")
    e_toR_only = old.edges.join(Rf, "from_id", "left_anti").join(
        Rt, "to_id", "left_semi"
    )
    persisting_t = (
        R.join(new_canons, "node_id", "left_semi")
        .withColumnRenamed("node_id", "to_id")
    )
    kept_touch = old.edges.join(Rf, "from_id", "left_anti").join(
        persisting_t, "to_id", "left_semi"
    )
    sig_keys = ["from_sig", "edge_type", "to_sig", "ds_sig"]
    summary = _apply_count_delta(
        old.edge_summary,
        edge_summary(e_fromR.unionByName(e_toR_only), old.nodes),
        edge_summary(new_edge_rows.unionByName(kept_touch), meta),
        sig_keys,
        "n_edges",
    ).localCheckpoint()

    index = GraphIndex(
        prop_counts=prop_counts,
        edge_prop_counts=edge_prop_counts,
        type_counts=type_counts,
        names=name_counts.select("name"),
        ids=id_counts.select("id"),
        metadata=meta,
    )
    graph = BuiltGraph(
        groups=groups,
        merged=merged,
        nodes=meta,
        edges=edges,
        index=index,
        display_types=display_types(meta, type_counts),
        edge_summary=summary,
    )
    stats = {}
    if with_stats:
        stats = {
            "n_delta_rows": merged_delta.count(),
            "n_removed_rows": removed_old.count(),
            "n_born_nodes": born.count(),
            "n_vanished_nodes": vanished.count(),
            "n_new_edge_rows": new_edge_rows.count(),
        }
    return GraphState(
        rows=all_rows,
        graph=graph,
        config=config,
        counts=IndexCounts(name_counts=name_counts, id_counts=id_counts),
        delta_stats=stats,
    )


def _expand_affected_for_references(
    scan_rows: DataFrame,
    old_groups: DataFrame,
    groups: DataFrame,
    affected: DataFrame,
    member_ids: DataFrame,
    config: SubgraphConfig,
) -> tuple[DataFrame, DataFrame]:
    """Cross-clique reference invalidation.

    ``assign_ids`` rewrites every VALUE and PROP KEY through the groups
    table (02_assign_ids/.../main.rs:121-129), so a row in an otherwise
    unaffected clique that references an id whose canonical mapping just
    changed would be stale if passed through verbatim — its stored value
    still points at the OLD canonical. The rewrite cannot be patched in
    place on the merged rows (after a clique split, one old canonical
    maps back to several raw ids — the inverse is ambiguous), so the
    referencing cliques are folded into the affected set and re-merged
    from their raw rows. Their grouping is untouched, which also means
    no second-order propagation is possible: one pass reaches fixpoint.

    Scale shape: the remap set (ids in touched cliques whose mapping
    changed) is delta-sized, so the scan over the retained corpus is one
    map-side semi-join against a broadcast side — no shuffle. At rest, a
    value→entity inverted index turns even that scan into a point
    lookup.
    """
    om = old_groups.select("id", F.col("group_id").alias("__old_gid"))
    nm = groups.select("id", F.col("group_id").alias("__new_gid"))
    remap = (
        member_ids.join(om, "id", "left")
        .join(nm, "id", "left")
        .filter(
            F.coalesce("__old_gid", F.col("id"))
            != F.coalesce("__new_gid", F.col("id"))
        )
        .select("id")
    )
    remap = _pin(remap)
    ref_entities = (
        scan_rows.join(remap, scan_rows.value == remap.id, "left_semi")
        .unionByName(
            scan_rows.join(remap, scan_rows.prop_key == remap.id, "left_semi")
        )
        .select("datasource", "entity_id")
        .distinct()
    )
    ref_rows = scan_rows.join(ref_entities, ["datasource", "entity_id"], "left_semi")
    ref_canons = (
        extract_identifiers(ref_rows, config)
        .select("id")
        .distinct()
        .join(groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
    )
    affected = _pin(affected.unionByName(ref_canons).distinct())
    member_ids = _pin(
        member_ids.unionAll(
            groups.join(
                ref_canons, groups.group_id == ref_canons.node_id, "left_semi"
            ).select("id")
        )
        .unionAll(ref_canons.select(F.col("node_id").alias("id")))
        .distinct()
    )
    return affected, member_ids


def _split_old_merged(
    old_merged: DataFrame, groups: DataFrame, affected: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split the old merged frame on the NEW canonical of each row's
    node id: rows whose clique is affected are retired, the rest pass
    through. (An absorbed old canonical maps to a different new
    canonical, so the test must be against the row's new canonical.)"""
    with_canon = old_merged.join(
        groups.withColumnRenamed("id", "node_id").withColumnRenamed(
            "group_id", "new_canon"
        ),
        "node_id",
        "left",
    ).withColumn("new_canon", F.coalesce("new_canon", F.col("node_id")))
    unchanged = (
        with_canon.join(affected, with_canon.new_canon == affected.node_id, "left_anti")
        .drop("new_canon")
        .select(*old_merged.columns)
    )
    removed_old = (
        with_canon.join(affected, with_canon.new_canon == affected.node_id, "left_semi")
        .drop("new_canon")
        .select(*old_merged.columns)
    )
    return unchanged, removed_old


def add_datasource(
    state: GraphState,
    new_rows: DataFrame,
    prefix_map: PrefixMap | None = None,
    with_stats: bool = False,
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
    affected = _pin(
        ids_new.join(groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
    )
    # every member id of an affected clique (non-clique new ids map to
    # themselves — their singleton is "affected" too)
    member_ids = _pin(
        groups.join(affected, groups.group_id == affected.node_id, "left_semi")
        .select("id")
        .unionAll(affected.select(F.col("node_id").alias("id")))
        .distinct()
    )

    # -- 2b. cross-clique reference invalidation ------------------------
    # (scan the OLD corpus only: every new-source entity's clique is
    # already affected by construction of step 2)
    affected, member_ids = _expand_affected_for_references(
        state.rows, state.graph.groups, groups, affected, member_ids, config
    )

    # -- 3. re-merge affected cliques from pre-assignment rows ----------
    all_rows = state.rows.unionByName(new_rows)
    touched_entities = (
        extract_identifiers(all_rows, config)
        .join(member_ids, "id", "left_semi")
        .select("datasource", "entity_id")
        .distinct()
    )
    changed_rows = _pin(
        all_rows.join(touched_entities, ["datasource", "entity_id"], "left_semi")
    )
    merged_delta = merge_nodes(
        lift_types(assign_ids(changed_rows, groups, config), config), config
    )
    unchanged, removed_old = _split_old_merged(state.graph.merged, groups, affected)

    # -- 4. delta index + materialise over the clique-granular split ----
    return _delta_finish(
        state, groups, all_rows, unchanged, removed_old, merged_delta, with_stats
    )


def _regroup_after_removal(
    state: GraphState, remaining: DataFrame, removed: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The removal half of the grouping update: returns (groups,
    affected canonicals under the NEW mapping, member ids of the
    affected old cliques).

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
    """
    config = state.config
    old_groups = state.graph.groups

    removed_ids = extract_identifiers(removed, config).select("id").distinct()
    affected_old = _pin(
        removed_ids.join(old_groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
    )
    member_ids = _pin(
        old_groups.join(
            affected_old, old_groups.group_id == affected_old.node_id, "left_semi"
        )
        .select("id")
        .unionAll(affected_old.select(F.col("node_id").alias("id")))
        .distinct()
    )

    rem_ids = extract_identifiers(remaining, config)
    touched_entities = (
        rem_ids.join(member_ids, "id", "left_semi")
        .select("datasource", "entity_id")
        .distinct()
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
    # affected canonicals under the NEW mapping: every member id of an
    # affected old clique, mapped through the new groups (split cliques
    # yield several canonicals; ids that vanished entirely map to self)
    affected_new = _pin(
        member_ids.join(groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
    )
    return groups, affected_new, member_ids


def remove_datasource(
    state: GraphState, datasource: str, with_stats: bool = False
) -> GraphState:
    """Retire one datasource from the built graph — the hard inverse of
    ``add_datasource``: dropping a source's identifier pairs can SPLIT a
    clique into several components, each needing a fresh canonical
    election and re-merge, and entities that existed only in the retired
    source must vanish entirely. (Correctness argument:
    ``_regroup_after_removal``.)"""
    config = state.config
    remaining = state.rows.filter(F.col("datasource") != datasource)
    removed = state.rows.filter(F.col("datasource") == datasource)

    groups, affected, member_ids = _regroup_after_removal(state, remaining, removed)
    affected, member_ids = _expand_affected_for_references(
        remaining, state.graph.groups, groups, affected, member_ids, config
    )

    # re-merge the touched entities' remaining rows; pass the rest through
    rem_ids = extract_identifiers(remaining, config)
    touched_entities = (
        rem_ids.join(member_ids, "id", "left_semi")
        .select("datasource", "entity_id")
        .distinct()
    )
    changed_rows = _pin(
        remaining.join(touched_entities, ["datasource", "entity_id"], "left_semi")
    )
    merged_delta = merge_nodes(
        lift_types(assign_ids(changed_rows, groups, config), config), config
    )
    unchanged, removed_old = _split_old_merged(state.graph.merged, groups, affected)

    return _delta_finish(
        state, groups, remaining, unchanged, removed_old, merged_delta, with_stats
    )


def update_datasource(
    state: GraphState,
    datasource: str,
    new_rows: DataFrame,
    prefix_map: PrefixMap | None = None,
    with_stats: bool = False,
) -> GraphState:
    """Replace one datasource's rows in place — remove ∘ add FUSED so
    the expensive clique-granular stages (re-merge, delta index, delta
    materialise) run ONCE over the union of both phases' affected
    cliques, instead of paying two full delta passes. The grouping
    update runs its two cheap halves (split re-convergence, then
    new-pairs ∪ star-edges), both delta-scoped.

    This is the maintenance verb a real pipeline runs on every refreshed
    dump: same source name, new rows."""
    config = state.config
    if prefix_map:
        new_rows = normalise_prefixes(new_rows, prefix_map)
    remaining = state.rows.filter(F.col("datasource") != datasource)
    removed = state.rows.filter(F.col("datasource") == datasource)
    all_rows = remaining.unionByName(new_rows)

    # -- grouping phase 1: split on removal (delta-scoped CC) -----------
    g1, affected_r, member_r = _regroup_after_removal(state, remaining, removed)

    # -- grouping phase 2: fuse on the replacement's pairs --------------
    new_ids = extract_identifiers(new_rows, config)
    g1_star = g1.select(
        F.col("group_id").alias("src"), F.col("id").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    groups = build_groups(
        identifier_pairs(new_ids).unionAll(g1_star), config
    ).localCheckpoint()

    ids_new = new_ids.select("id").distinct()
    affected_a = (
        ids_new.join(groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .distinct()
    )
    # phase-1 affected canonicals re-mapped through the FINAL groups (a
    # split clique may have been re-fused by the replacement's pairs)
    affected = _pin(
        affected_r.withColumnRenamed("node_id", "id")
        .join(groups, "id", "left")
        .select(F.coalesce("group_id", F.col("id")).alias("node_id"))
        .unionAll(affected_a)
        .distinct()
    )
    member_ids = _pin(
        groups.join(affected, groups.group_id == affected.node_id, "left_semi")
        .select("id")
        .unionAll(affected.select(F.col("node_id").alias("id")))
        .unionAll(member_r.select("id"))
        .distinct()
    )
    affected, member_ids = _expand_affected_for_references(
        remaining, state.graph.groups, groups, affected, member_ids, config
    )

    # -- single re-merge over the union of both phases' cliques ---------
    touched_entities = (
        extract_identifiers(all_rows, config)
        .join(member_ids, "id", "left_semi")
        .select("datasource", "entity_id")
        .distinct()
    )
    changed_rows = _pin(
        all_rows.join(touched_entities, ["datasource", "entity_id"], "left_semi")
    )
    merged_delta = merge_nodes(
        lift_types(assign_ids(changed_rows, groups, config), config), config
    )
    unchanged, removed_old = _split_old_merged(state.graph.merged, groups, affected)

    return _delta_finish(
        state, groups, all_rows, unchanged, removed_old, merged_delta, with_stats
    )
