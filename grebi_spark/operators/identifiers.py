"""N2 — identifier extraction.

Reference: 02_assign_ids/grebi_extract_identifiers/src/main.rs:28-129 —
project the values of the configured identifier properties (including
values inside reified statements) into one co-identifier set per entity;
reject short all-numeric ids (ambiguous — grebi_shared/src/lib.rs:10-23).

Long form makes this a filter + select; the ambiguity check is a single
regexp predicate (a value passes if it is ≥16 chars OR contains any
non-digit — blank ids fail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import SubgraphConfig


def is_valid_identifier(col: Column) -> Column:
    """grebi_shared::check_id — long numerics are UUID-ish and fine;
    short pure-numeric (or empty) ids are rejected."""
    return (F.length(col) >= 16) | col.rlike("[^0-9]")


def extract_identifiers(nodes_long: DataFrame, config: SubgraphConfig) -> DataFrame:
    """→ (datasource, entity_id, id): every alias of every entity.

    The entity's own ``entity_id`` is included (it is the value of its
    ``id`` property by construction).
    """
    ids = (
        nodes_long.filter(F.col("prop_key").isin(list(config.identifier_props)))
        .select("datasource", "entity_id", F.col("value").alias("id"))
        .unionAll(
            nodes_long.select(
                "datasource", "entity_id", F.col("entity_id").alias("id")
            )
        )
        .filter(F.col("id").isNotNull() & is_valid_identifier(F.col("id")))
        .distinct()
    )
    return ids


def identifier_pairs(identifiers: DataFrame) -> DataFrame:
    """Co-identifier edges for the equivalence graph: star edges from each
    entity's first (min) alias to its other aliases — same connected
    components as the clique, O(k) not O(k²) edges per entity
    (the reference's union-find consumes the aliases incrementally the
    same way, 02_assign_ids/grebi_identifiers2groups/src/main.rs:77-115).
    """
    anchored = identifiers.groupBy("datasource", "entity_id").agg(
        F.min("id").alias("src"), F.collect_set("id").alias("ids")
    )
    return (
        anchored.select("src", F.explode("ids").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
