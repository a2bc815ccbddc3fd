"""Structural invariants for the graph-analytics operators — properties
that must hold on ANY input, complementing the value-exact oracle
parity tests (test_oracle_parity covers result equality; these cover
the algebra the algorithms rely on).
"""

import pytest
from pyspark.sql import functions as F

from grebi_spark.plans import graph_analytics as ga


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    return ga._copurchase_edges(spark, sf_dir)


def test_projection_is_symmetric_and_irreflexive(spark, sf_dir, edges):
    """(u,v) present iff (v,u) present; no self-loops — the contract
    every symmetric-graph algorithm here assumes."""
    assert edges.filter(F.col("u") == F.col("v")).count() == 0
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    assert edges.exceptAll(rev).count() == 0


def test_pagerank_mass_bounds(spark, sf_dir):
    """Every rank must be >= the teleport mass, and the total mass must
    not exceed the initial total (integer division only loses mass)."""
    ranks = ga.pagerank_copurchase(spark, sf_dir)
    rows = ranks.collect()
    assert all(r["rank"] >= ga._PR_TELEPORT for r in rows)
    n_nodes = ga._copurchase_edges(spark, sf_dir).select("u").distinct().count()
    total = sum(r["rank"] for r in rows)  # top-k only, so <= full mass
    assert total <= n_nodes * ga._PR_SCALE


def test_bfs_hop_zero_is_source_only(spark, sf_dir):
    hist = {r["d"]: r["n_nodes"] for r in ga.bfs_hops_copurchase(spark, sf_dir).collect()}
    assert hist.get(0) == 1
    # reached nodes never exceed the graph's node count
    n_nodes = ga._copurchase_edges(spark, sf_dir).select("u").distinct().count()
    assert sum(hist.values()) <= n_nodes


def test_degree_distribution_totals(spark, sf_dir, edges):
    """Sum(degree * n_nodes) must equal the directed edge count — the
    handshake lemma on the symmetric list."""
    dist = ga.degree_distribution(spark, sf_dir)
    total_deg = dist.select(
        F.sum(F.col("degree") * F.col("n_nodes")).alias("s")
    ).collect()[0]["s"]
    assert total_deg == edges.count()


def test_lpa_labels_are_minima(spark, sf_dir):
    """A community label must be a member node id — min-label
    propagation can only ever assign an id that exists in the graph."""
    comms = ga.label_propagation_communities(spark, sf_dir).collect()
    nodes = {
        r["u"]
        for r in ga._strong_edges(spark, sf_dir).select("u").distinct().collect()
    }
    assert all(r["community"] in nodes for r in comms)


def test_sssp_costs_monotone_in_rounds(spark, sf_dir):
    """Bounded Bellman-Ford costs are reachability-consistent: every
    returned cost is positive and at least the cheapest single edge."""
    rows = ga.weighted_paths_copurchase(spark, sf_dir).collect()
    assert all(r["cost"] > 0 for r in rows)
    assert rows == sorted(rows, key=lambda r: (r["cost"], r["node"]))


def test_jaccard_bounds(spark, sf_dir):
    """0 < jaccard <= 1 and shared <= min(set sizes) by construction."""
    rows = ga.node_jaccard_similar(spark, sf_dir).collect()
    assert all(0 < r["jaccard"] <= 1 for r in rows)


def test_weighted_artifact_wd_is_distinct_order_count(spark, sf_dir):
    """The artifact's wd column (node_jaccard_similar's numerator since
    r9) must equal the distinct-(part,order) self-join count it
    replaced, for EVERY pair — and never exceed the raw multiplicity w."""
    from pyspark.sql import functions as F

    from grebi_spark.session import load_tables

    half = ga.weighted_half_edges(spark, sf_dir).select("u", "v", "w", "wd")
    li = (
        load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
        .select(
            F.col("l_partkey").cast("long").alias("p"),
            F.col("l_orderkey").cast("long").alias("o"),
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    truth = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count("*").alias("t"))
    )
    joined = half.join(truth, ["u", "v"], "full_outer")
    mismatch = joined.filter(
        F.col("wd").isNull() | F.col("t").isNull() | (F.col("wd") != F.col("t"))
    )
    assert mismatch.limit(1).count() == 0
    assert half.filter(F.col("wd") > F.col("w")).limit(1).count() == 0
