"""Scale utilities: graph persistence round-trip, salted join equivalence."""

from pyspark.sql import functions as F

from grebi_spark.config import SubgraphConfig
from grebi_spark.pipeline import build_graph
from grebi_spark.scale import read_graph_views, salted_join, skewed_key_report, write_graph


def _tiny_graph(spark):
    src = spark.createDataFrame(
        [
            ("s", "d", "a:1", "id", "a:1", None),
            ("s", "d", "a:1", "grebi:type", "T", None),
            ("s", "d", "a:1", "rel:to", "b:2", None),
            ("s", "d", "b:2", "id", "b:2", None),
            ("s", "d", "b:2", "grebi:type", "T", None),
        ],
        "subgraph string, datasource string, entity_id string, prop_key string, value string, value_props string",
    )
    return build_graph([src], SubgraphConfig(exclude_edges=("id",)))


def test_graph_roundtrip(spark, tmp_path):
    g = _tiny_graph(spark)
    out = str(tmp_path / "graph")
    write_graph(g, out, buckets=2)
    views = read_graph_views(spark, out)
    assert views["nodes"].count() == 2
    assert views["edges"].count() == 1
    assert spark.sql("select count(*) n from graph_props").collect()[0]["n"] == g.merged.count()


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(300)], ["k", "payload"]
    )
    small = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two")], ["k", "name"])
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt_buckets=4).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(spark):
    big = spark.createDataFrame([(1, "a"), (9, "b")], ["k", "payload"])
    small = spark.createDataFrame([(1, "one")], ["k", "name"])
    rows = sorted(
        map(tuple, salted_join(big, small, "k", 4, "left").select("k", "name").collect())
    )
    assert rows == [(1, "one"), (9, None)]


def test_skew_report(spark):
    df = spark.createDataFrame([(1,)] * 50 + [(2,)] * 3, ["k"])
    top = skewed_key_report(df, "k").collect()
    assert top[0]["k"] == 1 and top[0]["n"] == 50


def test_mega_clique_100k_aliases_within_memory_bounds(spark):
    """Pathological equivalence clique — 100k entities all aliased to
    one hub id (the reference's >50 warning canary fires, but the
    ENGINE must survive): one hot groupBy key flows through CC,
    canonical election, the J2 provenance merge and node_table. The
    merge's datasource buffers dedup in-buffer (collect_set), so the
    hot key's memory is proportional to DISTINCT provenance, not the
    100k input rows; the inherently-large artifacts (the hub node's
    100k-element source_ids array) are the data model's own output,
    same as the reference's. Wall time is recorded in PERFORMANCE.md;
    this gate asserts completion + exact row-level correctness."""
    import time

    from grebi_spark.pipeline import build_graph

    n = 100_000
    base = spark.range(n)
    eid = F.concat(F.lit("x:"), F.col("id").cast("string"))

    def row(key, val):
        return (
            F.lit("mega").alias("subgraph"),
            F.lit("megads").alias("datasource"),
            eid.alias("entity_id"),
            F.lit(key).alias("prop_key"),
            val.alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        )

    src = (
        base.select(*row("id", eid))
        .unionAll(base.select(*row("id", F.lit("dup:hub"))))
        .unionAll(base.select(*row("grebi:type", F.lit("thing:T"))))
        .unionAll(
            base.select(
                *row(
                    "grebi:name",
                    F.concat(F.lit("name"), (F.col("id") % 100).cast("string")),
                )
            )
        )
    )
    t0 = time.perf_counter()
    g = build_graph([src], SubgraphConfig(exclude_edges=("id",)))
    nodes = g.nodes.collect()
    wall = time.perf_counter() - t0
    # the whole clique fused into ONE canonical node
    assert len(nodes) == 1
    hub = nodes[0]
    assert hub["types"] == ["thing:T"]
    assert hub["datasources"] == ["megads"]
    merged = g.merged
    # provenance dedup: the type row carries ONE datasource entry
    type_row = merged.filter(F.col("prop_key") == "grebi:type").collect()
    assert len(type_row) == 1
    assert type_row[0]["datasources"] == ["megads"]
    # 100 distinct names survive as 100 merged rows
    assert merged.filter(F.col("prop_key") == "grebi:name").count() == 100
    # the global id rewrite maps every alias VALUE to the canonical, so
    # the id rows collapse to ONE merged row whose source_ids provenance
    # carries the full alias set — the inherently-large, data-model-true
    # artifact (one 100k-element array row, not 100k rows)
    id_rows = merged.filter(F.col("prop_key") == "id").collect()
    assert len(id_rows) == 1
    assert len(id_rows[0]["source_ids"]) == n + 1  # aliases + hub id
    assert len(hub["source_ids"]) == n + 1
    print(f"mega-clique 100k: {wall:.1f}s", flush=True)
