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
