"""make_release: one call produces the reference's complete serving
handoff — Neo4j CSVs + import argv + index DDL, Solr JSONL cores +
schema + import plan, the executed KV store, summary.json, and a
manifest — and every artifact is readable/consistent."""

import json
import os

from grebi_spark.pipeline import build_graph
from grebi_spark.release import make_release
from grebi_spark.sinks.kv import kv_store_get

from .test_pipeline import CONFIG
from .test_state_versions import _tiny_sources


def test_make_release_end_to_end(spark, tmp_path):
    a, b = _tiny_sources(spark)
    graph = build_graph([a, b], CONFIG)
    out = str(tmp_path / "rel")
    manifest = make_release(graph, out, name="star")

    # manifest counts agree with the graph
    assert manifest["n_nodes"] == graph.nodes.count() == 3
    assert manifest["n_edges"] == graph.edges.count() == 1

    # neo4j: CSV parts exist and the argv references every part file
    parts = [
        p for p in manifest["artifacts"] if p.startswith("neo4j/nodes/part-")
    ]
    assert parts
    argv = manifest["neo4j_import_argv"]
    sh = open(os.path.join(out, "neo4j", "import_command.sh")).read()
    assert argv[0:4] == ["neo4j-admin", "database", "import", "full"]
    assert all(a in sh for a in argv)
    ddl = open(os.path.join(out, "neo4j", "create_indexes.cypher")).read()
    assert "CREATE INDEX node_id" in ddl

    # solr: docs parse as JSON, schema + import plan present
    ndocs = spark.read.json(os.path.join(out, "solr", "nodes"))
    assert ndocs.count() == 3
    schema = json.load(open(os.path.join(out, "solr", "schema.json")))
    assert any(f["name"] == "grebi__name" for f in schema)
    reqs = json.load(open(os.path.join(out, "solr", "import_requests.json")))
    assert reqs["grebi_nodes"][-1]["params"] == {"commit": "true"}

    # kv: executed point read returns the node document
    got = kv_store_get(os.path.join(out, "kv", "store.sqlite"), ["x:1"])
    assert "x:1" in got and "one" in got["x:1"]

    # summary: the served document matches the index frames
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["subgraph_name"] == "star"
    assert summary["types"]["t:A"]["count"] == 2

    # manifest lists every artifact it promises
    for p in ("summary.json", "metadata.json", "kv/store.sqlite"):
        assert p in manifest["artifacts"], p


def test_refresh_release_after_verb(spark, tmp_path):
    """A verb's deltas maintain the release in place: KV upsert + one
    new core segment + rewritten summary/manifest — no rebuild."""
    from grebi_spark.incremental import add_datasource, build_graph_stateful
    from grebi_spark.release import refresh_release
    from grebi_spark.sinks.solr_jsonl import read_solr_core

    a, b = _tiny_sources(spark)
    st1 = build_graph_stateful([a], CONFIG)
    out = str(tmp_path / "rel")
    make_release(st1.graph, out, name="star")
    st2 = add_datasource(st1, b)
    stats = refresh_release(st2, out)
    assert stats["kv"] and stats["solr_core"]

    # the executed stores serve the post-verb graph
    got = kv_store_get(os.path.join(out, "kv", "store.sqlite"), ["x:3"])
    assert "x:3" in got and "three" in got["x:3"]
    live = read_solr_core(spark, os.path.join(out, "solr", "core"), "nodes")
    assert live.count() == st2.graph.nodes.count() == 3

    # summary + manifest reflect the refreshed graph
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["types"]["t:B"]["count"] == 1
    manifest = json.load(open(os.path.join(out, "metadata.json")))
    assert manifest["n_nodes"] == 3
    assert manifest["refreshes"] == 1
    # the recounted KV rows reconcile against the refreshed store
    assert manifest["n_kv_rows"] >= 3
