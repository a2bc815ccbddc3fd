"""GraphML export (apoc.export.graphml parity): the document must be
well-formed XML, escape special characters, carry every node/edge with
its labels/properties, and compose with subgraph_all exactly like the
fipronil notebook's export flow.
"""

import xml.etree.ElementTree as ET

from grebi_spark.sinks.graphml import graphml_string, write_graphml

NS = "{http://graphml.graphdrawing.org/xmlns}"


def _frames(spark):
    nodes = spark.createDataFrame(
        [
            ("a&1", "s", ["ds<1"], ["a&1"], ["T\"x\""], ["Name <&> quoted"]),
            ("b2", "s", ["ds2"], ["b2", "b2alt"], [], []),
        ],
        "node_id string, subgraph string, datasources array<string>, "
        "source_ids array<string>, types array<string>, names array<string>",
    )
    edges = spark.createDataFrame(
        [("e1", "a&1", "rel<x>", "b2", ["ds<1"])],
        "edge_id string, from_id string, edge_type string, to_id string, "
        "datasources array<string>",
    )
    return nodes, edges


def test_graphml_wellformed_and_escaped(spark):
    nodes, edges = _frames(spark)
    doc = graphml_string(nodes, edges)
    root = ET.fromstring(doc)  # raises on malformed XML / bad escaping
    graph = root.find(f"{NS}graph")
    xnodes = graph.findall(f"{NS}node")
    xedges = graph.findall(f"{NS}edge")
    assert len(xnodes) == 2 and len(xedges) == 1
    byid = {n.get("id"): n for n in xnodes}
    assert set(byid) == {"a&1", "b2"}  # entities round-tripped by the parser
    assert byid["a&1"].get("labels") == ':GraphNode:T"x"'
    data = {
        d.get("key"): d.text for d in byid["a&1"].findall(f"{NS}data")
    }
    assert data["names"] == "Name <&> quoted"
    assert data["datasources"] == "ds<1"
    e = xedges[0]
    assert (e.get("source"), e.get("target"), e.get("label")) == (
        "a&1",
        "b2",
        "rel<x>",
    )


def test_graphml_file_roundtrip(spark, tmp_path):
    nodes, edges = _frames(spark)
    out = str(tmp_path / "export.graphml")
    write_graphml(nodes, edges, out)
    import glob

    [part] = glob.glob(f"{out}/part-*")
    root = ET.parse(part).getroot()
    graph = root.find(f"{NS}graph")
    assert len(graph.findall(f"{NS}node")) == 2
    assert len(graph.findall(f"{NS}edge")) == 1


def test_graphml_of_subgraph_all(graph):
    """The notebook flow end-to-end: resolve seed → subgraphAll(2) →
    GraphML document; every exported edge endpoint is an exported node."""
    from grebi_spark.plans.graph_queries import subgraph_all

    nodes, edges = subgraph_all(graph, "chebi:6801", max_level=2)
    doc = graphml_string(nodes, edges)
    root = ET.fromstring(doc)
    g = root.find(f"{NS}graph")
    node_ids = {n.get("id") for n in g.findall(f"{NS}node")}
    assert len(node_ids) >= 2
    for e in g.findall(f"{NS}edge"):
        assert e.get("source") in node_ids and e.get("target") in node_ids


from .test_graph_queries import graph  # noqa: F401,E402  (module fixture)


def test_cytoscape_of_subgraph_all(graph):  # noqa: F811
    """The notebook's other export: subgraphAll(2) → cytoscape_data
    JSON; shape and referential integrity."""
    from grebi_spark.plans.graph_queries import subgraph_all
    from grebi_spark.sinks.cytoscape import cytoscape_json

    nodes, edges = subgraph_all(graph, "chebi:6801", max_level=2)
    doc = cytoscape_json(nodes, edges)
    assert doc["directed"] and doc["multigraph"]
    ids = {n["data"]["id"] for n in doc["elements"]["nodes"]}
    assert len(ids) >= 2
    for n in doc["elements"]["nodes"]:
        assert n["data"]["ids"] == n["data"]["id"]
        assert isinstance(n["data"]["grebi:type"], list)
    for e in doc["elements"]["edges"]:
        assert e["data"]["source"] in ids and e["data"]["target"] in ids
