"""GraphML export — parity for the reference's notebook export path
(notebooks/fipronil.ipynb: ``apoc.export.graphml.query(...)`` streams a
GraphML document of a query's subgraph for downstream tools like
Cytoscape/Gephi/yEd).

Spark design: each node/edge row renders to its XML element as a pure
string expression (escape + concat, whole-stage codegen — no Python),
so element generation is distributed and linear; the document assembly
(header, keys, elements, footer) is an ordered union of line rows.
Exports are subgraph-sized by construction (the notebook exports a
2-hop neighbourhood), so writing them as one file via a single ordered
partition is the intended use; for bulk dumps write the element frames
unassembled as sharded text and cat the header on at serve time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">'
)
_KEYS = (
    '<key id="labels" for="node" attr.name="labels" attr.type="string"/>\n'
    '<key id="datasources" for="node" attr.name="datasources" attr.type="string"/>\n'
    '<key id="sourceIds" for="node" attr.name="sourceIds" attr.type="string"/>\n'
    '<key id="names" for="node" attr.name="names" attr.type="string"/>\n'
    '<key id="label" for="edge" attr.name="label" attr.type="string"/>\n'
    '<key id="edgeDatasources" for="edge" attr.name="edgeDatasources" attr.type="string"/>\n'
    '<graph id="G" edgedefault="directed">'
)
_FOOTER = "</graph>\n</graphml>"


def xml_escape(c: Column) -> Column:
    """&, <, >, \" escaped for attribute/text context (& first so the
    other entities aren't double-escaped)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&quot;")
    return c


def _data(key: str, value: Column) -> Column:
    return F.concat(
        F.lit(f'<data key="{key}">'), xml_escape(value), F.lit("</data>")
    )


def graphml_node_elements(nodes: DataFrame) -> DataFrame:
    """One ``<node>`` element per graph node (labels = GraphNode + types,
    matching the Neo4j :LABEL the apoc export would see)."""
    labels = F.concat(
        F.lit(":GraphNode"),
        F.when(
            F.size("types") > 0,
            F.concat(F.lit(":"), F.array_join("types", ":")),
        ).otherwise(F.lit("")),
    )
    el = F.concat(
        F.lit('<node id="'),
        xml_escape(F.col("node_id")),
        F.lit('" labels="'),
        xml_escape(labels),
        F.lit('">'),
        _data("labels", labels),
        _data("datasources", F.array_join("datasources", ";")),
        _data("sourceIds", F.array_join("source_ids", ";")),
        _data("names", F.array_join("names", ";")),
        F.lit("</node>"),
    )
    return nodes.select(F.col("node_id").alias("sort_key"), el.alias("line"))


def graphml_edge_elements(edges: DataFrame) -> DataFrame:
    """One ``<edge>`` element per materialised edge."""
    el = F.concat(
        F.lit('<edge id="'),
        xml_escape(F.col("edge_id")),
        F.lit('" source="'),
        xml_escape(F.col("from_id")),
        F.lit('" target="'),
        xml_escape(F.col("to_id")),
        F.lit('" label="'),
        xml_escape(F.col("edge_type")),
        F.lit('">'),
        _data("label", F.col("edge_type")),
        _data("edgeDatasources", F.array_join("datasources", ";")),
        F.lit("</edge>"),
    )
    return edges.select(F.col("edge_id").alias("sort_key"), el.alias("line"))


def graphml_document(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """The full GraphML document as ordered (section, sort_key, line)
    rows: header/keys, nodes, edges, footer. ``orderBy(section,
    sort_key)`` yields the document top to bottom deterministically."""
    spark = nodes.sparkSession
    pre = spark.createDataFrame(
        [(0, "0", _HEADER), (0, "1", _KEYS), (3, "0", _FOOTER)],
        "section int, sort_key string, line string",
    )
    n = graphml_node_elements(nodes).select(
        F.lit(1).alias("section"), "sort_key", "line"
    )
    e = graphml_edge_elements(edges).select(
        F.lit(2).alias("section"), "sort_key", "line"
    )
    return pre.unionByName(n).unionByName(e).orderBy("section", "sort_key")


def graphml_string(nodes: DataFrame, edges: DataFrame) -> str:
    """Collect the document as one string — the apoc ``stream:true``
    shape the notebook writes to a local .graphml file.

    BOUNDEDNESS: the collect() here is a deliberate driver-side
    assembly and assumes an export-sized (notebook 2-hop
    neighbourhood) subgraph — element RENDERING is distributed
    (graphml_document), only the final line join is driver-side. For
    an unbounded graph use ``write_graphml``, which never collects."""
    return "\n".join(r["line"] for r in graphml_document(nodes, edges).collect())


def write_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """Write the document as a single ordered text file under ``path``."""
    graphml_document(nodes, edges).coalesce(1).select("line").write.mode(
        "overwrite"
    ).text(path)
