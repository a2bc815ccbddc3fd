"""MetaboLights-style XML ingest (reference S11,
01_ingest/grebi_ingest_metabolights/ingest.py:8-57).

The reference's own implementation is a 60-line driver-side Python script;
ours mirrors that honestly: stdlib ElementTree parse of entry elements →
rows → DataFrame (no spark-xml dependency in this container). For large
XML at scale the same per-entry transform would run over a splittable
reader (spark-xml) — the downstream long-form contract is identical.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ..schema import INGESTED


def xml_entries_to_nodes(
    spark: SparkSession,
    path: str,
    datasource: str,
    subgraph: str = "default",
    entry_tag: str = "entry",
    id_attr: str = "id",
    type_by_prefix: dict[str, str] | None = None,
) -> DataFrame:
    """<entry id=..><field name=k>v</field><ref dbkey=../>...</entry> →
    long-form rows. Child elements map as:
      - <field name="k">v</field>      → prop k = v
      - <ref dbname="D" dbkey="K"/>    → prop xref = D:K
      - any other child with text      → prop <tag> = text
    """
    rows = []
    for _, elem in ET.iterparse(path):
        if elem.tag != entry_tag:
            continue
        eid = elem.get(id_attr)
        if not eid:
            elem.clear()
            continue
        etype = None
        if type_by_prefix:
            for pfx, t in type_by_prefix.items():
                if eid.startswith(pfx):
                    etype = t
                    break
        rows.append((subgraph, datasource, eid, "id", eid, None))
        if etype:
            rows.append((subgraph, datasource, eid, "grebi:type", etype, None))
        for child in elem:
            if child.tag == "field" and child.get("name") and child.text:
                rows.append(
                    (subgraph, datasource, eid, child.get("name"), child.text.strip(), None)
                )
            elif child.tag == "ref" and child.get("dbkey"):
                val = (
                    f"{child.get('dbname')}:{child.get('dbkey')}"
                    if child.get("dbname")
                    else child.get("dbkey")
                )
                rows.append((subgraph, datasource, eid, "xref", val, None))
            elif child.text and child.text.strip():
                rows.append(
                    (subgraph, datasource, eid, child.tag, child.text.strip(), None)
                )
        elem.clear()
    return spark.createDataFrame(rows, INGESTED)
