"""MetaboLights-style XML ingest (reference S11,
01_ingest/grebi_ingest_metabolights/ingest.py:8-57).

Two physical modes over one element→rows transform:

- ``xml_entries_to_nodes``: driver-side stdlib ElementTree parse of a
  single document — mirrors the reference's own 60-line script; right
  for one small file.
- ``xml_files_to_nodes``: the scale path — a DataFrame of file paths
  fanned out with ``mapInPandas`` so each executor parses its own files
  (the realistic large-XML corpus is many study files on shared
  storage, not one giant document). No shuffle; output partitioning
  follows the file distribution.

Both produce the same canonical long form (no spark-xml dependency in
this container; a splittable single-giant-file reader would slot in at
the same contract).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..schema import INGESTED


def _entry_rows(
    path: str,
    datasource: str,
    subgraph: str,
    entry_tag: str,
    id_attr: str,
    type_by_prefix: dict[str, str] | None,
) -> list[tuple]:
    """<entry id=..><field name=k>v</field><ref dbkey=../>...</entry> →
    long-form rows. Child elements map as:
      - <field name="k">v</field>      → prop k = v
      - <ref dbname="D" dbkey="K"/>    → prop xref = D:K
      - any other child with text      → prop <tag> = text
    """
    rows: list[tuple] = []
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
    return rows


def xml_entries_to_nodes(
    spark: SparkSession,
    path: str,
    datasource: str,
    subgraph: str = "default",
    entry_tag: str = "entry",
    id_attr: str = "id",
    type_by_prefix: dict[str, str] | None = None,
) -> DataFrame:
    """Driver-side parse of one XML document → long-form rows."""
    rows = _entry_rows(path, datasource, subgraph, entry_tag, id_attr, type_by_prefix)
    return spark.createDataFrame(rows, INGESTED)


def xml_files_to_nodes(
    spark: SparkSession,
    paths: list[str],
    datasource: str,
    subgraph: str = "default",
    entry_tag: str = "entry",
    id_attr: str = "id",
    type_by_prefix: dict[str, str] | None = None,
) -> DataFrame:
    """Distributed parse of an XML corpus: one task per file batch, each
    executor running the same element→rows transform over files it can
    reach on shared storage."""
    import pandas as pd

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    par = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    files_df = spark.createDataFrame([(p,) for p in paths], "path string").repartition(par)
    cols = [f.name for f in INGESTED.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for p in pdf["path"]:
                out.extend(
                    _entry_rows(
                        p, datasource, subgraph, entry_tag, id_attr, type_by_prefix
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return files_df.mapInPandas(parse, schema=INGESTED)
