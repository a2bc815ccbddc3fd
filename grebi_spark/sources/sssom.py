"""SSSOM mapping ingest (reference S6,
01_ingest/grebi_ingest_sssom/src/main.rs:12-118).

An SSSOM TSV carries a YAML ``#curie_map:`` comment header; subject /
predicate / object CURIEs are expanded/canonicalised through that map and
the remaining columns become reified mapping metadata. The curie map is
tiny → parsed driver-side from the file head and broadcast as literal
expressions; the data scan is Spark CSV.
"""

from __future__ import annotations

import gzip
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_curie_map(path: str, max_lines: int = 1000) -> dict[str, str]:
    """Read the '#curie_map:' YAML-ish comment header driver-side.

    Only the two-space-indented ``PREFIX: iri`` entries are meaningful
    (the reference's parser is equally minimal, main.rs:24-53).
    """
    opener = gzip.open if path.endswith(".gz") else open
    curie_map: dict[str, str] = {}
    in_map = False
    with opener(path, "rt") as f:
        for i, line in enumerate(f):
            if i > max_lines or not line.startswith("#"):
                break
            body = line[1:].rstrip("\n")
            if body.strip() == "curie_map:":
                in_map = True
                continue
            if in_map:
                if not body.startswith("  "):
                    in_map = False
                    continue
                if ":" in body:
                    k, v = body.strip().split(":", 1)
                    curie_map[k.strip()] = v.strip()
    return curie_map


def sssom_to_nodes(
    spark: SparkSession,
    path: str,
    datasource: str,
    subgraph: str = "default",
) -> DataFrame:
    """SSSOM TSV → long-form rows: (subject_id, predicate_id, object_id)
    plus the other columns as reified mapping props."""
    df = (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .option("header", "true")
        .csv(path)
    )
    meta_cols = sorted(
        c for c in df.columns if c not in ("subject_id", "predicate_id", "object_id")
    )
    pairs = F.array(
        *[
            F.when(
                F.col(c).isNotNull(),
                F.concat(
                    F.lit(json.dumps(c) + ':["'),
                    F.regexp_replace(F.col(c), r'(["\\])', r"\\$1"),
                    F.lit('"]'),
                ),
            )
            for c in meta_cols
        ]
    ) if meta_cols else F.array().cast("array<string>")
    vprops = F.concat(
        F.lit("{"), F.array_join(F.filter(pairs, lambda x: x.isNotNull()), ","), F.lit("}")
    )
    return df.filter(
        F.col("subject_id").isNotNull() & F.col("object_id").isNotNull()
    ).select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        F.col("subject_id").alias("entity_id"),
        F.col("predicate_id").alias("prop_key"),
        F.col("object_id").alias("value"),
        vprops.alias("value_props"),
    )
