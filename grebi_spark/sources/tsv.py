"""TSV/CSV scans (reference S1, S12).

grebi_tsv2jsonl (01_ingest/grebi_tsv2jsonl/src/main.rs:23-126) semantics:
header (or supplied column list), ``#`` comment skip, per-cell array split
on a delimiter, empty fields dropped. Here: Spark's CSV reader (pushdown,
splittable, .gz-aware) + a driver-side melt to long form built from the
*static* column list — the unpivot is a ``stack``-style explode of
per-column structs, no shuffle, fully codegen'd.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tsv(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    columns: list[str] | None = None,
    comment: str = "#",
) -> DataFrame:
    reader = (
        spark.read.option("sep", sep)
        .option("comment", comment)
        .option("header", "false" if columns else "true")
    )
    df = reader.csv(path)
    if columns:
        df = df.toDF(*columns)
    return df


def tsv_to_nodes(
    df: DataFrame,
    datasource: str,
    subgraph: str = "default",
    id_col: str = "id",
    array_delimiter: str | None = None,
    ignore_empty: bool = True,
) -> DataFrame:
    """Wide table → long-form INGESTED rows.

    Every cell becomes (entity_id, prop_key, value); a cell containing the
    array delimiter becomes several rows (--tsv-array-delimiter,
    main.rs:95-112). Empty cells are dropped (--tsv-ignore-empty-fields).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("prop_key"), F.col(c).cast("string").alias("raw")
            )
            for c in df.columns
        ]
    )
    out = (
        df.select(F.col(id_col).cast("string").alias("entity_id"), cells.alias("cells"))
        .filter(F.col("entity_id").isNotNull())
        .select("entity_id", F.explode("cells").alias("cell"))
        .select("entity_id", F.col("cell.prop_key"), F.col("cell.raw"))
    )
    if array_delimiter:
        # the reference's --tsv-array-delimiter is a LITERAL string;
        # F.split takes a Java regex, so quote it ('|' would otherwise
        # split every character)
        out = out.select(
            "entity_id",
            "prop_key",
            F.explode(
                F.split(F.col("raw"), F.lit(re.escape(array_delimiter)), -1)
            ).alias("value"),
        )
    else:
        out = out.withColumnRenamed("raw", "value")
    if ignore_empty:
        out = out.filter(F.col("value").isNotNull() & (F.col("value") != ""))
    return out.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        "entity_id",
        "prop_key",
        "value",
        F.lit(None).cast("string").alias("value_props"),
    )


def mapping_tsv_to_nodes(
    df: DataFrame,
    datasource: str,
    subgraph: str = "default",
    left_col: str | None = None,
    right_col: str | None = None,
) -> DataFrame:
    """2-column mapping TSV → {id, grebi:equivalentTo} rows (reference S12,
    01_ingest/grebi_ingest_mondo_efo_mappings/ingest.py:12-15)."""
    lc = left_col or df.columns[0]
    rc = right_col or df.columns[1]
    base = df.filter(F.col(lc).isNotNull() & F.col(rc).isNotNull())
    return base.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        F.col(lc).cast("string").alias("entity_id"),
        F.lit("grebi:equivalentTo").alias("prop_key"),
        F.col(rc).cast("string").alias("value"),
        F.lit(None).cast("string").alias("value_props"),
    ).unionAll(
        base.select(
            F.lit(subgraph).alias("subgraph"),
            F.lit(datasource).alias("datasource"),
            F.col(lc).cast("string").alias("entity_id"),
            F.lit("id").alias("prop_key"),
            F.col(lc).cast("string").alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        )
    )
