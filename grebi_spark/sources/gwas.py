"""GWAS catalog ingest (reference S2): two fixed-schema TSVs →
gwas:SNP nodes carrying reified ``gwas:associated_with`` statements, and
gwas:Study nodes.

Reference: 01_ingest/grebi_ingest_gwas/src/main.rs:23-47,
write_associations.rs:13-146, write_studies.rs:12-100, check_headers.rs.
Header assertion = schema check; empty fields dropped
(remove_empty_fields.rs); comma-separated trait URIs exploded; PUBMEDID
value-prefixed ``pmid:``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSOCIATION_COLUMNS = (
    "SNPS",
    "MAPPED_TRAIT_URI",
    "P-VALUE",
    "OR or BETA",
    "STUDY ACCESSION",
    "MAPPED_GENE",
    "SNP_GENE_IDS",
)
STUDY_COLUMNS = ("STUDY ACCESSION", "PUBMEDID", "DISEASE/TRAIT", "MAPPED_TRAIT_URI")


def check_headers(df: DataFrame, required: tuple[str, ...], what: str) -> None:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"gwas {what} file is missing expected columns: {missing}")


def _vprops(cols: list[str]) -> F.Column:
    pairs = F.array(
        *[
            F.when(
                F.col(c).isNotNull() & (F.col(c) != ""),
                F.concat(
                    F.lit(json.dumps(f"gwas:{c}") + ':["'),
                    F.regexp_replace(F.col(c).cast("string"), r'(["\\])', r"\\$1"),
                    F.lit('"]'),
                ),
            )
            for c in sorted(cols)
        ]
    )
    return F.concat(
        F.lit("{"), F.array_join(F.filter(pairs, lambda x: x.isNotNull()), ","), F.lit("}")
    )


def gwas_associations_to_nodes(
    assoc: DataFrame, datasource: str = "gwas", subgraph: str = "default"
) -> DataFrame:
    """Associations TSV (wide) → long-form rows: one gwas:SNP entity per
    SNP with a reified ``gwas:associated_with`` value per mapped trait."""
    check_headers(assoc, ASSOCIATION_COLUMNS, "associations")
    stmt_cols = [c for c in ASSOCIATION_COLUMNS if c not in ("SNPS", "MAPPED_TRAIT_URI")]
    base = assoc.filter(F.col("SNPS").isNotNull()).select(
        F.col("SNPS").alias("entity_id"),
        F.explode(F.split(F.col("MAPPED_TRAIT_URI"), r",\s*", -1)).alias("trait"),
        _vprops(stmt_cols).alias("value_props"),
    ).filter(F.col("trait") != "")
    assoc_rows = base.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        "entity_id",
        F.lit("gwas:associated_with").alias("prop_key"),
        F.col("trait").alias("value"),
        "value_props",
    )
    snps = assoc.filter(F.col("SNPS").isNotNull()).select("SNPS").distinct()
    id_rows = snps.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        F.col("SNPS").alias("entity_id"),
        F.lit("id").alias("prop_key"),
        F.col("SNPS").alias("value"),
        F.lit(None).cast("string").alias("value_props"),
    )
    type_rows = snps.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        F.col("SNPS").alias("entity_id"),
        F.lit("grebi:type").alias("prop_key"),
        F.lit("gwas:SNP").alias("value"),
        F.lit(None).cast("string").alias("value_props"),
    )
    return assoc_rows.unionAll(id_rows).unionAll(type_rows)


def gwas_studies_to_nodes(
    studies: DataFrame, datasource: str = "gwas", subgraph: str = "default"
) -> DataFrame:
    """Studies TSV → gwas:Study nodes; PUBMEDID value-prefixed pmid:."""
    check_headers(studies, STUDY_COLUMNS, "studies")
    sid = F.col("STUDY ACCESSION")
    base = studies.filter(sid.isNotNull())

    def row(key, val):
        return base.select(
            F.lit(subgraph).alias("subgraph"),
            F.lit(datasource).alias("datasource"),
            sid.alias("entity_id"),
            F.lit(key).alias("prop_key"),
            val.alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        ).filter(F.col("value").isNotNull() & (F.col("value") != ""))

    return (
        row("id", sid)
        .unionAll(row("grebi:type", F.lit("gwas:Study")))
        .unionAll(row("gwas:pubmedId", F.concat(F.lit("pmid:"), F.col("PUBMEDID"))))
        .unionAll(row("gwas:diseaseTrait", F.col("DISEASE/TRAIT")))
        .unionAll(
            base.select(
                F.lit(subgraph).alias("subgraph"),
                F.lit(datasource).alias("datasource"),
                sid.alias("entity_id"),
                F.lit("gwas:mappedTrait").alias("prop_key"),
                F.explode(F.split(F.col("MAPPED_TRAIT_URI"), r",\s*", -1)).alias("value"),
                F.lit(None).cast("string").alias("value_props"),
            ).filter(F.col("value") != "")
        )
    )
