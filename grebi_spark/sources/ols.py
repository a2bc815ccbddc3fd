"""OLS ontology-JSON ingest (reference S7,
01_ingest/grebi_ingest_ols/src/main.rs:31-328).

The reference stream-parses one giant JSON document
{"ontologies":[{classes:[...], properties:[...], individuals:[...]}]}.
Spark reads it with multiLine JSON (splittable after the per-ontology
explode); the per-entity logic — ontology whitelist, obsolete/imported
skip, qualified safe labels (:171-204) — is plain filter/withColumn.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ENTITY_KINDS = ("classes", "properties", "individuals")
KIND_TYPE = {
    "classes": "ols:Class",
    "properties": "ols:Property",
    "individuals": "ols:Individual",
}


def safe_label(label: Column) -> Column:
    """The reference's 'qualified safe label': squash a label to an
    alphanumeric+underscore identifier (grebi_ingest_ols/src/main.rs:195-202)."""
    return F.regexp_replace(F.trim(label), r"[^A-Za-z0-9_]+", "_")


def ols_to_nodes(
    spark: SparkSession,
    path: str,
    datasource: str = "ols",
    subgraph: str = "default",
    ontology_whitelist: tuple[str, ...] | None = None,
) -> DataFrame:
    """ontologies JSON → long-form INGESTED rows for Ontology / Class /
    Property / Individual entities."""
    raw = spark.read.option("multiLine", "true").json(path)
    onts = raw.select(F.explode("ontologies").alias("ont"))
    if ontology_whitelist:
        onts = onts.filter(F.col("ont.ontologyId").isin(list(ontology_whitelist)))
    onts = onts.persist()

    out: DataFrame | None = None

    def add(df):
        nonlocal out
        out = df if out is None else out.unionByName(df)

    # the ontology node itself
    ont_id = F.concat(F.lit("ols.ontology:"), F.col("ont.ontologyId"))
    base_cols = lambda eid: [  # noqa: E731
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        eid.alias("entity_id"),
    ]
    add(
        onts.select(
            *base_cols(ont_id),
            F.lit("id").alias("prop_key"),
            ont_id.alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        )
    )
    add(
        onts.select(
            *base_cols(ont_id),
            F.lit("grebi:type").alias("prop_key"),
            F.lit("ols:Ontology").alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        )
    )

    for kind in ENTITY_KINDS:
        if kind not in onts.select("ont.*").columns:
            continue
        ents = onts.select(
            F.col("ont.ontologyId").alias("ontology_id"),
            F.explode(f"ont.{kind}").alias("e"),
        )
        # skip obsolete and imported entities (reference behaviour)
        cols = ents.select("e.*").columns
        if "isObsolete" in cols:
            ents = ents.filter(
                F.coalesce(F.col("e.isObsolete").cast("boolean"), F.lit(False)) == False  # noqa: E712
            )
        if "imported" in cols:
            ents = ents.filter(
                F.coalesce(F.col("e.imported").cast("boolean"), F.lit(False)) == False  # noqa: E712
            )
        eid = F.col("e.curie")
        ents = ents.filter(eid.isNotNull()).persist()

        def prop(key_col, val_col):
            return ents.select(
                *base_cols(eid),
                key_col.alias("prop_key"),
                val_col.alias("value"),
                F.lit(None).cast("string").alias("value_props"),
            ).filter(F.col("value").isNotNull() & (F.col("value") != ""))

        add(prop(F.lit("id"), eid))
        add(prop(F.lit("grebi:type"), F.lit(KIND_TYPE[kind])))
        add(prop(F.lit("ols:ontologyId"), F.col("ontology_id")))
        if "label" in cols:
            add(prop(F.lit("ols:label"), F.col("e.label")))
            add(prop(F.lit("ols:safeLabel"), safe_label(F.col("e.label"))))
        if "iri" in cols:
            add(prop(F.lit("ols:iri"), F.col("e.iri")))
        for arr_field, key in (
            ("directAncestor", "ols:directAncestor"),
            ("directParent", "ols:directParent"),
            ("synonym", "ols:synonym"),
        ):
            if arr_field in cols:
                add(
                    ents.select(
                        *base_cols(eid),
                        F.lit(key).alias("prop_key"),
                        F.explode(f"e.{arr_field}").alias("value"),
                        F.lit(None).cast("string").alias("value_props"),
                    ).filter(F.col("value").isNotNull() & (F.col("value") != ""))
                )
    return out
