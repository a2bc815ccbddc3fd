"""SQLite ingest (reference S9,
01_ingest/grebi_ingest_sqlite/src/main.rs:24-96,98-151).

Discovers tables / primary keys / foreign keys via PRAGMA; each row
becomes a node ``{prefix:table:pk}`` and FK values are rewritten to the
referenced row's node id. SQLite files are single-machine artifacts by
nature, so discovery + row extraction run driver-side (stdlib sqlite3 →
Arrow → DataFrame); at scale the same transform would read via JDBC
partitioned on the rowid.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tsv import tsv_to_nodes


def _table_info(con: sqlite3.Connection, table: str):
    cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    pks = [c[1] for c in cols if c[5] > 0]
    fks = {
        fk[3]: (fk[2], fk[4])  # from_col -> (ref_table, ref_col)
        for fk in con.execute(f'PRAGMA foreign_key_list("{table}")').fetchall()
    }
    return [c[1] for c in cols], pks, fks


def sqlite_to_nodes(
    spark: SparkSession,
    path: str,
    prefix: str,
    subgraph: str = "default",
) -> DataFrame:
    """Every table row → one node; node id = ``prefix:table:pk``; FK cell
    values rewritten to ``prefix:ref_table:value``."""
    con = sqlite3.connect(path)
    try:
        tables = [
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table' AND name NOT LIKE 'sqlite_%'"
            )
        ]
        out: DataFrame | None = None
        for table in tables:
            cols, pks, fks = _table_info(con, table)
            if not pks:
                pks = [cols[0]]
            pdf = pd.read_sql_query(f'SELECT * FROM "{table}"', con)
            if pdf.empty:
                continue
            pdf = pdf.astype(object).where(pd.notnull(pdf), None)
            pdf["id"] = [
                f"{prefix}:{table}:" + ":".join(str(r[pk]) for pk in pks)
                for _, r in pdf.iterrows()
            ]
            for fk_col, (ref_table, _ref_col) in fks.items():
                if fk_col in pdf.columns:
                    pdf[fk_col] = pdf[fk_col].map(
                        lambda v, rt=ref_table: None if v is None else f"{prefix}:{rt}:{v}"
                    )
            pdf = pdf.astype(str).where(pdf.notnull(), None)
            wide = spark.createDataFrame(pdf)
            long = tsv_to_nodes(wide, datasource=prefix, subgraph=subgraph)
            long = long.unionByName(
                wide.select(
                    F.lit(subgraph).alias("subgraph"),
                    F.lit(prefix).alias("datasource"),
                    F.col("id").alias("entity_id"),
                    F.lit("grebi:type").alias("prop_key"),
                    F.lit(f"{prefix}:{table}").alias("value"),
                    F.lit(None).cast("string").alias("value_props"),
                )
            )
            out = long if out is None else out.unionByName(long)
        if out is None:
            raise ValueError(f"no non-empty tables found in {path}")
        return out
    finally:
        con.close()
