"""Q10 — the batch query runner.

Reference: 08_run_queries/run_queries.slurm.py:20-60 executes every
queries/*.cypher against the built Neo4j and writes CSVs
(queries/run_query.py:6-14). The engine-native equivalent runs BOTH
dialects over the built graph: ``.cypher`` files through the
plans.cypher subset translator (the reference's own query files run
unchanged) and ``.sql`` files through spark.sql over the registered
views — parse/analyze/optimize/execute is Catalyst either way.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

from ..pipeline import BuiltGraph, register_views


def run_query_files(
    spark: SparkSession,
    graph: BuiltGraph,
    queries_dir: str,
    out_dir: str,
    max_records_per_file: int = 1_000_000,
) -> dict[str, int]:
    """Run every .sql file in queries_dir; write one CSV dir per query.

    ``maxRecordsPerFile`` is the J3 size-bounded-split equivalent
    (the reference pipes merged output through `split -C 1GB`,
    nextflow/01_create_subgraph.nf:192-197).
    """
    from .cypher import run_cypher

    register_views(graph, spark)
    results: dict[str, int] = {}
    for fname in sorted(os.listdir(queries_dir)):
        if not (fname.endswith(".sql") or fname.endswith(".cypher")):
            continue
        name, ext = fname.rsplit(".", 1)
        with open(os.path.join(queries_dir, fname)) as f:
            text = f.read()
        try:
            df = run_cypher(graph, text) if ext == "cypher" else spark.sql(text)
            (
                df.write.mode("overwrite")
                .option("header", True)
                .option("maxRecordsPerFile", max_records_per_file)
                .csv(os.path.join(out_dir, name))
            )
            results[name] = df.count()
        except Exception as exc:  # mirror the reference: a bad query logs, the batch continues
            print(f"query {name} failed: {exc}", file=sys.stderr)
            results[name] = -1
    return results
