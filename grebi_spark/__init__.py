"""grebi_spark — a PySpark-native knowledge-graph integration & analytics engine.

A from-scratch rebuild of the capabilities of EBISPOT/GrEBI (reference:
/root/reference, a Rust/Nextflow batch ETL pipeline) re-expressed as
declarative Spark DataFrame transformations, plus the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) such an engine needs at 100 TB scale.

Package layout
--------------
- ``session``    SparkSession builders tuned for local tests and cluster scale
- ``config``     SubgraphConfig — identifier props, equivalence seeds, excludes
- ``schema``     canonical long-form (EAV) entity schema + helpers
- ``sources``    scans: TSV, JSONL transforms, KGX, SSSOM, RDF n-quads, SQLite
- ``operators``  pipeline stages: normalise, identifiers, groups (connected
                 components), assign_ids, merge, index, materialise
- ``functions``  scalar/array function library + text analysis, dedup,
                 similarity search, multimodal plumbing
- ``plans``      the query surface (graph pattern match, search, facets,
                 closure) and benchmark queries
- ``sinks``      Neo4j CSV pivot, Solr JSONL, key-value (id→object) table
- ``streaming``  Structured Streaming variants of the ingest path
"""

__version__ = "0.1.0"
