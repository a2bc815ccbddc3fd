"""Scalar/array function library + the large-scale training-data-pipeline
operator families (dedup, similarity search, multimodal columns, text
analysis).

These go beyond the reference's own surface (BASELINE.json's north star):
at 100 TB an integration engine is also a corpus-preparation engine. Every
operator here is expressed with built-in JVM-side expressions where
possible; Python appears only as Arrow-batched UDFs in clearly-marked
slow paths (multimodal decode).
"""
