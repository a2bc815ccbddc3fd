"""Sinks — stage 06/07 of the reference (SURVEY.md §2.4): serve-ready
exports of the built graph.

neo4j_csv  K1/K2/J10  dynamic wide pivot to neo4j-admin import CSVs
solr_jsonl K4         provenance-stripped flat JSONL + referenced-name expansion
kv         K6         id → full-object JSON table (RocksDB replacement)
"""
