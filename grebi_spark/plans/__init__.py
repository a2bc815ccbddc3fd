"""Query surface.

``relational`` — the generic operator inventory (joins incl. semi/anti,
aggregation, top-k, distinct, set ops, JSON extraction) exercised on the
harness star schema with DuckDB-oracle parity.
``search``     — the Solr-semantics subset (weighted search, facets,
autocomplete, edge pages; SURVEY.md §2.5 Q6–Q8).
``closure``    — variable-length-path / transitive-closure utility (Q4).
``parity``     — the graph pipeline itself (melt → merge → materialise →
equivalence groups) run on relational inputs so the *pipeline operators*
are oracle-checkable against plain SQL.
"""
