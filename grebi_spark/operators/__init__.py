"""Pipeline operators — stages 01–05 of the reference re-expressed as pure
DataFrame→DataFrame functions (SURVEY.md §2.2/§2.3).

normalise     N1  prefix canonicalisation (IRI→CURIE) of every string
identifiers   N2  identifier extraction
groups        N3  equivalence cliques = connected components + canonical id
assign_ids    N4  id assignment + global string/key rewrite
type_lifting  N5  ontology superclass lifting into grebi:type
merge         J2 + N6/N7  provenance-preserving clique merge
index         J4  global aggregates + node metadata side table
materialise   J5–J8  edge materialisation, _refs, displayType, edge summary
"""
