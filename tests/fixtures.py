"""GrEBI-shaped fixture datasources (FIXTURES.md §1) as in-memory JSONL/TSV.

Small enough to eyeball, rich enough to exercise: array cells, reified
values, cross-datasource equivalence (owl:sameAs / skos:exactMatch /
shared ensembl id), property-name merging, type lifting, untyped-node
elimination, self-referential-edge excludes.
"""

from __future__ import annotations

import json

HGNC_TSV_ROWS = [
    # id, symbol, ensembl, type, uniprot (|-delimited array)
    ["hgnc:1101", "BRCA2", "ENSG00000139618", "hgnc:Gene", "P51587|Q1RMC1"],
    ["hgnc:5", "A1BG", "ENSG00000121410", "hgnc:Gene", "P04217"],
    ["hgnc:37133", "A1BG-AS1", "ENSG00000268895", "hgnc:Gene", ""],
]
HGNC_COLUMNS = ["id", "hgnc:symbol", "hgnc:ensembl_gene_id", "grebi:type", "hgnc:uniprot_ids"]

IMPC_JSONL = [
    {
        "mgiGeneAccessionId": "mgi:104537",
        "name": "Brca2",
        "symbol": "Brca2",
        "humanGeneOrthologues": ["hgnc:1101"],
        "phenotypes": ["mp:0002169"],
    },
    {
        "mgiGeneAccessionId": "mgi:99999",
        "name": "Notagene",
        "symbol": "Notagene",
        "humanGeneOrthologues": [],
        "phenotypes": [],
    },
]

OTAR_JSONL = [
    {
        "id": "otar_ev_001",
        "targetId": "hgnc:1101",
        "diseaseId": "mondo:0005044",
        "score": "0.93",
        "variantEffect": "missense",
        "literature": "123456",
    },
    {
        "id": "otar_ev_002",
        "targetId": "hgnc:5",
        "diseaseId": "mondo:0005044",
        "score": "0.41",
        "literature": "7891011",
    },
]

KGX_EDGES_JSONL = [
    {
        "subject": "mgi:104537",
        "predicate": "biolink:has_phenotype",
        "object": "mp:0002169",
        "primary_knowledge_source": "infores:impc",
    },
]
KGX_NODES_JSONL = [
    {"id": "mp:0002169", "category": ["biolink:PhenotypicFeature"], "name": "no abnormal phenotype detected"},
]

SSSOM_TSV = (
    "#curie_map:\n"
    "#  MONDO: http://purl.obolibrary.org/obo/MONDO_\n"
    "subject_id\tpredicate_id\tobject_id\tmapping_justification\n"
    "mondo:0005044\tskos:exactMatch\tefo:0000537\tsemapv:ManualMappingCuration\n"
)

OLS_JSONL = [
    {
        "id": "mondo:0005044",
        "grebi:type": ["ols:Class"],
        "ols:label": ["hypertensive disorder"],
        "ols:directAncestor": ["mondo:0000001"],
        "ols:directParent": ["mondo:0000001"],
        "ols:iri": ["http://purl.obolibrary.org/obo/MONDO_0005044"],
    },
    {
        "id": "mondo:0000001",
        "grebi:type": ["ols:Class"],
        "ols:label": ["disease"],
        "ols:directAncestor": [],
        "ols:directParent": [],
        "ols:iri": ["http://purl.obolibrary.org/obo/MONDO_0000001"],
    },
    # 3-level chain for closure tests
    {
        "id": "mondo:0001134",
        "grebi:type": ["ols:Class"],
        "ols:label": ["essential hypertension"],
        "ols:directAncestor": ["mondo:0005044", "mondo:0000001"],
        "ols:directParent": ["mondo:0005044"],
        "ols:iri": ["http://purl.obolibrary.org/obo/MONDO_0001134"],
        # self-referential xref — must be excluded from edges
        "oboinowl:hasDbXref": ["mondo:0001134"],
    },
    # an untyped dangling subject — must be eliminated (N7)
    {"id": "dangling:1", "rdfs:seeAlso": ["mondo:0000001"]},
]


def jsonl(rows: list[dict]) -> list[str]:
    return [json.dumps(r) for r in rows]
