"""Incremental update correctness: folding a datasource into a built
graph must produce EXACTLY the graph a from-scratch build over the
union of sources produces — groups, merged rows, node headers, edges,
display types, and edge summary all value-identical.

The added source (sssom) links two pre-existing cliques (the ols/kgx
mondo group and the efo id), so the test exercises the hard case:
clique fusion with canonical-id change and re-merge of absorbed nodes.
"""

import pytest

from grebi_spark.incremental import add_datasource, build_graph_stateful
from grebi_spark.operators.normalise import PrefixMap
from grebi_spark.pipeline import build_graph
from grebi_spark.sources.jsonl import JsonlTransform, jsonl_to_nodes, kgx_edges_to_nodes
from grebi_spark.sources.tsv import tsv_to_nodes

from . import fixtures as FX
from .test_pipeline import CONFIG, _lines_df


def _sources(spark):
    hgnc_wide = spark.createDataFrame(FX.HGNC_TSV_ROWS, FX.HGNC_COLUMNS)
    hgnc = tsv_to_nodes(hgnc_wide, "hgnc", array_delimiter=r"\|")
    impc = jsonl_to_nodes(
        _lines_df(spark, FX.jsonl(FX.IMPC_JSONL)),
        "impc",
        transform=JsonlTransform(
            rename_fields=(("mgiGeneAccessionId", "id"),),
            inject_type="impc:MouseGene",
            key_prefix="impc:",
        ),
    )
    kgx_e = kgx_edges_to_nodes(
        spark.read.json(spark.sparkContext.parallelize(FX.jsonl(FX.KGX_EDGES_JSONL))),
        "monarch",
    )
    kgx_n = jsonl_to_nodes(
        _lines_df(spark, FX.jsonl(FX.KGX_NODES_JSONL)),
        "monarch",
        transform=JsonlTransform(
            rename_fields=(("category", "grebi:type"), ("name", "grebi:name")),
        ),
    )
    ols = jsonl_to_nodes(_lines_df(spark, FX.jsonl(FX.OLS_JSONL)), "ols")
    sssom = jsonl_to_nodes(
        _lines_df(
            spark,
            FX.jsonl(
                [
                    {
                        "id": "mondo:0005044",
                        "skos:exactMatch": ["efo:0000537"],
                        "sssom:mapping_justification": ["semapv:ManualMappingCuration"],
                    }
                ]
            ),
        ),
        "sssom",
    )
    return [hgnc, impc, kgx_e, kgx_n, ols], sssom


def _canon(df):
    def cell(v):
        if isinstance(v, list):
            return tuple(v)
        return v

    return sorted(tuple(cell(v) for v in row) for row in df.collect())


PM = PrefixMap({"http://purl.obolibrary.org/obo/MONDO_": "mondo:"})


@pytest.fixture(scope="module")
def graphs(spark):
    base_sources, sssom = _sources(spark)
    full = build_graph(base_sources + [sssom], CONFIG, prefix_map=PM)
    state = build_graph_stateful(base_sources, CONFIG, prefix_map=PM)
    inc = add_datasource(state, sssom, prefix_map=PM)
    return full, inc.graph


@pytest.mark.parametrize(
    "part",
    ["groups", "merged", "nodes", "edges", "display_types", "edge_summary"],
)
def test_incremental_equals_full_rebuild(graphs, part):
    full, inc = graphs
    assert _canon(getattr(inc, part)) == _canon(getattr(full, part)), part


def test_incremental_fuses_pre_existing_cliques(graphs):
    _full, inc = graphs
    groups = {r["id"]: r["group_id"] for r in inc.groups.collect()}
    # the added sssom row linked efo:0000537 into the mondo clique
    assert groups["efo:0000537"] == "mondo:0005044"


@pytest.fixture(scope="module")
def removal_graphs(spark):
    """Build over ALL sources (incl. sssom), retire sssom, compare with
    a from-scratch build over the base set — the inverse of the fusion
    case: the mondo/efo clique must SPLIT back apart, with efo:0000537
    re-elected as its own canonical and every sssom row gone."""
    from grebi_spark.incremental import remove_datasource

    base_sources, sssom = _sources(spark)
    state = build_graph_stateful(base_sources + [sssom], CONFIG, prefix_map=PM)
    reduced = remove_datasource(state, "sssom")
    scratch = build_graph(base_sources, CONFIG, prefix_map=PM)
    return scratch, reduced.graph


@pytest.mark.parametrize(
    "part",
    ["groups", "merged", "nodes", "edges", "display_types", "edge_summary"],
)
def test_remove_equals_full_rebuild(removal_graphs, part):
    scratch, reduced = removal_graphs
    assert _canon(getattr(reduced, part)) == _canon(getattr(scratch, part)), part


def test_remove_splits_clique_and_drops_source(removal_graphs):
    _scratch, reduced = removal_graphs
    groups = {r["id"]: r["group_id"] for r in reduced.groups.collect()}
    # the sssom link was the only bridge: efo:0000537 must no longer map
    # into the mondo clique
    assert groups.get("efo:0000537") != "mondo:0005044"
    # and no merged row may carry sssom provenance anymore
    import pyspark.sql.functions as SF

    assert (
        reduced.merged.filter(SF.array_contains("datasources", "sssom")).count() == 0
    )
