"""The BM25 postings index — Lucene's index-vs-query split over the
maintained search core (sinks.solr_jsonl): tokenize at index/refresh
time, serve /search?rank=bm25 from stored postings + a live-corpus
stats snapshot, never re-tokenizing the corpus per request.

Reference: GrebiApi's /search delegates ranking to Solr, whose Lucene
index holds exactly these artifacts (term dictionary + posting lists +
norms); GrebiSolrClient.java:105-147 is the query side of that split.
"""

import pytest
from pyspark.sql import functions as F

from grebi_spark.incremental import add_datasource, build_graph_stateful
from grebi_spark.sinks.solr_jsonl import (
    bm25_core_docs,
    bm25_index_scored,
    build_solr_core,
    compact_solr_core,
    read_solr_core,
    refresh_solr_core,
    search_core_docs_bm25,
)
from grebi_spark.sources.jsonl import jsonl_to_nodes

from . import fixtures as FX
from .test_pipeline import CONFIG, _lines_df

TERMS = ("beta", "gamma")


def _nodes(spark, rows, ds):
    return jsonl_to_nodes(_lines_df(spark, FX.jsonl(rows)), ds)


def _scored_set(df):
    return sorted((r["node_id"], r["score"]) for r in df.collect())


@pytest.fixture(scope="module")
def core(spark, tmp_path_factory):
    """A built-then-refreshed core with controlled names, so every
    corpus statistic the refresh must move is known by construction:
    base = {alpha beta, beta gamma}; the add verb lands {beta delta}
    (df(beta) 2→3, n_docs 2→3, total_dl 4→6 — every score shifts)."""
    a = _nodes(
        spark,
        [
            {"id": "x:1", "grebi:type": ["t:A"], "grebi:name": ["alpha beta"]},
            {"id": "x:2", "grebi:type": ["t:A"], "grebi:name": ["beta gamma"]},
        ],
        "srca",
    )
    b = _nodes(
        spark,
        [{"id": "x:3", "grebi:type": ["t:B"], "grebi:name": ["beta delta"]}],
        "srcb",
    )
    root = str(tmp_path_factory.mktemp("core_index") / "core")
    s1 = build_graph_stateful([a], CONFIG)
    build_solr_core(s1.graph.merged, s1.graph.nodes, s1.graph.edges, root)
    pre = _scored_set(bm25_index_scored(spark, root, TERMS))
    s2 = add_datasource(s1, b)
    counts = refresh_solr_core(spark, s2, root)
    return {"root": root, "pre": pre, "counts": counts}


def test_index_scores_equal_query_time_recompute(spark, core):
    """After a delta refresh, scoring from the STORED index (postings +
    rolled-forward stats snapshot) must equal a from-scratch query-time
    recompute over the live doc set — same formula, same fixed-order
    sums, value-exact. A stale postings segment, an unapplied
    tombstone, or a drifted stats row would all diverge here."""
    assert core["counts"]["node_upserts"] > 0
    idx = _scored_set(bm25_index_scored(spark, core["root"], TERMS))
    live = read_solr_core(spark, core["root"], "nodes")
    recompute = _scored_set(bm25_core_docs(live, TERMS))
    assert idx == recompute
    assert idx  # non-vacuous: the terms match docs


def test_stale_index_would_serve_wrong_scores(spark, core):
    """The refresh MOVED the statistics: pre-refresh index scores
    differ from post-refresh ones (df(beta) 2→3, n_docs 2→3, avgdl
    shifts), so serving from an unrefreshed index is an observable
    wrongness, not a latent one — the reason refresh_core_index rolls
    the stats snapshot forward instead of trusting the build-time row."""
    post = _scored_set(bm25_index_scored(spark, core["root"], TERMS))
    assert core["pre"] != post
    # and the stored stats row equals the live corpus exactly
    from grebi_spark.sinks.solr_jsonl import _index_segments

    segs = _index_segments(spark, core["root"])
    stats = spark.read.parquet(
        f"{core['root']}/nodes/index/stats/seg={max(segs)}"
    ).collect()[0]
    live = read_solr_core(spark, core["root"], "nodes")
    toks = F.filter(
        F.split(F.lower(F.array_join("grebi__name", " ")), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    want = live.select(F.size(toks).alias("dl")).agg(
        F.count("*").alias("n"), F.sum("dl").cast("long").alias("dl")
    ).collect()[0]
    assert (stats["n_docs"], stats["total_dl"]) == (want["n"], want["dl"])


def test_compaction_rebuilds_index_scores_identical(spark, core):
    """Segment merge folds the doc store AND rebuilds the postings
    index; scores are bit-identical across the compaction."""
    before = _scored_set(bm25_index_scored(spark, core["root"], TERMS))
    assert compact_solr_core(spark, core["root"]) >= 1
    after = _scored_set(bm25_index_scored(spark, core["root"], TERMS))
    assert before == after


def test_request_plan_is_probe_sized(spark, core):
    """The per-request plan: the postings scan carries the query-term
    IN filter PUSHED DOWN to parquet (term-dictionary probe), and no
    request-time tokenize of the corpus appears anywhere (no
    array_join/split over the doc store — that work happened at index
    time)."""
    df = bm25_index_scored(spark, core["root"], TERMS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(tok" in plan, plan
    assert "array_join" not in plan, plan


def test_duplicate_query_terms_deduped(spark, core):
    """'beta beta gamma' must rank exactly like 'beta gamma': repeated
    words in the query box neither double-count their clause nor eat
    the 8-term edismax clause budget (first-seen order kept)."""
    live = read_solr_core(spark, core["root"], "nodes")
    page_dup, _ = search_core_docs_bm25(
        live, "beta beta gamma", index_root=core["root"]
    )
    page, _ = search_core_docs_bm25(
        live, "beta gamma", index_root=core["root"]
    )
    assert sorted(map(tuple, page_dup.collect())) == sorted(
        map(tuple, page.collect())
    )


def test_empty_and_punctuation_only_queries_match_nothing(spark, core):
    """A q of only punctuation tokenizes to ZERO terms — a zero-clause
    Lucene query matches nothing and must not error (the facade passes
    the user's q verbatim). Both public scorers are total on an empty
    term tuple too."""
    live = read_solr_core(spark, core["root"], "nodes")
    for q in ("", "!!! --- ???"):
        page, _ = search_core_docs_bm25(live, q, index_root=core["root"])
        assert page.count() == 0
    assert bm25_index_scored(spark, core["root"], ()).count() == 0
    assert bm25_core_docs(live, ()).count() == 0
