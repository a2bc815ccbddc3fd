"""K4 — Solr-import JSONL flattening.

Reference: 06_prepare_db_import/grebi_make_solr/src/main.rs:52-219 —
provenance wrappers stripped (each value → its grebi:value only,
:167-206), property keys escaped ``:`` → ``__`` (:208-219), and for
id-valued strings the referenced node's *names* are indexed alongside
(:184-203) so the search core can match edges by endpoint label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def solr_key(col):
    return F.regexp_replace(col, ":", "__")


def solr_node_docs(merged: DataFrame, node_meta: DataFrame) -> DataFrame:
    """One flat JSON document per node: grebi__nodeId, grebi__datasources,
    per-prop value arrays (provenance stripped), plus <prop>_names arrays
    holding referenced-node labels."""
    # referenced names: value → names of the node it points to
    ref_names = node_meta.select(
        F.col("node_id").alias("ref_id"), F.col("names").alias("ref_names")
    )
    vals = (
        merged.join(ref_names, merged.value == ref_names.ref_id, "left")
        .select(
            "node_id",
            solr_key(F.col("prop_key")).alias("k"),
            "value",
            F.coalesce("ref_names", F.array().cast("array<string>")).alias("ref_names"),
        )
    )
    per_key = vals.groupBy("node_id", "k").agg(
        F.array_sort(F.collect_set("value")).alias("values"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("ref_names")))).alias(
            "names"
        ),
    )
    entries = per_key.select(
        "node_id",
        F.explode(
            F.when(
                F.size("names") > 0,
                F.array(
                    F.struct(F.col("k"), F.col("values")),
                    F.struct(
                        F.concat(F.col("k"), F.lit("_names")).alias("k"),
                        F.col("names").alias("values"),
                    ),
                ),
            ).otherwise(F.array(F.struct(F.col("k"), F.col("values"))))
        ).alias("e"),
    )
    docs = entries.groupBy("node_id").agg(
        F.map_from_entries(F.array_sort(F.collect_list("e"))).alias("fields")
    )
    return docs.join(node_meta, "node_id").select(
        F.col("node_id").alias("grebi__nodeId"),
        F.col("datasources").alias("grebi__datasources"),
        F.col("types").alias("grebi__type"),
        F.col("names").alias("grebi__name"),
        "fields",
    )


def solr_edge_docs(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("edge_id").alias("grebi__edgeId"),
        F.col("edge_type").alias("grebi__type"),
        F.col("from_id").alias("grebi__from"),
        F.col("to_id").alias("grebi__to"),
        F.col("datasources").alias("grebi__datasources"),
        F.col("subgraph").alias("grebi__subgraph"),
    )


def solr_autocomplete_docs(names: DataFrame) -> DataFrame:
    """The autocomplete core: the distinct name list with edge-ngram-ish
    keys (whitespace token prefixes), cf. make_solr_autocomplete_config.py."""
    return names.select(
        F.col("name").alias("label"),
        F.split(F.lower("name"), r"\s+").alias("whitespace_edge_label"),
    )


def solr_schema_fields(prop_keys: list[str]) -> list[dict]:
    """K5 — dynamic Solr schema generation: per property a stored string
    field plus ``str_``/``lowercase_`` copy-fields
    (06_prepare_db_import/make_solr_config.py:33-53). Returned as dicts so
    a serving layer can render schema.xml."""
    fields = []
    for k in sorted(prop_keys):
        sk = k.replace(":", "__")
        fields.append({"name": sk, "type": "string", "multiValued": True, "stored": True})
        fields.append({"name": f"str_{sk}", "type": "string", "copy_of": sk})
        fields.append({"name": f"lowercase_{sk}", "type": "lowercase", "copy_of": sk})
    return fields


def solr_delta_docs(state) -> dict[str, DataFrame]:
    """Delta Solr import set after an incremental verb — the serving-tier
    twin of ``sinks.kv.refresh_kv_store`` for the search core. The
    reference regenerates the whole Solr JSONL per release
    (06_prepare_db_import/grebi_make_solr, 07_create_db/solr); Solr
    itself upserts by id and deletes by id, so a maintained core needs
    only this delta set:

    * ``node_upserts`` — re-rendered docs of (a) the re-merged cliques
      and (b) every node whose doc EMBEDS a changed clique's names via
      the ``<prop>_names`` denormalisation (grebi_make_solr/src/
      main.rs:184-203) — the embed makes doc deltas propagate one step
      backward along references, so those unchanged-graph nodes still
      need re-indexing;
    * ``node_deletions`` — vanished node ids;
    * ``edge_upserts`` / ``edge_deletions`` — the verb's new edge rows /
      removed edge ids. The two sets are DISJOINT by construction: an
      unchanged edge of a re-merged clique keeps its content-hashed id
      and appears in both the verb's removed and new rows, so deletions
      are anti-joined against the upsert ids — apply the four sets in
      ANY order (Solr add-by-id already replaces).

    Everything stays broadcast-delta: the stored merged/meta tables are
    only semi-probed map-side (same no-corpus-shuffle contract as the
    verbs); the autocomplete core is NOT in the delta — its name list is
    already additively maintained (state.counts.name_counts), regenerate
    it from there. Refresh after EVERY verb: ``last_delta`` describes
    only the latest one."""
    d = state.last_delta
    if not d:
        raise ValueError(
            "state carries no last_delta (from-scratch build, loaded, or "
            "compacted state) — render the full core with write_solr_jsonl"
        )
    g = state.graph
    changed = (
        d["retired"]
        .unionByName(d["merged_delta"].select("node_id"))
        .distinct()
        .localCheckpoint()
    )
    # nodes whose docs embed a changed node's names: one map-side
    # broadcast-semi scan of the stored merged table (probe column
    # aliased — `changed` shares lineage with the stored merged frame,
    # so a raw node_id reference would be an ambiguous self-join)
    probe = changed.select(F.col("node_id").alias("__changed_id"))
    referencing = (
        g.merged.join(
            F.broadcast(probe),
            g.merged.value == F.col("__changed_id"),
            "left_semi",
        )
        .select("node_id")
        .distinct()
    )
    upsert_ids = (
        d["merged_delta"]
        .select("node_id")
        .unionAll(referencing)
        .distinct()
        .localCheckpoint()
    )
    rows = g.merged.join(F.broadcast(upsert_ids), "node_id", "left_semi")
    # meta restricted to (doc nodes ∪ their referenced values) — the two
    # uses solr_node_docs makes of node_meta, both delta-sized probes
    ref_vals = rows.select(F.col("value").alias("node_id")).distinct()
    meta_small = g.nodes.join(
        F.broadcast(upsert_ids.unionAll(ref_vals).distinct()),
        "node_id",
        "left_semi",
    ).localCheckpoint()
    return {
        "node_upserts": solr_node_docs(rows, meta_small),
        "node_deletions": d["vanished"].select(
            F.col("node_id").alias("grebi__nodeId")
        ),
        "edge_upserts": solr_edge_docs(d["new_edge_rows"]),
        "edge_deletions": d["removed_edge_ids"]
        .join(
            F.broadcast(d["new_edge_rows"].select("edge_id")),
            "edge_id",
            "left_anti",
        )
        .select(F.col("edge_id").alias("grebi__edgeId")),
    }


# --- the EXECUTED search core: segment/tombstone maintenance ----------------
#
# The reference's Solr tier is rebuilt from scratch per release
# (07_create_db/solr/solr_import.dockerpy). The executable analogue of
# a MAINTAINED core — without a Solr binary in the container — is the
# storage model Solr itself (Lucene) uses: immutable SEGMENTS plus
# per-refresh TOMBSTONES. A refresh appends one segment holding the
# upserted docs and one tombstone set covering (deleted ∪ replaced)
# ids; old segments are NEVER rewritten, so the refresh write is
# delta-sized. A doc is live iff no tombstone with a HIGHER segment
# number covers its id — exactly Lucene's deleted-docs semantics, and
# the same LSM shape as compact_ann_index / compact_state.

_CORE_KINDS = ("nodes", "edges")


def _core_segments(spark, root: str, kind: str) -> list[int]:
    from ..fsutil import hadoop_ls

    segs = []
    for st in hadoop_ls(spark, f"{root}/{kind}/segments", dirs_only=True):
        name = st.getPath().getName()
        if name.startswith("seg="):
            segs.append(int(name.split("=", 1)[1]))
    return sorted(segs)


def build_solr_core(merged, node_meta, edges, root: str) -> None:
    """Materialise the executed search core from scratch: node and edge
    docs as segment 0, no tombstones, plus the nodes' BM25 POSTINGS
    INDEX segment (tokenize-at-index-time — Lucene's index-vs-query
    split; /search?rank=bm25 then probes postings instead of
    re-tokenizing the corpus per request). Same doc rendering as the
    JSONL export (solr_node_docs / solr_edge_docs)."""
    spark = merged.sparkSession
    solr_node_docs(merged, node_meta).write.mode("overwrite").parquet(
        f"{root}/nodes/segments/seg=0"
    )
    solr_edge_docs(edges).write.mode("overwrite").parquet(
        f"{root}/edges/segments/seg=0"
    )
    # index the just-written segment (read back: cheaper than re-running
    # the doc-render joins, and indexes exactly what the core stores)
    docs0 = spark.read.parquet(f"{root}/nodes/segments/seg=0")
    _write_index_segment(spark, root, 0, docs0, base_stats=(0, 0))


def refresh_solr_core(spark, state, root: str) -> dict[str, int]:
    """Delta-maintain the EXECUTED core after an incremental verb: write
    ``solr_delta_docs``' upsert sets as a NEW segment and its
    (deletions ∪ replaced ids) as that segment's tombstones. Old
    segments are untouched — the refresh I/O is delta-sized, the
    no-corpus-shuffle contract the graph verbs carry extends through
    the serving tier (the stored corpus is only broadcast-semi-probed
    inside solr_delta_docs). Returns per-set applied counts; the suite
    asserts read-back ≡ a from-scratch core of the new state."""
    d = solr_delta_docs(state)
    segs = _core_segments(spark, root, "nodes")
    if not segs:
        raise ValueError(
            f"no core at {root} — refresh maintains an existing "
            "build_solr_core artifact"
        )
    new_seg = max(segs) + 1
    counts: dict[str, int] = {}

    for kind, idcol, ups, dels in (
        ("nodes", "grebi__nodeId", d["node_upserts"], d["node_deletions"]),
        ("edges", "grebi__edgeId", d["edge_upserts"], d["edge_deletions"]),
    ):
        ups = ups.localCheckpoint()  # materialise before any same-root read
        ups.write.mode("overwrite").parquet(
            f"{root}/{kind}/segments/seg={new_seg}"
        )
        tomb = dels.select(F.col(idcol).alias("id")).unionByName(
            ups.select(F.col(idcol).alias("id"))
        )
        tomb.write.mode("overwrite").parquet(
            f"{root}/{kind}/tombstones/seg={new_seg}"
        )
        counts[f"{kind[:-1]}_upserts"] = ups.count()
        counts[f"{kind[:-1]}_deletions"] = dels.count()
    # delta-maintain the BM25 postings index alongside the doc segments
    # (index the new segment's docs, roll the live stats forward); a
    # pre-index core (no index dir) simply stays doc-only — the serving
    # path falls back to query-time scoring there
    if _index_segments(spark, root):
        refresh_core_index(spark, root, new_seg)
    return counts


def read_solr_core(spark, root: str, kind: str = "nodes"):
    """The live documents of the maintained core: union every segment
    (with its ordinal) and drop docs covered by a HIGHER-segment
    tombstone — Lucene's visibility rule. One anti-join against the
    (delta-sized) tombstone union; segment files are read as written,
    no shuffle beyond the join."""
    from functools import reduce

    segs = _core_segments(spark, root, kind)
    if not segs:
        raise ValueError(f"no {kind} segments under {root}")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(f"{root}/{kind}/segments/seg={s}").withColumn(
                "__seg", F.lit(s)
            )
            for s in segs
        ],
    )
    idcol = "grebi__nodeId" if kind == "nodes" else "grebi__edgeId"
    tombs = [
        spark.read.parquet(f"{root}/{kind}/tombstones/seg={s}").withColumn(
            "__tseg", F.lit(s)
        )
        for s in segs
        if s > 0
    ]
    if not tombs:
        return docs.drop("__seg")
    tomb = reduce(lambda a, b: a.unionByName(b), tombs)
    live = docs.join(
        F.broadcast(tomb),
        (docs[idcol] == tomb["id"]) & (tomb["__tseg"] > docs["__seg"]),
        "left_anti",
    )
    return live.drop("__seg")


def search_core_docs(
    docs: DataFrame,
    q: str,
    page: int = 0,
    size: int = 10,
    type_filter: str | None = None,
    facet_fields: tuple[str, ...] = (),
    filters: tuple[tuple[str, tuple[str, ...], bool], ...] = (),
    exclude_obsolete: bool = True,
):
    """Q6 over the MAINTAINED core's documents — the reference's actual
    read path: GrebiApi's /search queries Solr, the incrementally
    refreshed store (GrebiApi.java:185-227), not the graph build. Same
    semantics as plans.graph_queries.search_nodes (id beats name
    scoring, OR-within/AND-across WHOLE_FIELD filters, negation, the
    always-on obsolete exclusion, multi-select faceting where tagged
    filters are excluded from facet counts) — value-identical output,
    suite-asserted — but every predicate reads the flat doc's own
    ``fields`` map: a point filter needs no join against the merged
    long table, which is exactly why the reference fronts its graph
    with a search core."""
    ql = (q or "").lower()
    if type_filter:
        docs = docs.filter(F.array_contains("grebi__type", type_filter))
    id_hit = F.when(F.lower(F.col("grebi__nodeId")).contains(ql), 1000).otherwise(0)
    name_hit = F.when(
        F.exists("grebi__name", lambda n: F.lower(n).contains(ql)), 900
    ).otherwise(0)
    scored = docs.withColumn("score", id_hit + name_hit).filter(F.col("score") > 0)
    base, paged = _apply_core_filters(
        scored, filters, facet_fields, exclude_obsolete
    )
    page_df = (
        paged.orderBy(F.desc("score"), "grebi__nodeId")
        .offset(page * size)
        .limit(size)
        .select(
            F.col("grebi__nodeId").alias("node_id"),
            F.col("grebi__type").alias("types"),
            F.col("grebi__name").alias("names"),
            "score",
        )
    )
    return page_df, _core_facets(base, facet_fields)


def _apply_one_core_filter(
    df: DataFrame, prop: str, values: tuple[str, ...], negate: bool
) -> DataFrame:
    """One WHOLE_FIELD filter over a core doc frame (OR within values,
    negation supported), reading the flat doc's own columns/fields map."""
    if prop == "types":
        vals = F.col("grebi__type")
    elif prop == "datasources":
        vals = F.col("grebi__datasources")
    else:
        vals = F.coalesce(
            F.col("fields").getItem(prop.replace(":", "__")),
            F.array().cast("array<string>"),
        )
    hit = F.arrays_overlap(vals, F.array(*[F.lit(v) for v in values]))
    return df.filter(~hit if negate else hit)


def _apply_core_filters(
    scored: DataFrame,
    filters: tuple[tuple[str, tuple[str, ...], bool], ...],
    facet_fields: tuple[str, ...],
    exclude_obsolete: bool,
):
    """(base, paged): multi-select faceting — filters on FACETED fields
    are excluded from the facet-count frame (base) but applied to the
    page frame (paged); the always-on obsolete exclusion applies to
    both. Shared by the boost-ladder and BM25 rankings so the filter
    semantics cannot drift between them."""
    all_filters = list(filters)
    if exclude_obsolete:
        all_filters.append(("ols:isObsolete", ("true",), True))
    base = scored
    for prop, values, negate in all_filters:
        if prop not in facet_fields:
            base = _apply_one_core_filter(base, prop, values, negate)
    paged = base
    for prop, values, negate in all_filters:
        if prop in facet_fields:
            paged = _apply_one_core_filter(paged, prop, values, negate)
    return base, paged


def _core_facets(base: DataFrame, facet_fields: tuple[str, ...]):
    core_col = {"types": "grebi__type", "datasources": "grebi__datasources"}
    return {
        f: base.select(F.explode(core_col[f]).alias("value")).groupBy("value").count()
        for f in facet_fields
        if f in core_col
    }


def search_core_docs_bm25(
    docs: DataFrame,
    q: str,
    page: int = 0,
    size: int = 10,
    type_filter: str | None = None,
    facet_fields: tuple[str, ...] = (),
    filters: tuple[tuple[str, tuple[str, ...], bool], ...] = (),
    exclude_obsolete: bool = True,
    index_root: str | None = None,
):
    """Q6 over the maintained core with Lucene's ACTUAL ranking model:
    same WHOLE_FIELD filter / multi-select facet semantics as
    ``search_core_docs`` (shared ``_apply_core_filters``), but
    relevance is Okapi BM25 over the name field instead of the id/name
    boost ladder. The facade serves this under
    ``/search?...&rank=bm25``. The query is tokenized by the same
    lowercase/non-alphanumeric rule the index uses; duplicate terms are
    dropped (first-seen order kept — a repeated word in the query box
    must not double-count its clause or silently eat the clause
    budget), then at most 8 terms participate (Solr's edismax clause
    bound, kept small so the fixed-order score sum stays engine-exact).

    With ``index_root`` (the core's root — the facade passes it),
    scoring probes the STORED postings index (``bm25_index_scored``):
    no request-time tokenize, no corpus-proportional work — Lucene's
    actual index-vs-query split. Without it, scoring falls back to
    query-time recompute over ``docs`` (``bm25_core_docs``), the
    pre-index behavior kept for doc-only cores."""
    import re as _re

    seen: dict[str, None] = {}
    for t in _re.split(r"[^a-z0-9]+", (q or "").lower()):
        if t:
            seen.setdefault(t)
    terms = tuple(seen)[:8]
    base, paged = _apply_core_filters(
        docs if not type_filter
        else docs.filter(F.array_contains("grebi__type", type_filter)),
        filters,
        facet_fields,
        exclude_obsolete,
    )
    if not terms:
        empty = paged.select(
            F.col("grebi__nodeId").alias("node_id"),
            F.col("grebi__type").alias("types"),
            F.col("grebi__name").alias("names"),
            F.lit(0.0).alias("score"),
        ).limit(0)
        return empty, _core_facets(base, facet_fields)
    # Lucene semantics: BM25 statistics (df/idf/avgdl) come from the
    # INDEX — the whole live corpus — never from the filtered subset;
    # an fq filter narrows the result set but does not change scores.
    if index_root is not None and _index_segments(
        docs.sparkSession, index_root
    ):
        scored = bm25_index_scored(docs.sparkSession, index_root, terms)
    else:
        scored = bm25_core_docs(docs, terms, persist=False)
    meta = paged.select(
        F.col("grebi__nodeId").alias("node_id"),
        F.col("grebi__type").alias("types"),
        F.col("grebi__name").alias("names"),
    )
    page_df = (
        scored.join(meta, "node_id")  # inner: filters narrow the page
        .orderBy(F.desc("score"), "node_id")
        .offset(page * size)
        .limit(size)
        .select("node_id", "types", "names", "score")
    )
    # facet counts cover MATCHING docs (q hit >=1 term), mirroring the
    # boost-ladder path's score>0 restriction
    matched = base.join(
        scored.select("node_id"),
        base["grebi__nodeId"] == F.col("node_id"),
        "left_semi",
    )
    return page_df, _core_facets(matched, facet_fields)


def bm25_core_docs(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    persist: bool = True,
) -> DataFrame:
    """Okapi BM25 over the MAINTAINED core's live documents — Solr's
    actual ranking model (Lucene's BM25Similarity, the default since
    Solr 6), served from the same segment/tombstone store /search
    filters against. ``docs`` is ``read_solr_core``'s live view, so
    df/idf/avgdl are computed from the POST-refresh doc set: a stale
    segment or an uncovered tombstone shifts the corpus statistics and
    every score with them — the suite's oracle recomputes from scratch.

    Token rule (oracle-mirrorable): lowercase the name field, split on
    non-alphanumeric runs, drop empties. All scoring is JVM-side
    aggregates (no UDF); df and the one-row corpus stats broadcast;
    per-doc scores are fixed-order sums of per-term weights (one w row
    per (doc, term)), so parity cannot flip on FP accumulation order.
    Returns (node_id, score) for docs matching ≥1 term — an EMPTY term
    tuple (a query of only punctuation) matches nothing, mirroring a
    Lucene query with zero clauses."""
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "node_id string, score double"
        )
    toks = F.filter(
        F.split(
            F.lower(F.array_join(F.col("grebi__name"), " ")), "[^a-z0-9]+"
        ),
        lambda t: t != "",
    )
    base = docs.select(
        F.col("grebi__nodeId").alias("node_id"), toks.alias("toks")
    )
    lens = base.select("node_id", F.size("toks").alias("dl"))
    if persist:  # shares the doc scan between stats and the probe join;
        # per-request callers (the facade) pass False to avoid stacking
        # persisted frames across requests
        lens = lens.persist()
    stats = lens.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    qt = base.select(
        "node_id",
        F.explode(F.filter(F.col("toks"), lambda t: t.isin(*terms))).alias(
            "tok"
        ),
    )
    tf = qt.groupBy("node_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    w = (
        tf.join(F.broadcast(df), "tok")
        .join(lens, "node_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b * F.col("dl") * F.col("n_docs") / F.col("total_dl")
                )
            ),
        )
    )
    per_term = w.groupBy("node_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("tok") == t, F.col("w"))), F.lit(0.0)
            ).alias(f"w_{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.col(f"w_{i}")
    return per_term.select("node_id", F.round(score, 4).alias("score"))


# --- the BM25 postings index: Lucene's index-vs-query split -----------------
#
# Lucene tokenizes at INDEX time — a query probes the term dictionary
# and posting lists; it never re-reads stored documents to score
# (GrebiSolrClient.java:105-147 sends edismax queries to exactly such
# an index). The maintained core mirrors that split: each doc segment
# gets a postings segment (tok, node_id, tf, dl — dl denormalized so a
# term probe is self-contained), a lens segment (node_id, dl — includes
# zero-token docs, which count toward n_docs/avgdl), and a one-row
# LIVE-corpus stats snapshot (n_docs, total_dl) maintained incrementally
# at refresh time. A /search?rank=bm25 request then reads: postings
# filtered to the query terms (predicate pushdown + tok-sorted row
# groups — a probe-sized scan), the delta-sized tombstones (broadcast),
# and one stats row. Nothing per-request is proportional to the corpus.


def _name_tokens():
    """The index-time token rule (shared verbatim with the query-time
    fallback ``bm25_core_docs`` so the two paths cannot drift):
    lowercase the name field, split on non-alphanumeric runs, drop
    empties."""
    return F.filter(
        F.split(
            F.lower(F.array_join(F.col("grebi__name"), " ")), "[^a-z0-9]+"
        ),
        lambda t: t != "",
    )


def _index_rows(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, lens) for one segment's node docs. postings = one row
    per (doc, distinct token): (tok, node_id, tf, dl); lens =
    (node_id, dl) for every doc, tokens or not."""
    base = docs.select(
        F.col("grebi__nodeId").alias("node_id"), _name_tokens().alias("toks")
    )
    lens = base.select("node_id", F.size("toks").alias("dl"))
    postings = (
        base.select(
            "node_id", F.size("toks").alias("dl"),
            F.explode("toks").alias("tok"),
        )
        .groupBy("tok", "node_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    return postings, lens


def _write_index_segment(
    spark, root: str, seg: int, docs: DataFrame, base_stats: tuple[int, int]
) -> None:
    """Write segment ``seg``'s postings + lens, and the cumulative LIVE
    stats snapshot as of this segment: ``base_stats`` (n_docs, total_dl
    of the live corpus EXCLUDING this segment — the refresh caller has
    already subtracted the docs this segment's tombstones kill) plus
    this segment's own aggregates. Postings are RANGE-partitioned and
    sorted by tok — each file covers a disjoint token range, so a
    query-term probe prunes whole files and row groups via parquet
    min/max stats (the term-dictionary access pattern), and the write
    parallelizes instead of funnelling through one task."""
    post, lens = _index_rows(docs)
    (
        post.repartitionByRange(F.col("tok"))
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{root}/nodes/index/postings/seg={seg}")
    )
    lens.write.mode("overwrite").parquet(f"{root}/nodes/index/lens/seg={seg}")
    added = spark.read.parquet(f"{root}/nodes/index/lens/seg={seg}").agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("dl"),
    ).collect()[0]
    stats = spark.createDataFrame(
        [(base_stats[0] + added["n"], base_stats[1] + added["dl"])],
        "n_docs bigint, total_dl bigint",
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        f"{root}/nodes/index/stats/seg={seg}"
    )


def _index_segments(spark, root: str) -> list[int]:
    from ..fsutil import hadoop_ls

    segs = []
    for st in hadoop_ls(
        spark, f"{root}/nodes/index/postings", dirs_only=True
    ):
        name = st.getPath().getName()
        if name.startswith("seg="):
            segs.append(int(name.split("=", 1)[1]))
    return sorted(segs)


def _core_tombstones(spark, root: str, kind: str = "nodes") -> DataFrame | None:
    """(id, __tseg) union of every tombstone segment — the delta-sized
    kill list ``read_solr_core`` and the postings probe both apply."""
    from functools import reduce

    segs = _core_segments(spark, root, kind)
    tombs = [
        spark.read.parquet(f"{root}/{kind}/tombstones/seg={s}").withColumn(
            "__tseg", F.lit(s)
        )
        for s in segs
        if s > 0
    ]
    if not tombs:
        return None
    return reduce(lambda a, b: a.unionByName(b), tombs)


def _index_live_lens(spark, root: str, upto_seg: int) -> DataFrame:
    """(node_id, dl) of the docs LIVE as of segment ``upto_seg``
    (exclusive of any later segment/tombstone): lens segments ≤ upto
    minus docs a higher tombstone ≤ upto covers."""
    from functools import reduce

    lens = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(
                f"{root}/nodes/index/lens/seg={s}"
            ).withColumn("__seg", F.lit(s))
            for s in _index_segments(spark, root)
            if s <= upto_seg
        ],
    )
    tomb = _core_tombstones(spark, root, "nodes")
    if tomb is not None:
        tomb = tomb.filter(F.col("__tseg") <= upto_seg)
        lens = lens.join(
            F.broadcast(tomb),
            (lens["node_id"] == tomb["id"]) & (tomb["__tseg"] > lens["__seg"]),
            "left_anti",
        )
    return lens.select("node_id", "dl")


def refresh_core_index(spark, root: str, new_seg: int) -> None:
    """Delta-maintain the postings index for doc segment ``new_seg``
    (already written, tombstones included): index the new segment's
    docs, and roll the live stats snapshot forward — new = old − killed
    + added, where killed = the previously-live docs this refresh's
    tombstones cover. The killed lookup is one narrow (node_id, dl)
    scan semi-joined against the delta-sized tombstone ids — per
    REFRESH, not per request; requests never touch the corpus."""
    prev = [s for s in _index_segments(spark, root) if s < new_seg]
    if not prev:
        raise ValueError(
            f"no postings index under {root} — build_solr_core creates it"
        )
    old = spark.read.parquet(
        f"{root}/nodes/index/stats/seg={max(prev)}"
    ).collect()[0]
    new_tomb = spark.read.parquet(
        f"{root}/nodes/tombstones/seg={new_seg}"
    ).select("id")
    killed = (
        _index_live_lens(spark, root, upto_seg=max(prev))
        .join(F.broadcast(new_tomb), F.col("node_id") == F.col("id"),
              "left_semi")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("dl"),
        )
        .collect()[0]
    )
    docs = spark.read.parquet(f"{root}/nodes/segments/seg={new_seg}")
    _write_index_segment(
        spark, root, new_seg, docs,
        base_stats=(old["n_docs"] - killed["n"], old["total_dl"] - killed["dl"]),
    )


def bm25_index_scored(
    spark,
    root: str,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(node_id, score) for ``terms`` served FROM THE STORED INDEX —
    the per-request plan Lucene actually runs: postings filtered to the
    query terms (pushdown-pruned scan), tombstone visibility as a
    broadcast anti-join (delta-sized), per-term df counted over the
    probe itself (exact over live docs), and the one-row stored stats
    snapshot. Identical scores to ``bm25_core_docs`` over the live doc
    set (same formula, same fixed-order sum — suite- and
    oracle-asserted); no request-time work is corpus-proportional.
    An EMPTY term tuple matches nothing (zero-clause Lucene query),
    not an error."""
    from functools import reduce

    if not terms:
        return spark.createDataFrame([], "node_id string, score double")
    segs = _index_segments(spark, root)
    if not segs:
        raise ValueError(f"no postings index under {root}")
    post = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(f"{root}/nodes/index/postings/seg={s}")
            .filter(F.col("tok").isin(*terms))
            .withColumn("__seg", F.lit(s))
            for s in segs
        ],
    )
    tomb = _core_tombstones(spark, root, "nodes")
    if tomb is not None:
        post = post.join(
            F.broadcast(tomb),
            (post["node_id"] == tomb["id"]) & (tomb["__tseg"] > post["__seg"]),
            "left_anti",
        )
    dfreq = post.groupBy("tok").agg(F.count_distinct("node_id").alias("df"))
    stats = spark.read.parquet(f"{root}/nodes/index/stats/seg={max(segs)}")
    w = (
        post.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b * F.col("dl") * F.col("n_docs") / F.col("total_dl")
                )
            ),
        )
    )
    per_term = w.groupBy("node_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("tok") == t, F.col("w"))), F.lit(0.0)
            ).alias(f"w_{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.col(f"w_{i}")
    return per_term.select("node_id", F.round(score, 4).alias("score"))


def suggest_core_docs(docs: DataFrame, q: str, size: int = 10) -> DataFrame:
    """Q7 autocomplete over the maintained core's name field — the
    engine-side twin of the exported autocomplete core's suggester
    (GrebiApi.java:228), same ranking as the frame-backed suggest."""
    ql = (q or "").lower()
    return (
        docs.select(F.explode("grebi__name").alias("name"))
        .filter(F.lower(F.col("name")).startswith(ql))
        .distinct()
        .orderBy(F.length("name"), "name")
        .limit(size)
    )


def compact_solr_core(spark, root: str) -> int:
    """Segment merge (Lucene's background compaction): fold every
    segment's live docs into a fresh segment 0 and drop the tombstones.
    Returns the number of segments merged away. Content-identity
    (read_solr_core before == after) is asserted by the suite.

    In-flight-writer audit (the prune_state_versions race family): this
    sweep deletes the segments/tombstones dirs wholesale and rebuilds
    them, so it is SINGLE-WRITER by contract — a concurrent
    refresh_solr_core racing it could land a segment in the window
    between delete and rename and lose it. Core maintenance (refresh +
    compact) must be serialized by the caller (one maintenance loop per
    core), which matches the suite's and the facade's usage; concurrent
    READERS are safe (they resolve the segment list per request and
    read immutable files)."""
    merged_away = 0
    compacted_nodes = False
    for kind in _CORE_KINDS:
        segs = _core_segments(spark, root, kind)
        if len(segs) <= 1:
            continue
        live = read_solr_core(spark, root, kind).localCheckpoint()
        live.write.mode("overwrite").parquet(f"{root}/{kind}/_compact")
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{kind}/segments"), True)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{kind}/tombstones"), True)
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(f"{root}/{kind}/segments"))
        fs.rename(
            jvm.org.apache.hadoop.fs.Path(f"{root}/{kind}/_compact"),
            jvm.org.apache.hadoop.fs.Path(f"{root}/{kind}/segments/seg=0"),
        )
        merged_away += len(segs) - 1
        compacted_nodes = compacted_nodes or kind == "nodes"
    # rebuild the postings index to match the compacted doc store (one
    # tokenize pass — compaction is already a corpus-sized rewrite)
    if compacted_nodes and _index_segments(spark, root):
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/nodes/index"), True)
        docs0 = spark.read.parquet(f"{root}/nodes/segments/seg=0")
        _write_index_segment(spark, root, 0, docs0, base_stats=(0, 0))
    return merged_away


def write_solr_jsonl(
    merged: DataFrame, node_meta: DataFrame, edges: DataFrame, names: DataFrame, out_dir: str
) -> None:
    solr_node_docs(merged, node_meta).write.mode("overwrite").json(f"{out_dir}/nodes")
    solr_edge_docs(edges).write.mode("overwrite").json(f"{out_dir}/edges")
    solr_autocomplete_docs(names).write.mode("overwrite").json(f"{out_dir}/autocomplete")


def solr_import_requests(
    out_dir: str, core: str, port: int = 8983
) -> list[dict]:
    """The bulk-load request plan the reference's import script issues
    (07_create_db/solr/solr_import.dockerpy:50-90): one streaming-update
    GET per written JSONL part file, then a commit — returned as dicts so
    a serving layer (or curl loop) can execute them. Executing needs a
    Solr install; generating the plan is in-engine.

    ``core`` ∈ grebi_nodes / grebi_edges / grebi_autocomplete, mapped to
    the matching written subdirectory."""
    import glob
    import os

    sub = {
        "grebi_nodes": "nodes",
        "grebi_edges": "edges",
        "grebi_autocomplete": "autocomplete",
    }[core]
    base = f"http://localhost:{port}/solr/{core}"
    reqs = [
        {
            "url": f"{base}/update/json/docs",
            "params": {
                "stream.file": f,
                "stream.contentType": "application/json;charset=utf-8",
            },
        }
        for f in sorted(glob.glob(os.path.join(out_dir, sub, "part-*")))
        if not f.endswith(".crc")
    ]
    reqs.append({"url": f"{base}/update", "params": {"commit": "true"}})
    return reqs
