"""RDF ingest (reference S8, 01_ingest/grebi_rdf2jsonl/src/main.rs:87-427).

The reference loads an entire RDF graph into RAM with the sophia crate and
re-groups triples by subject. That cannot scale past one machine; here the
line-oriented N-Triples / N-Quads serialisations are parsed *distributed*
with built-in regexp expressions (splittable text input, no Python in the
loop), grouped by subject with an ordinary shuffle. RDF/XML and Turtle —
not line-splittable — are parsed per-file in mapInPandas workers by the
self-contained parsers in rdf_convert.py (see read_rdf_documents), so any
`.owl`/`.ttl` datasource ingests directly, matching the reference's
format switch; ubergraph's `.nq.gz` stays on the splittable path.

Also implemented: OWL Axiom / rdf:Statement reification folding
(main.rs:340-404) — an owl:Axiom subject annotating (source, property,
target) is folded into a reified value on the source entity; the axiom
node itself disappears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
_IRI = r"<([^>]*)>"
# IRI | blank node | literal (with optional datatype/lang tag)
_TERM = r'(<[^>]*>|_:[^\s]+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)'

OWL_AXIOM_PROPS = {
    "source": "owl:annotatedSource",
    "property": "owl:annotatedProperty",
    "target": "owl:annotatedTarget",
    "type_value": "owl:Axiom",
}
RDF_STATEMENT_PROPS = {
    "source": "rdf:subject",
    "property": "rdf:predicate",
    "target": "rdf:object",
    "type_value": "rdf:Statement",
}


def _clean_term(col: Column) -> Column:
    """IRI → bare string; literal → lexical form; blank node verbatim."""
    iri = F.regexp_extract(col, r"^<(.*)>$", 1)
    lit = F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1)
    return (
        F.when(col.startswith("<"), iri)
        .when(col.startswith('"'), F.regexp_replace(lit, r'\\(["\\])', "$1"))
        .otherwise(col)
    )


def read_nquads(
    spark: SparkSession, path: str, graph: str | None = None
) -> DataFrame:
    """Parse N-Triples/N-Quads text → (s, p, o, g) DataFrame.

    ``graph`` filters quads to one named graph (--rdf-graph option).
    """
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    pat = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}(?:\s+{_TERM})?\s*\.\s*$"
    parsed = lines.select(
        F.regexp_extract("value", pat, 1).alias("s_raw"),
        F.regexp_extract("value", pat, 2).alias("p_raw"),
        F.regexp_extract("value", pat, 3).alias("o_raw"),
        F.regexp_extract("value", pat, 4).alias("g_raw"),
    ).filter(F.col("s_raw") != "")
    out = parsed.select(
        _clean_term(F.col("s_raw")).alias("s"),
        _clean_term(F.col("p_raw")).alias("p"),
        _clean_term(F.col("o_raw")).alias("o"),
        _clean_term(F.col("g_raw")).alias("g"),
    )
    if graph:
        out = out.filter(F.col("g") == graph)
    return out


def fold_reification(
    triples: DataFrame,
    type_prop: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    axiom_shapes: tuple[dict, ...] = (
        {
            "source": "http://www.w3.org/2002/07/owl#annotatedSource",
            "property": "http://www.w3.org/2002/07/owl#annotatedProperty",
            "target": "http://www.w3.org/2002/07/owl#annotatedTarget",
            "type_value": "http://www.w3.org/2002/07/owl#Axiom",
        },
        {
            "source": "http://www.w3.org/1999/02/22-rdf-syntax-ns#subject",
            "property": "http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate",
            "target": "http://www.w3.org/1999/02/22-rdf-syntax-ns#object",
            "type_value": "http://www.w3.org/2000/01/rdf-schema#Statement",
        },
    ),
) -> tuple[DataFrame, DataFrame]:
    """Split triples into (plain triples, folded reified statements).

    Returns ``(plain, reified)`` where ``reified`` has columns
    (s, p, o, props_json): the annotated (source, property, target) plus the
    axiom's remaining annotation triples as canonical JSON. Implemented as a
    grouped pivot over the axiom subjects then re-join — two shuffles on the
    (small) axiom subset, zero Python.
    """
    shape = axiom_shapes[0]
    axiom_subjects = triples.filter(
        (F.col("p") == type_prop) & F.col("o").isin([s["type_value"] for s in axiom_shapes])
    ).select(F.col("s").alias("ax"))
    ax_triples = triples.join(
        F.broadcast(axiom_subjects), triples.s == axiom_subjects.ax, "left_semi"
    )
    plain = triples.join(
        F.broadcast(axiom_subjects), triples.s == axiom_subjects.ax, "left_anti"
    )

    core_props = set()
    for sh in axiom_shapes:
        core_props |= {sh["source"], sh["property"], sh["target"]}
    grouped = ax_triples.groupBy("s").agg(
        F.collect_list(F.struct("p", "o")).alias("pairs")
    )

    def first_of(props: list[str]) -> Column:
        arr = F.filter(F.col("pairs"), lambda x: x.p.isin(props))
        return F.element_at(arr, 1)["o"]

    anno = F.array_sort(
        F.filter(
            F.col("pairs"),
            lambda x: ~x.p.isin(list(core_props) + [type_prop]),
        )
    )
    props_json = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                anno,
                lambda x: F.concat(
                    F.lit('"'),
                    F.regexp_replace(x.p, r'(["\\])', r"\\$1"),
                    F.lit('":["'),
                    F.regexp_replace(x.o, r'(["\\])', r"\\$1"),
                    F.lit('"]'),
                ),
            ),
            ",",
        ),
        F.lit("}"),
    )
    reified = grouped.select(
        first_of([sh["source"] for sh in axiom_shapes]).alias("s"),
        first_of([sh["property"] for sh in axiom_shapes]).alias("p"),
        first_of([sh["target"] for sh in axiom_shapes]).alias("o"),
        props_json.alias("props_json"),
    ).filter(F.col("s").isNotNull() & F.col("p").isNotNull())
    return plain, reified


def read_rdf_documents(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """RDF/XML or Turtle files → distributed (s, p, o, g) triples.

    These serialisations are not line-splittable, so the unit of
    parallelism is the FILE (the same boundary the reference's in-RAM
    sophia load has — 01_ingest/grebi_rdf2jsonl/src/main.rs:87-130), but
    many files parse concurrently in ``mapInPandas`` workers and the
    output lands directly in the distributed triple relation. Blank-node
    labels are salted with a per-file hash so graphs never collide.
    Handles ``.gz`` transparently.
    """
    import pandas as pd  # local import: executor-side dependency only

    from .rdf_convert import detect_format, parse_document

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches):
        import gzip
        import hashlib

        for pdf in batches:
            out_s, out_p, out_o = [], [], []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                f = fmt or detect_format(fpath)
                data = bytes(blob)
                if fpath.lower().endswith(".gz"):
                    data = gzip.decompress(data)
                salt = hashlib.sha1(fpath.encode()).hexdigest()[:8]
                for s, p, o in parse_document(data.decode("utf-8"), f, salt + "_"):
                    out_s.append(s); out_p.append(p); out_o.append(o)
            yield pd.DataFrame({"s": out_s, "p": out_p, "o": out_o})

    return files.mapInPandas(_parse, "s string, p string, o string").withColumn(
        "g", F.lit("")
    )


def read_rdf(
    spark: SparkSession, path: str, fmt: str | None = None, graph: str | None = None
) -> DataFrame:
    """Format-dispatching RDF reader (the reference's --rdf-format switch):
    line-oriented N-Triples/N-Quads stay on the fully splittable regexp
    path; RDF/XML and Turtle go through the per-file parser."""
    from .rdf_convert import detect_format

    f = fmt or detect_format(path)
    if f in ("ntriples", "nquads"):
        return read_nquads(spark, path, graph=graph)
    return read_rdf_documents(spark, path, fmt=f)


def _subject_json(triples: DataFrame) -> DataFrame:
    """(s, p, o) triples → one canonical JSON property map per subject:
    ``{"p1":["v1","v2"],...}`` with keys and values sorted — the nested
    object shape the reference's term_to_json emits (main.rs:280-340,
    sans "id"). Pure built-ins: two aggregates + to_json."""
    per_pred = triples.groupBy("s", "p").agg(
        F.array_sort(F.collect_set("o")).alias("vs")
    )
    return per_pred.groupBy("s").agg(
        F.to_json(
            F.map_from_entries(F.array_sort(F.collect_list(F.struct("p", "vs"))))
        ).alias("nested_json")
    )


def nest_blank_nodes(
    triples: DataFrame,
    max_depth: int = 3,
    nest_predicates: tuple[str, ...] = (),
) -> DataFrame:
    """Fold blank-node objects (always) and objects of ``nest_predicates``
    (the reference's --nest-objects-of-predicate) into inline JSON values,
    innermost-first; consumed subjects leave the top-level stream — the
    reference nests bnode objects recursively via term_to_json and
    excludes nested subjects from write_subjects (main.rs:160-161,
    246-254, 388-391).

    Distributed shape: each depth round is one aggregate over the
    still-unresolved bnode subjects plus one replacement join — no
    recursion, no driver-side graph. Rounds = bnode nesting depth
    (OWL restrictions: 1-2). nest_predicates resolve after bnodes, one
    level deep."""
    bn_subjects = triples.filter(F.col("s").startswith("_:")).select("s").distinct()
    for _ in range(max_depth):
        # leaves: bnode subjects none of whose objects is an unresolved
        # bnode subject (dangling _: references count as plain values)
        blocked = (
            triples.join(
                bn_subjects.withColumnRenamed("s", "o"), "o", "left_semi"
            )
            .filter(F.col("s").startswith("_:"))
            .select("s")
            .distinct()
        )
        leaves = bn_subjects.join(blocked, "s", "left_anti")
        if leaves.limit(1).count() == 0:
            break
        leaf_json = _subject_json(
            triples.join(leaves, "s", "left_semi")
        ).withColumnRenamed("s", "__o")
        triples = (
            triples.join(leaf_json, triples.o == F.col("__o"), "left")
            .withColumn("o", F.coalesce("nested_json", F.col("o")))
            .drop("__o", "nested_json")
            .join(leaves, "s", "left_anti")
        )
        bn_subjects = bn_subjects.join(leaves, "s", "left_anti")
    if nest_predicates:
        targets = (
            triples.filter(F.col("p").isin(list(nest_predicates)))
            .select(F.col("o").alias("s"))
            .distinct()
        )
        tgt_json = _subject_json(
            triples.join(targets, "s", "left_semi")
        ).withColumnRenamed("s", "__o")
        triples = (
            triples.join(
                tgt_json,
                (triples.o == F.col("__o"))
                & F.col("p").isin(list(nest_predicates)),
                "left",
            )
            .withColumn("o", F.coalesce("nested_json", F.col("o")))
            .drop("__o", "nested_json")
            .join(targets, "s", "left_anti")
        )
    return triples


def rdf_to_nodes(
    spark: SparkSession,
    path: str,
    datasource: str,
    subgraph: str = "default",
    graph: str | None = None,
    type_to_grebi: bool = True,
    fmt: str | None = None,
    nest_bnodes: bool = True,
    nest_predicates: tuple[str, ...] = (),
) -> DataFrame:
    """RDF file(s) → long-form INGESTED rows, reification folded,
    blank-node objects nested as inline JSON (reference parity).

    Accepts N-Quads/N-Triples (splittable scan) and RDF/XML/Turtle
    (per-file distributed parse), matching the reference's format switch.
    """
    triples = read_rdf(spark, path, fmt=fmt, graph=graph)
    plain, reified = fold_reification(triples)
    if nest_bnodes or nest_predicates:
        # axioms are folded first so reification bnodes never reach here
        plain = nest_blank_nodes(
            plain, nest_predicates=nest_predicates if nest_predicates else ()
        )
    type_prop = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = plain.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        F.col("s").alias("entity_id"),
        (
            F.when(F.col("p") == type_prop, F.lit("grebi:type")).otherwise(F.col("p"))
            if type_to_grebi
            else F.col("p")
        ).alias("prop_key"),
        F.col("o").alias("value"),
        F.lit(None).cast("string").alias("value_props"),
    )
    reified_rows = reified.select(
        F.lit(subgraph).alias("subgraph"),
        F.lit(datasource).alias("datasource"),
        F.col("s").alias("entity_id"),
        F.col("p").alias("prop_key"),
        F.col("o").alias("value"),
        F.col("props_json").alias("value_props"),
    )
    ids = (
        plain.select("s")
        .distinct()
        .select(
            F.lit(subgraph).alias("subgraph"),
            F.lit(datasource).alias("datasource"),
            F.col("s").alias("entity_id"),
            F.lit("id").alias("prop_key"),
            F.col("s").alias("value"),
            F.lit(None).cast("string").alias("value_props"),
        )
    )
    return rows.unionAll(reified_rows).unionAll(ids)
