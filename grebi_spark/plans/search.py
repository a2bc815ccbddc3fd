"""Search / facet / autocomplete / edge-page semantics (SURVEY.md §2.5
Q6–Q8) — the Solr-parity subset: field-weighted ranking, negative filters,
facet counts, pagination — over DataFrames.

Lucene-grade relevance is explicitly out of scope (SURVEY §2.5 Q6); what
is preserved is the *semantics*: deterministic score ordering by field
weight, exact-beats-prefix-beats-contains, facet counting with the search
filter applied, stable pagination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables


def search_score(text: Column, term: str) -> Column:
    """Deterministic weighted score: exact > prefix > contains, with a
    length tiebreak (shorter = better), mirroring the boost ladder
    id^1000 > name^900 > … (GrebiApi.java:189-197)."""
    t = term.lower()
    lower = F.lower(text)
    return (
        F.when(lower == t, F.lit(1000))
        .when(lower.startswith(t), F.lit(900))
        .when(lower.contains(t), F.lit(400))
        .otherwise(F.lit(0))
    ) - F.length(text) / F.lit(10000.0)


def doc_search_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted full-text search with pagination over documents:
    term='spark merge', page 2 of size 10, scored then doc_id tiebreak."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    term = "spark merge"
    scored = d.withColumn("score", F.round(search_score(F.col("text"), term), 4))
    return (
        scored.filter(F.lower("text").contains(term.lower()))
        .select("doc_id", "lang", "source", "score")
        .orderBy(F.desc("score"), "doc_id")
        .offset(10)
        .limit(10)
    )


ORACLE_DOC_SEARCH = """
WITH scored AS (
  SELECT doc_id, lang, source,
         round((CASE WHEN lower(text) = 'spark merge' THEN 1000
               WHEN lower(text) LIKE 'spark merge%' THEN 900
               WHEN lower(text) LIKE '%spark merge%' THEN 400
               ELSE 0 END) - length(text) / 10000.0, 4) AS score
  FROM documents
  WHERE lower(text) LIKE '%spark merge%'
)
SELECT doc_id, lang, source, score FROM scored
ORDER BY score DESC, doc_id
LIMIT 10 OFFSET 10
"""


def doc_search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet counts with the search filter applied (facet.field semantics,
    GrebiSolrQuery.java:60-150): counts by lang and by source, unioned as
    (facet_field, facet_value, n)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    hits = d.filter(F.lower("text").contains("join"))
    by_lang = hits.groupBy(F.col("lang").alias("facet_value")).agg(
        F.count("*").alias("n")
    ).select(F.lit("lang").alias("facet_field"), "facet_value", "n")
    by_source = hits.groupBy(F.col("source").alias("facet_value")).agg(
        F.count("*").alias("n")
    ).select(F.lit("source").alias("facet_field"), "facet_value", "n")
    return by_lang.union(by_source).orderBy("facet_field", "facet_value")


ORACLE_DOC_FACETS = """
SELECT * FROM (
  SELECT 'lang' AS facet_field, lang AS facet_value, count(*) AS n
  FROM documents WHERE lower(text) LIKE '%join%' GROUP BY lang
  UNION ALL
  SELECT 'source', source, count(*)
  FROM documents WHERE lower(text) LIKE '%join%' GROUP BY source
) ORDER BY facet_field, facet_value
"""


def autocomplete_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete (Q7): prefix/contains-ranked lookup on the distinct
    name list, exact > prefix > contains, shortest-first tiebreak
    (GrebiSolrClient.java:147-180)."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    q = "bl"
    names = p.select("p_name").distinct()
    return (
        names.withColumn(
            "rank",
            F.when(F.lower("p_name") == q, 0)
            .when(F.lower("p_name").startswith(q), 1)
            .when(F.lower("p_name").contains(q), 2)
            .otherwise(3),
        )
        .filter(F.col("rank") < 3)
        .orderBy("rank", F.length("p_name"), "p_name")
        .select("p_name", F.col("rank").cast("int").alias("rank"))
        .limit(10)
    )


ORACLE_AUTOCOMPLETE = """
SELECT p_name, rank::int AS rank FROM (
  SELECT DISTINCT p_name,
         CASE WHEN lower(p_name) = 'bl' THEN 0
              WHEN lower(p_name) LIKE 'bl%' THEN 1
              WHEN lower(p_name) LIKE '%bl%' THEN 2
              ELSE 3 END AS rank
  FROM part
) WHERE rank < 3
ORDER BY rank, length(p_name), p_name
LIMIT 10
"""


def edge_page_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-edge page (Q8): edges by target id with sort + pagination +
    endpoint hydration (GrebiApi.java:81-176). Here: lineitems into one
    part, hydrated with supplier names, page 1 size 20."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    li, s = t["lineitem"], t["supplier"]
    return (
        li.filter(F.col("l_partkey") == 42)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_orderkey").cast("long").alias("orderkey"),
            F.col("l_linenumber").cast("int").alias("linenumber"),
            F.col("s_name").alias("supplier_name"),
            F.round("l_extendedprice", 2).alias("price"),
        )
        .orderBy(F.desc("price"), "orderkey", "linenumber")
        .limit(20)
    )


ORACLE_EDGE_PAGE = """
SELECT l_orderkey::bigint AS orderkey,
       l_linenumber::int AS linenumber,
       s_name AS supplier_name,
       round(l_extendedprice, 2) AS price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE l_partkey = 42
ORDER BY price DESC, orderkey, linenumber
LIMIT 20
"""


QUERIES = {
    "doc_search_page": doc_search_page,
    "doc_search_facets": doc_search_facets,
    "autocomplete_parts": autocomplete_parts,
    "edge_page_incoming": edge_page_incoming,
}

ORACLES = {
    "doc_search_page": ORACLE_DOC_SEARCH,
    "doc_search_facets": ORACLE_DOC_FACETS,
    "autocomplete_parts": ORACLE_AUTOCOMPLETE,
    "edge_page_incoming": ORACLE_EDGE_PAGE,
}
