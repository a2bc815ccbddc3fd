"""Property-based invariants (hypothesis): the Spark expressions must
agree with straightforward Python reimplementations on arbitrary input."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from grebi_spark.operators.groups import id_score
from grebi_spark.operators.normalise import PrefixMap, rewrite_expr

TOKEN = st.text(
    alphabet="abcdefghij:/_0123456789ABCDE.#-", min_size=0, max_size=24
)


def py_id_score(s: str) -> int:
    """Reference scoring reimplemented directly from
    02_assign_ids/grebi_identifiers2groups/src/main.rs:163-193."""
    if s.startswith("grebi:"):
        return -2147483648
    if s.startswith("biolink:"):
        return -2147483648 + 1000
    score = 0
    if ":" in s and not s.startswith("http"):
        score -= 1000
    score -= sum(1 for c in s if c.isalpha() and c.isascii())
    return score


@settings(max_examples=8, deadline=None)
@given(st.lists(TOKEN, min_size=1, max_size=30))
def test_id_score_matches_reference(spark, ids):
    ids = [i for i in ids if i]  # empty ids can't occur (check_id rejects)
    if not ids:
        return
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {r["id"]: r["s"] for r in df.select("id", id_score(F.col("id")).alias("s")).collect()}
    for i in set(ids):
        assert got[i] == py_id_score(i), i


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abchttp:/._#", min_size=1, max_size=12),
        st.sampled_from(["x:", "y:", "z:"]),
        min_size=1,
        max_size=8,
    ),
    st.lists(TOKEN, min_size=1, max_size=30),
)
def test_prefix_rewrite_matches_longest_match(spark, mapping, values):
    pm = PrefixMap(mapping)

    def naive(s):
        best = None
        for p in mapping:
            if s.startswith(p) and (best is None or len(p) > len(best)):
                best = p
        return mapping[best] + s[len(best):] if best is not None else s

    df = spark.createDataFrame([(v,) for v in values], ["v"])
    got = [r["out"] for r in df.select(rewrite_expr(pm, F.col("v")).alias("out")).collect()]
    # careful: equal-length prefixes can't both match the same string start
    # unless identical, so longest-match is unambiguous
    assert got == [naive(v) for v in values]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["n:1", "n:2", "n:3"]),          # node_id
            st.sampled_from(["dsA", "dsB", "dsC"]),          # datasource
            st.sampled_from(["grebi:type", "p:k1", "p:k2"]), # prop_key
            st.sampled_from(["v1", "v2", "v3"]),             # value
        ),
        min_size=1,
        max_size=40,
    )
)
def test_merge_invariants(spark, rows):
    from grebi_spark.config import SubgraphConfig
    from grebi_spark.operators.merge import merge_nodes

    df = spark.createDataFrame(
        [("s", ds, n, [n], k, v, None) for (n, ds, k, v) in rows],
        "subgraph string, datasource string, node_id string, source_ids array<string>, "
        "prop_key string, value string, value_props string",
    )
    out = merge_nodes(df, SubgraphConfig()).collect()
    typed = {n for (n, ds, k, v) in rows if k == "grebi:type"}
    keys = [(r["node_id"], r["prop_key"], r["value"]) for r in out]
    # dedup on (node, key, value[, props])
    assert len(keys) == len(set(keys))
    for r in out:
        # untyped-clique elimination
        assert r["node_id"] in typed
        # provenance arrays sorted + distinct
        assert r["datasources"] == sorted(set(r["datasources"]))
        assert r["source_ids"] == sorted(set(r["source_ids"]))
        # provenance is exactly the contributing datasources
        expected = sorted(
            {ds for (n, ds, k, v) in rows if (n, k, v) == (r["node_id"], r["prop_key"], r["value"])}
        )
        assert r["datasources"] == expected
