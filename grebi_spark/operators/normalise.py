"""N1 — prefix normalisation.

The reference rewrites *every* JSON string in every row through a byte trie
of Bioregistry prefixes with longest-match semantics
(01_ingest/grebi_normalise_prefixes/src/main.rs:17-77,
grebi_shared/src/prefix_map.rs:31-197).

Spark design: the prefix map is broadcast once; the rewrite is a
vectorised Pandas UDF (Arrow batches) applying one precompiled
longest-first alternation regex anchored at the string start. This is the
engine's single unavoidable custom scalar function (SURVEY.md §7.4) — it is
a *map-side, shuffle-free* stage, so at 100 TB it scales linearly with
input splits.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


class PrefixMap:
    """Longest-match prefix rewriter.

    ``mapping``: {match_prefix: replacement_prefix}, e.g.
    {"http://purl.obolibrary.org/obo/MONDO_": "mondo:", "MONDO:": "mondo:"}.
    """

    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)

    def compiled(self):
        keys = sorted(self.mapping, key=len, reverse=True)
        if not keys:
            return None
        return re.compile("^(?:" + "|".join(re.escape(k) for k in keys) + ")")

    def rewrite(self, s: str) -> str:
        pat = self._pat()
        if pat is None or s is None:
            return s
        m = pat.match(s)
        if not m:
            return s
        return self.mapping[m.group(0)] + s[m.end() :]

    @lru_cache(maxsize=1)
    def _pat(self):
        return self.compiled()


def make_rewrite_udf(spark, prefix_map: PrefixMap):
    """Broadcast the map, return a vectorised string-rewrite column fn."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    bc = spark.sparkContext.broadcast(prefix_map.mapping)

    @pandas_udf("string")
    def rewrite(col: pd.Series) -> pd.Series:
        mapping = bc.value
        keys = sorted(mapping, key=len, reverse=True)
        if not keys:
            return col
        pat = re.compile("^(?:" + "|".join(re.escape(k) for k in keys) + ")")

        def one(s):
            if s is None:
                return None
            m = pat.match(s)
            return mapping[m.group(0)] + s[m.end():] if m else s

        return col.map(one)

    return rewrite


def rewrite_expr(prefix_map: PrefixMap, col: F.Column) -> F.Column:
    """Pure-expression longest-match rewrite: a when-chain ordered
    longest-prefix-first. JVM-side (whole-stage codegen), zero Python —
    the fast path for maps up to a few hundred prefixes."""
    out = col
    expr = None
    for p in sorted(prefix_map.mapping, key=len, reverse=True):
        repl = prefix_map.mapping[p]
        cond = col.startswith(p)
        val = F.concat(F.lit(repl), F.substring(col, len(p) + 1, 2**30))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return out if expr is None else expr.otherwise(col)


# above this many prefixes the when-chain stops codegen-ing well; fall
# back to the Arrow-batched UDF with one compiled alternation regex
EXPR_MODE_MAX_PREFIXES = 200


def normalise_prefixes(
    nodes_long: DataFrame,
    prefix_map: PrefixMap,
    columns: tuple[str, ...] = ("entity_id", "prop_key", "value"),
) -> DataFrame:
    """Apply longest-prefix canonicalisation to the long-form columns.

    Physical strategy is picked by map size: small maps become a JVM
    when-chain (codegen'd, no Python); big maps (the full Bioregistry is
    thousands of prefixes) use the broadcast + Pandas-UDF path.

    ``value_props`` JSON strings are left intact by default: the reference
    normalises them too, but in long form reified metadata is display
    payload, not join keys; pass columns=(…, "value_props") to include it.
    """
    out = nodes_long
    if len(prefix_map.mapping) <= EXPR_MODE_MAX_PREFIXES:
        for c in columns:
            out = out.withColumn(c, rewrite_expr(prefix_map, F.col(c)))
        return out
    spark = nodes_long.sparkSession
    rewrite = make_rewrite_udf(spark, prefix_map)
    for c in columns:
        out = out.withColumn(c, rewrite(F.col(c)))
    return out
