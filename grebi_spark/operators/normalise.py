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


def trie_pattern(keys) -> str | None:
    """Compile a prefix set into a TRIE-shaped regex pattern with
    longest-match semantics — the Spark-side twin of the reference's
    byte trie (grebi_shared/src/prefix_map.rs:31-197).

    A flat longest-first alternation (`^(?:k1|k2|…)`) degrades linearly
    in the number of alternatives per input string — at the reference's
    real map (~60k Bioregistry prefixes, prefix_maps/
    make_prefix_maps.py) that is 60k ordered branch attempts per
    string. The trie factors shared spines (every
    `http://purl.obolibrary.org/obo/…` key walks one common chain), so
    match cost is bounded by the matched prefix's LENGTH, independent
    of map size. Longest-match is preserved structurally: at a node
    that is both a terminal and has children, the empty alternative is
    emitted LAST, so the backtracking engine prefers extending the
    match and falls back to the shorter terminal only when no longer
    key completes."""
    trie: dict = {}
    for k in keys:
        node = trie
        for ch in k:
            node = node.setdefault(ch, {})
        node[""] = {}  # terminal marker
    if not trie:
        return None

    def emit(node: dict) -> str:
        terminal = "" in node
        children = sorted((ch, sub) for ch, sub in node.items() if ch != "")
        if not children:
            return ""  # pure terminal: the key ends here
        alts = [re.escape(ch) + emit(sub) for ch, sub in children]
        return "(?:" + "|".join(alts) + ("|" if terminal else "") + ")"

    return "^" + emit(trie)


class PrefixMap:
    """Longest-match prefix rewriter.

    ``mapping``: {match_prefix: replacement_prefix}, e.g.
    {"http://purl.obolibrary.org/obo/MONDO_": "mondo:", "MONDO:": "mondo:"}.
    """

    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)

    def compiled(self):
        pat = trie_pattern(self.mapping)
        return re.compile(pat) if pat else None

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


# per-worker compiled-pattern cache: a Bioregistry-scale trie pattern is
# megabytes of regex — compile it once per executor process, NOT once per
# Arrow batch. Keyed by the pattern STRING itself (the broadcast hands
# each worker one cached str object, so its hash is computed once) and
# BOUNDED: a long maintenance loop creates a fresh broadcast per fold,
# and an unbounded identity-keyed cache would pin every dead broadcast's
# mapping + compiled trie in executor memory forever.
@lru_cache(maxsize=4)
def _compile_cached(pattern: str) -> re.Pattern:
    # a def (not lru_cache(re.compile) directly): cloudpickle must be
    # able to pickle the UDF closure's reference to this by module path,
    # and a wrapper masquerading as re.compile defeats that check
    return re.compile(pattern)


def make_rewrite_udf(spark, prefix_map: PrefixMap):
    """Broadcast the map + its driver-built trie pattern, return a
    vectorised string-rewrite column fn. Match cost per string is
    bounded by the matched prefix's length (trie_pattern), so the UDF
    holds its throughput at the reference's real ~60k-prefix map
    (suite-benchmarked within ~2× of a 20-prefix map per row)."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    pattern = trie_pattern(prefix_map.mapping)
    bc = spark.sparkContext.broadcast((pattern, prefix_map.mapping))

    @pandas_udf("string")
    def rewrite(col: pd.Series) -> pd.Series:
        pattern, mapping = bc.value
        if pattern is None:
            return col
        pat = _compile_cached(pattern)

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
