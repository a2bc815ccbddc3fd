"""Table profiling — the generic form of J4's global index aggregates
(04_index/grebi_index collects per-property value counts across the
whole graph; this is the same scan specialised to any table's columns).

One pass over the fact table: ``stack`` melts the row into
(column, value-as-string) pairs — a single Expand operator, no
re-scan per column — and one aggregate computes null and distinct
counts per column. Casting to string is injective for every profiled
type, so the distinct counts equal the raw columns'; the cast values
never leave the engine.

Scale shape: scan → Expand (×n_cols rows, still map-side) → one
groupBy on the tiny column-name key with partial aggregation. The
alternative (one aggregate pass per column) scans the table n_cols
times; this is the standard profiling trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

_PROFILE_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    stack_args = ", ".join(
        f"'{c}', cast({c} as string)" for c in _PROFILE_COLS
    )
    melted = li.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_args}) as (col, val)")
    )
    return (
        melted.groupBy("col")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("val").isNull().cast("long")).alias("n_nulls"),
            F.countDistinct("val").alias("n_distinct"),
        )
        .orderBy("col")
    )


def _profile_oracle() -> str:
    selects = [
        f"""SELECT '{c}' AS col, count(*) AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::bigint AS n_nulls,
       count(DISTINCT {c}) AS n_distinct
FROM lineitem"""
        for c in _PROFILE_COLS
    ]
    return "SELECT * FROM (\n" + "\nUNION ALL\n".join(selects) + "\n) ORDER BY col"


def table_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of table_profile: HLL `approx_count_distinct`
    in the SAME melt plan (the 64× soak measured the exact variant
    linear in rows×cols — this one is a fixed-size mergeable sketch per
    column). Inverted contract like approx_distinct_check: the oracle
    pins the exact distinct counts plus literal TRUE; a hash-match
    proves every sketch estimate landed within the 5% bound."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    stack_args = ", ".join(
        f"'{c}', cast({c} as string)" for c in _PROFILE_COLS
    )
    melted = li.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_args}) as (col, val)")
    )
    # pre-aggregate by (col, val) BEFORE the sketch: HLL registers depend
    # only on the SET of hashed values, so approx_count_distinct over the
    # deduplicated pairs is bit-identical to running it over every row —
    # but hashes ~40× fewer values here (guide §2.3: aggregate before you
    # shuffle; measured 4.5 s → 2.3 s at sf0.1, result-identical). The
    # exact leg falls out of the same pre-aggregation as count(val).
    byval = melted.groupBy("col", "val").agg(F.count("*").alias("cnt"))
    prof = byval.groupBy("col").agg(
        F.sum("cnt").alias("n_rows"),
        F.count("val").alias("exact"),
        F.approx_count_distinct("val", rsd=0.02).alias("approx"),
    )
    return (
        prof.select(
            "col",
            "n_rows",
            F.col("exact").alias("n_distinct"),
            (
                F.abs(F.col("approx") - F.col("exact")) / F.col("exact") <= 0.05
            ).alias("sketch_within_5pct"),
        )
        .orderBy("col")
    )


def _profile_sketch_oracle() -> str:
    selects = [
        f"""SELECT '{c}' AS col, count(*) AS n_rows,
       count(DISTINCT {c}) AS n_distinct,
       TRUE AS sketch_within_5pct
FROM lineitem"""
        for c in _PROFILE_COLS
    ]
    return "SELECT * FROM (\n" + "\nUNION ALL\n".join(selects) + "\n) ORDER BY col"


QUERIES = {
    "table_profile": table_profile,
    "table_profile_sketch": table_profile_sketch,
}
ORACLES = {
    "table_profile": _profile_oracle(),
    "table_profile_sketch": _profile_sketch_oracle(),
}
