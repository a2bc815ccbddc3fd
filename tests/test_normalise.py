"""Prefix normalisation: longest-match semantics, both physical modes."""

import pytest
from pyspark.sql import functions as F

from grebi_spark.operators import normalise as N
from grebi_spark.operators.normalise import PrefixMap, normalise_prefixes
from grebi_spark.schema import INGESTED

MAPPING = {
    "http://purl.obolibrary.org/obo/MONDO_": "mondo:",
    "http://purl.obolibrary.org/obo/": "obo:",  # shorter — must lose to MONDO_
    "MONDO:": "mondo:",
}

ROWS = [
    ("s", "d", "e", "p", "http://purl.obolibrary.org/obo/MONDO_0005044", None),
    ("s", "d", "e", "p", "http://purl.obolibrary.org/obo/UBERON_1", None),
    ("s", "d", "e", "p", "MONDO:123", None),
    ("s", "d", "e", "p", "unrelated", None),
]
EXPECTED = {"mondo:0005044", "obo:UBERON_1", "mondo:123", "unrelated"}


@pytest.mark.parametrize("force_udf", [False, True])
def test_longest_match_both_modes(spark, monkeypatch, force_udf):
    if force_udf:
        monkeypatch.setattr(N, "EXPR_MODE_MAX_PREFIXES", 0)
    df = spark.createDataFrame(ROWS, INGESTED)
    out = normalise_prefixes(df, PrefixMap(MAPPING), columns=("value",))
    assert {r["value"] for r in out.collect()} == EXPECTED


def test_expr_mode_stays_jvm_side(spark):
    """The small-map path must not contain a Python evaluation node."""
    df = spark.createDataFrame(ROWS, INGESTED)
    out = normalise_prefixes(df, PrefixMap(MAPPING), columns=("value",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
