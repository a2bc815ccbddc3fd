"""Versioned graph-state snapshots: atomic publication, O(1) rollback,
crash-mid-save invisibility, in-flight reader isolation, roll-forward,
and pruning — the blue/green layout shared with the durable ANN index
(fsutil.publish_version / resolve_version_dir / rollback_version).

The reference has no undo: a bad release re-runs the full build over
the surviving dumps (the Nextflow DAG rebuilds the world). Here a bad
fold is undone by swinging a pointer; no table moves.
"""

import os
import tempfile

import pytest

from grebi_spark.fsutil import next_version, publish_version, resolve_version_dir
from grebi_spark.incremental import (
    add_datasource,
    build_graph_stateful,
    load_state_current,
    prune_state_versions,
    rollback_state,
    save_state_version,
)
from grebi_spark.sources.jsonl import jsonl_to_nodes

from . import fixtures as FX
from .test_incremental import _canon
from .test_pipeline import CONFIG, _lines_df


def _tiny_sources(spark):
    a = jsonl_to_nodes(
        _lines_df(
            spark,
            FX.jsonl(
                [
                    {"id": "x:1", "grebi:type": ["t:A"], "grebi:name": ["one"]},
                    {"id": "x:2", "grebi:type": ["t:A"], "grebi:name": ["two"]},
                ]
            ),
        ),
        "srca",
    )
    b = jsonl_to_nodes(
        _lines_df(
            spark,
            FX.jsonl(
                [
                    {
                        "id": "x:3",
                        "grebi:type": ["t:B"],
                        "grebi:name": ["three"],
                        "t:rel": ["x:1"],
                    }
                ]
            ),
        ),
        "srcb",
    )
    return a, b


@pytest.fixture(scope="module")
def lifecycle(spark):
    """One shared v1(base) → verb → v2(base+srcb) version root."""
    a, b = _tiny_sources(spark)
    root = tempfile.mkdtemp(prefix="grebi_state_vtest_")
    s1 = build_graph_stateful([a], CONFIG)
    v1 = save_state_version(s1, root)
    s2 = add_datasource(s1, b)
    v2 = save_state_version(s2, root)
    return {"root": root, "v1": v1, "v2": v2, "s1": s1, "s2": s2}


def test_versions_publish_in_order(lifecycle):
    assert (lifecycle["v1"], lifecycle["v2"]) == ("v1", "v2")


def test_current_serves_latest_and_roundtrips(spark, lifecycle):
    root = lifecycle["root"]
    assert resolve_version_dir(spark, root).endswith("/v2")
    loaded = load_state_current(spark, root)
    assert _canon(loaded.graph.merged) == _canon(lifecycle["s2"].graph.merged)


def test_crash_mid_save_is_invisible(spark, lifecycle):
    """A version directory without its _COMMITTED marker (a crash
    mid-save) must neither serve nor block the next save's name."""
    root = lifecycle["root"]
    torn = os.path.join(root, "v3")
    os.makedirs(os.path.join(torn, "merged"), exist_ok=True)
    with open(os.path.join(torn, "merged", "part-torn.parquet"), "w") as fh:
        fh.write("torn write")
    assert resolve_version_dir(spark, root).endswith("/v2")
    # the torn directory's NAME is taken; the next save must skip it
    assert next_version(spark, root) == "v4"


def test_rollback_restores_pre_verb_value_and_isolates_readers(spark, lifecycle):
    root = lifecycle["root"]
    # a reader opens v2 BEFORE the rollback...
    pre_swap_reader = load_state_current(spark, root).graph.merged
    assert rollback_state(spark, root) == "v1"
    # ...the rolled-back snapshot serves the exact pre-verb graph...
    loaded = load_state_current(spark, root)
    assert _canon(loaded.graph.merged) == _canon(lifecycle["s1"].graph.merged)
    # ...and the in-flight reader still completes against v2's files
    assert _canon(pre_swap_reader) == _canon(lifecycle["s2"].graph.merged)


def test_maintenance_resumes_on_rolled_back_state(spark, lifecycle):
    """The rolled-back snapshot is a live maintenance input: re-applying
    the verb on it must equal the graph the verb produced originally."""
    _a, b = _tiny_sources(spark)
    again = add_datasource(load_state_current(spark, lifecycle["root"]), b)
    assert _canon(again.graph.merged) == _canon(lifecycle["s2"].graph.merged)


def test_roll_forward_then_prune(spark, lifecycle):
    root = lifecycle["root"]
    # rollback moved no data, so v2 can be re-published (roll-forward)
    publish_version(spark, root, "v2")
    assert resolve_version_dir(spark, root).endswith("/v2")
    assert rollback_state(spark, root) == "v1"
    # prune drops everything but CURRENT's version (v1 here) — v2 and
    # the torn v3 directory are both swept
    assert prune_state_versions(spark, root) == 2
    with pytest.raises(ValueError):
        rollback_state(spark, root)


def test_rollback_on_flat_layout_raises(spark):
    root = tempfile.mkdtemp(prefix="grebi_state_flat_")
    with pytest.raises(ValueError):
        rollback_state(spark, root)
