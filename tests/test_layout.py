"""Z-order layout gates: the pruned scan must actually prune (partition
filters on the cell id, cover a strict subset of the universe), the
pruning must not change the answer, and the interleave must be a
bijection on the cell universe (two distinct bucket pairs can never
share a cell, or the cover would silently over-read forever).
"""

from pyspark.sql import functions as F

from grebi_spark.plans.layout import (
    _N_BINS,
    _bounds,
    _interleave_py,
    _z_cover,
    _zorder_root,
    zorder_scan_prune,
)
from grebi_spark.session import load_tables

from .test_plan_quality import plan_of

SF = "/root/testdata/sf0.001"


def test_interleave_is_bijective():
    universe = {
        _interleave_py(ub, db)
        for ub in range(_N_BINS)
        for db in range(_N_BINS)
    }
    assert len(universe) == _N_BINS * _N_BINS
    assert min(universe) == 0 and max(universe) == _N_BINS * _N_BINS - 1


def test_cover_is_strict_subset(spark):
    b = _bounds(spark, SF)
    cover = _z_cover(b)
    assert 0 < len(cover) < _N_BINS * _N_BINS
    assert len(set(cover)) == len(cover)


def test_zorder_scan_prunes_partitions(spark):
    df = zorder_scan_prune(spark, SF)
    plan = plan_of(df)
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "z" in seg and seg.strip()


def test_zorder_dpp_prunes_at_runtime(spark):
    """The joined-dimension variant must plan a dynamic-partition-
    pruning subquery on the fact scan (runtime pruning), and agree with
    the static-cover query row-for-row."""
    from grebi_spark.plans.layout import zorder_dpp_scan

    df = zorder_dpp_scan(spark, SF)
    plan = plan_of(df)
    assert "dynamicpruningexpression" in plan.lower()
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in zorder_scan_prune(spark, SF).collect()
    ]


def test_pruned_scan_equals_plain_scan(spark):
    """The layout changes what is read, never the answer: the same
    rectangle over the UNCLUSTERED events table must agree row-for-row."""
    ev = load_tables(spark, SF, ("events",))["events"]
    b = _bounds(spark, SF)
    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
    plain = (
        ev.filter(
            F.col("user_id").between(b["u1"], b["u2"])
            & day.between(b["d1"], b["d2"])
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
        )
        .orderBy("event_type")
    )
    assert [tuple(r) for r in zorder_scan_prune(spark, SF).collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_manifest_prunes_files_without_changing_answer(spark):
    """Stats pruning must select a strict subset of the files, and the
    pruned answer must equal the full-scan answer."""
    from grebi_spark.plans.layout import (
        _cents_rect,
        _manifest_root,
        manifest_files_for,
        manifest_skip_scan,
    )

    root, manifest = _manifest_root(spark, SF)
    b = _cents_rect(spark, SF)
    files = manifest_files_for(manifest, b["c1"], b["c2"])
    assert 0 < len(files) < len(manifest)
    full = (
        spark.read.parquet(root)
        .filter(F.col("cents").between(b["c1"], b["c2"]))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("cents_total"),
        )
        .orderBy("event_type")
    )
    assert [tuple(r) for r in manifest_skip_scan(spark, SF).collect()] == [
        tuple(r) for r in full.collect()
    ]


def test_manifest_ranges_are_disjoint(spark):
    """Range clustering is what makes the stats selective: the files'
    [min,max] cents intervals must not overlap."""
    from grebi_spark.plans.layout import _manifest_root

    _root, manifest = _manifest_root(spark, SF)
    spans = sorted((r["min_cents"], r["max_cents"]) for r in manifest)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_appended_layout_is_lossless_and_rule_stable(spark, tmp_path):
    """zorder_append bins with the layout's RECORDED bounds: the
    appended layout holds every row exactly once, and rows of the same
    (user, day) land in the same cell whether bulk-clustered or
    appended."""
    from grebi_spark.plans.layout import (
        _read_layout_bins,
        _write_layout,
        zorder_append,
    )

    ev = load_tables(spark, SF, ("events",))["events"]
    base = ev.filter(F.col("event_id") % 4 != 3)
    tail = ev.filter(F.col("event_id") % 4 == 3)
    root = str(tmp_path / "zl")
    bins = _write_layout(spark, base, root)
    zorder_append(spark, root, tail)
    laid = spark.read.parquet(root)
    assert laid.count() == ev.count()
    assert laid.select("event_id").distinct().count() == ev.count()
    assert _read_layout_bins(spark, root) == bins
    # rule stability, tested against an INDEPENDENT computation: every
    # appended row's cell must equal the base-bins z expression applied
    # directly to the tail — an append that binned with the batch's own
    # bounds (the bug the recorded rule guards against) mismatches here
    from grebi_spark.plans.layout import _layout_z_expr

    expected = sorted(
        (r["event_id"], int(r["z"]))
        for r in tail.withColumn(
            "z", F.expr(_layout_z_expr(bins)).cast("int")
        )
        .select("event_id", "z")
        .collect()
    )
    appended = sorted(
        (r["event_id"], int(r["z"]))
        for r in laid.join(tail.select("event_id"), "event_id")
        .select("event_id", "z")
        .collect()
    )
    assert appended == expected


def test_append_clamps_out_of_range_rows_to_edge_cells(spark, tmp_path):
    """Rows arriving OUTSIDE the recorded bounds must land in the edge
    cells (never outside the universe), and a rectangle reaching past
    the bounds must cover them."""
    from grebi_spark.plans.layout import (
        _N_BINS,
        _write_layout,
        _z_cover,
        zorder_append,
    )

    ev = load_tables(spark, SF, ("events",))["events"]
    root = str(tmp_path / "zc")
    bins = _write_layout(spark, ev, root)
    beyond = ev.limit(3).withColumn(
        "user_id", F.lit(bins["xu"] + 1_000_000).cast("long")
    )
    zorder_append(spark, root, beyond)
    laid = spark.read.parquet(root)
    zs = [
        int(r["z"])
        for r in laid.filter(F.col("user_id") > bins["xu"]).select("z").collect()
    ]
    assert zs and all(0 <= z < _N_BINS * _N_BINS for z in zs)
    rect = dict(
        bins,
        u1=bins["xu"],
        u2=bins["xu"] + 2_000_000,
        d1=bins["md"],
        d2=bins["xd"],
    )
    cover = _z_cover(rect, bins)
    found = laid.filter(
        F.col("z").isin(cover) & (F.col("user_id") > bins["xu"])
    ).count()
    assert found == 3


def test_compact_layout_rewrites_only_crowded_cells(spark, tmp_path):
    """Two appends crowd the touched cells with small files; compaction
    rewrites only cells over the threshold, preserves content exactly,
    and is idempotent."""
    import os

    from grebi_spark.plans.layout import (
        _write_layout,
        compact_layout,
        zorder_append,
    )

    ev = load_tables(spark, SF, ("events",))["events"]
    root = str(tmp_path / "zcomp")
    _write_layout(spark, ev.filter(F.col("event_id") % 4 == 0), root)
    zorder_append(spark, root, ev.filter(F.col("event_id") % 4 == 1))
    zorder_append(spark, root, ev.filter(F.col("event_id") % 4 == 2))

    def files_per_cell():
        out = {}
        for d in os.listdir(root):
            if d.startswith("z="):
                out[d] = sum(
                    1
                    for f in os.listdir(os.path.join(root, d))
                    if f.endswith(".parquet")
                )
        return out

    before_files = files_per_cell()
    content = lambda: sorted(  # noqa: E731
        (r["event_id"], int(r["z"]))
        for r in spark.read.parquet(root).select("event_id", "z").collect()
    )
    before = content()
    n = compact_layout(spark, root, max_files=2)
    assert n >= 1
    after_files = files_per_cell()
    assert content() == before
    # compacted cells hold one file; cells under the threshold untouched
    assert all(v == 1 for k, v in after_files.items() if before_files[k] > 2)
    assert all(
        after_files[k] == v for k, v in before_files.items() if v <= 2
    )
    assert compact_layout(spark, root, max_files=2) == 0


def test_cover_superset_property():
    """The correctness kernel of every pruned scan, property-tested
    against brute force: for ARBITRARY layout bounds and query
    rectangles (including rectangles reaching past the bounds), every
    in-rectangle point's clamped cell is in the rectangle's z-cover —
    the cover may over-read, it must never drop a matching row."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grebi_spark.plans.layout import _N_BINS, _interleave_py, _z_cover

    def clamped_bin(v, lo, hi):
        return max(0, min(_N_BINS - 1, (v - lo) * _N_BINS // (hi - lo + 1)))

    bounds = st.tuples(
        st.integers(0, 50), st.integers(0, 200),
        st.integers(0, 50), st.integers(0, 200),
    ).map(lambda t: (t[0], t[0] + t[1], t[2], t[2] + t[3]))

    @settings(max_examples=200, deadline=None)
    @given(
        b=bounds,
        rect=st.tuples(
            st.integers(-20, 260), st.integers(0, 80),
            st.integers(-20, 260), st.integers(0, 80),
        ),
        pt=st.tuples(st.integers(-20, 340), st.integers(-20, 340)),
    )
    def check(b, rect, pt):
        mu, xu, md, xd = b
        u1, su, d1, sd = rect
        u2, d2 = u1 + su, d1 + sd
        rb = {
            "mu": mu, "xu": xu, "md": md, "xd": xd,
            "u1": u1, "u2": u2, "d1": d1, "d2": d2,
        }
        cover = set(_z_cover(rb, rb))
        u, d = pt
        if u1 <= u <= u2 and d1 <= d <= d2:  # an in-rectangle row
            cell = _interleave_py(
                clamped_bin(u, mu, xu), clamped_bin(d, md, xd)
            )
            assert cell in cover

    check()


def test_layout_loses_no_rows(spark):
    """Every event lands in exactly one cell directory."""
    root, _b = _zorder_root(spark, SF)
    ev = load_tables(spark, SF, ("events",))["events"]
    laid_out = spark.read.parquet(root)
    assert laid_out.count() == ev.count()
    assert (
        laid_out.select("event_id").distinct().count()
        == ev.select("event_id").distinct().count()
    )
