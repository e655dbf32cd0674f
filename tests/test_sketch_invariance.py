"""Sketch-estimate partition invariance is a TOLERANCE contract, not
bit-equality.

Round-5 finding: `hll_partition_merge` failed the exact invariance
sweep at sf0.01 — per-year HLL estimates shifted by up to ~1.3%
between 32 and 7 shuffle partitions on identical data. That is real
DataSketches behavior, not a bug: a sketch that was never merged
serves the stream-order-sensitive HIP estimator, one that went
through a union serves the register-composite estimator, and the
partial-aggregation tree (which depends on the shuffle width) decides
which path each group takes. t-digest (`approx_percentile`) centroid
boundaries are likewise merge-order-dependent.

The fix is to state the true contract: sketch ESTIMATES are
approximate with a bounded relative wobble under re-partitioning.
`QuerySpec.invariance_rtol` carries the bound; the invariance sweep
(scripts/check_invariance.py) asserts it instead of bit-equality for
flagged queries; this test pins the bound at sf0.01 — the scale where
the drift was actually observed — so a regression that blows past the
tolerance (e.g. an accidental non-deterministic groupBy under the
sketch) still fails loudly.
"""

from __future__ import annotations

import os

import pytest

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()

# (query, key columns). The columns the rtol applies to come from the
# QuerySpec itself (invariance_rtol_cols); every OTHER column —
# including exact sums like sum_monthly_exact — is asserted EQUAL, so
# a repartition bug in the exact path cannot hide inside the sketch
# tolerance.
SKETCH_QUERIES = [
    ("hll_partition_merge", ("year",)),
    ("approx_distinct_and_quantiles", ("l_returnflag",)),
]

# sf0.01 is where the ~1.3% drift was observed; derive the path from
# the same env-var convention as conftest's SF_DIR so a relocated
# testdata root (SPARK_GRAFT_TEST_SF_DIR=/elsewhere/sf0.001) still
# finds its sibling sf0.01.
SF01 = os.path.join(
    os.path.dirname(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")),
    "sf0.01")


@pytest.mark.parametrize("name,keys", SKETCH_QUERIES)
def test_sketch_estimates_within_rtol_across_shuffle_widths(
        spark, name, keys):
    spec = REGISTRY[name]
    assert spec.invariance_rtol > 0, (
        f"{name} must declare invariance_rtol — its estimates are "
        "merge-tree-dependent")
    assert spec.invariance_rtol_cols, (
        f"{name} must name the estimate columns the rtol applies to")

    def keyed(df):
        return {tuple(r[k] for k in keys): r for r in df.collect()}

    base = keyed(spec.fn(spark, SF01))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        narrow = keyed(spec.fn(spark, SF01))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    assert base.keys() == narrow.keys()
    est_cols = set(spec.invariance_rtol_cols)
    all_cols = set(next(iter(base.values())).asDict())
    for k in base:
        for col in est_cols:
            b, n = base[k][col], narrow[k][col]
            tol = spec.invariance_rtol * max(1.0, abs(b), abs(n))
            assert abs(b - n) <= tol, (
                f"{name}[{k}].{col}: {b} vs {n} exceeds "
                f"rtol={spec.invariance_rtol}")
        for col in all_cols - est_cols:
            assert base[k][col] == narrow[k][col], (
                f"{name}[{k}].{col} is NOT an estimate column and must "
                f"be partition-invariant exactly: "
                f"{base[k][col]} vs {narrow[k][col]}")


def test_exact_queries_do_not_carry_rtol():
    """The tolerance is ONLY for sketch estimates — every oracle-gated
    query must remain bit-exact under repartitioning (the value-hash
    gate depends on it)."""
    offenders = [n for n, s in REGISTRY.items()
                 if s.invariance_rtol and s.oracle is not None]
    assert not offenders, offenders
