"""Registry lints that keep the driver's correctness harness healthy:

1. No queries() entry may output an array/map/struct column — the driver's
   canonicalizer (pandas sort_values over the collected frame) crashes on
   unhashable ndarray cells (round-1 CORRECTNESS: `TypeError: unhashable
   type: 'numpy.ndarray'`).  Contract surfaces serialize complex values
   (concat_ws / to_json); array-returning internals stay available for
   composition.
2. Every SURVEY.md §2 family must keep at least one representative inside
   the driver's ~50-entry correctness window (insertion order), so a
   reorder can never silently drop a family out of driver evidence.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from airflow_postgres_to_s3_pipeline_spark import registry

# Streaming entries execute a real stream on call (memory sink); their
# output schemas are asserted by tests/test_streaming.py already, and all
# are scalar-only by construction.  Skip them here to keep this lint fast.
_STREAMING = tuple(n for n in registry.QUERIES if n.startswith("streaming_"))


@pytest.mark.parametrize(
    "name", [n for n in sorted(registry.QUERIES) if n not in _STREAMING]
)
def test_no_complex_typed_output_columns(spark, sf_dir, name):
    schema = registry.QUERIES[name](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} outputs complex-typed columns {bad} — the driver "
        "canonicalizer cannot hash them; serialize with concat_ws/to_json"
    )


def test_every_family_entry_is_registered():
    for family, names in registry.FAMILIES.items():
        missing = [n for n in names if n not in registry.QUERIES]
        assert not missing, f"{family}: unregistered entries {missing}"


def test_every_family_inside_driver_window():
    order = {name: i for i, name in enumerate(registry.QUERIES)}
    outside = {
        family: min(order[n] for n in names)
        for family, names in registry.FAMILIES.items()
        if min(order[n] for n in names) >= registry.DRIVER_WINDOW
    }
    assert not outside, (
        "families whose best entry sits outside the driver correctness "
        f"window (>= {registry.DRIVER_WINDOW}): {outside}"
    )


def test_window_matches_rotation_policy():
    """The driver window must be the stalest-evidence-first selection
    pinned at rotation time (r11 verdict task 1).  tools/rotate_window.py
    --snapshot records the evidence ledger and its selection in
    docs/WINDOW_LEDGER.json; this replays the selection from that pinned
    ledger (so later CORRECTNESS files don't invalidate it) and checks
    the registry's actual first-DRIVER_WINDOW entries match as a SET
    (intra-window order is presentation only).  A hand-edit of the
    window, or a rotation without --snapshot, fails here."""
    import json
    import os
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo, "docs", "WINDOW_LEDGER.json")) as fh:
        snap = json.load(fh)
    sys.path.insert(0, os.path.join(repo, "tools"))
    import rotate_window

    assert set(snap["ledger"]) == set(registry.QUERIES), (
        "registry entries changed since the last rotation snapshot — "
        "re-run tools/rotate_window.py --snapshot"
    )
    expected = rotate_window.select_window(
        snap["ledger"], snap.get("prev_window", ())
    )
    assert set(snap["window"]) == set(expected)
    if "prev_window" in snap:
        n_common = len(set(snap["window"]) & set(snap["prev_window"]))
        assert n_common >= rotate_window.OVERLAP_COHORT, (
            f"window overlap with previous round is {n_common} < "
            f"{rotate_window.OVERLAP_COHORT} — the driver's round-over-round "
            "comparison would be vacuous again (r13 PERF n_common=0)"
        )
    actual = list(registry.QUERIES)[: registry.DRIVER_WINDOW]
    assert set(actual) == set(expected), (
        "driver window diverges from the pinned stalest-first selection: "
        f"extra={sorted(set(actual) - set(expected))} "
        f"missing={sorted(set(expected) - set(actual))}"
    )
    # the policy's point: the window must be staleness-biased at
    # selection time
    assert snap["window_median_round"] <= snap["registry_median_round"]


def test_families_account_for_every_registry_entry():
    """union(FAMILIES) == QUERIES.keys(), both directions (r8 verdict
    task 3): an unmapped entry is invisible to the window-coverage lint
    above, so a rotation could silently drop its family's last in-window
    representative; a mapped-but-unregistered name is a stale pointer."""
    family_members = {n for names in registry.FAMILIES.values() for n in names}
    registered = set(registry.QUERIES)
    unmapped = sorted(registered - family_members)
    stale = sorted(family_members - registered)
    assert not unmapped, f"registry entries mapped to no family: {unmapped}"
    assert not stale, f"family entries not in the registry: {stale}"
