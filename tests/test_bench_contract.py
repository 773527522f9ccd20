"""Bench harness contract lints (no Spark session needed).

bench.py is the driver's per-round performance probe: a typo'd query
name or a gate regression fails at driver time, after the round's work
is done — these lints move that failure to pre-commit.
"""

from __future__ import annotations

import bench
from airflow_postgres_to_s3_pipeline_spark import registry


def test_bench_queries_are_registered():
    missing = [q for q in bench.BENCH_QUERIES if q not in registry.QUERIES]
    assert not missing, f"BENCH_QUERIES not in registry: {missing}"


def test_bench_queries_unique():
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))


def test_eval_tiers_registered_and_adjudicated_twin_stays_out():
    """registry.EVAL_TIERS is the machine-readable form of the SCALE.md
    eval-vs-serving adjudication (r11 verdict task 8): every tag must
    point at a real entry, and the one tier adjudicated as
    bench-excluded — minhash_ml_pairs, the 22.7s MLlib reference twin
    whose 1.8s custom twin produces identical pairs — must stay out of
    BENCH_QUERIES.  The eval gates that ARE benched stay benched on
    purpose (their trend line is driver-visible), but bench.py now
    reports them under value_eval, not the serving total."""
    unknown = registry.EVAL_TIERS - set(registry.QUERIES)
    assert not unknown, f"EVAL_TIERS tags unknown entries: {unknown}"
    assert "minhash_ml_pairs" not in bench.BENCH_QUERIES
    benched_eval = registry.EVAL_TIERS & set(bench.BENCH_QUERIES)
    assert benched_eval == {"lsh_band_sweep", "knn_recall_eval"}, (
        "benched eval gates changed — update this lint AND the SCALE.md "
        f"adjudication: {sorted(benched_eval)}"
    )


def test_bench_and_baseline_carry_host_epoch():
    """Cross-epoch totals are non-comparable (docs/SCALE.md); bench.py
    must stamp each line with the host epoch and the idle baseline must
    record the epoch it was measured on (r11 verdict task 7)."""
    import json
    import pathlib
    import re

    epoch = bench._host_epoch()
    assert re.fullmatch(r"[^/]+/[0-9a-f]{8}", epoch), epoch
    baseline = json.loads(
        (pathlib.Path(__file__).resolve().parents[1]
         / "docs" / "BENCH_IDLE_BASELINE.json").read_text()
    )
    assert "host_epoch" in baseline["recorded_from"], (
        "idle baseline predates the host-epoch field — re-record with "
        "tools/record_idle_baseline.py on an idle host"
    )


def test_idle_gate_rejects_borderline_load5():
    """The r10 failure instance: gate-passed at load1 0.40 / load5 1.98
    against a 4.0 threshold and recorded a +30% hot total.  Under the
    r11 gate (load5 must clear LOAD5_IDLE_FRACTION x threshold) that
    host must NOT count as idle, while a genuinely idle host must."""
    threshold = bench._idle_threshold()
    frac = bench.LOAD5_IDLE_FRACTION

    def idle(load1: float, load5: float) -> bool:
        return max(load1, load5 / frac) <= threshold

    # r10's borderline-idle driver host (load1 0.40 / load5 1.98 at
    # threshold 4.0), scaled to this host's threshold
    assert not idle(0.10 * threshold, 0.495 * threshold)
    assert not idle(0.0, 0.50 * threshold)       # plain half-gate spoof
    assert idle(0.1, 0.25 * threshold)           # genuinely idle
    assert not idle(threshold + 0.1, 0.0)        # load1 still gates alone


def test_scale_smoke_labels_are_section_gated():
    """Every shape label tools/scale_smoke.py can emit must appear in
    some section gate set (*_labels), or a selective invocation like
    `scale_smoke.py 500000 <label>` silently skips the whole section and
    prints empty shapes with exit 0 (r11 review: vector_incremental_hub
    and the graph hub-order rows were emitted but never gated)."""
    import pathlib
    import re

    src = (
        pathlib.Path(__file__).resolve().parents[1]
        / "tools"
        / "scale_smoke.py"
    ).read_text()
    gate_sets = re.findall(r"\w*labels = \{([^}]*)\}", src)
    gated = set(re.findall(r'"([a-z_0-9]+)"', " ".join(gate_sets)))
    # labels at every run-helper call site (run/run_dir/run_vec/
    # run_stream/run_skew take the label as their first string arg)
    used = set(
        re.findall(r'run(?:_dir|_vec|_stream|_skew)?\(\s*\n?\s*"([a-z_0-9]+)"', src)
    )
    # labels appended as literal ("label", round(...)) result tuples
    used |= set(re.findall(r'\(\s*\n?\s*"([a-z_0-9]+)", round\(', src))
    # labels in gated row lists (e.g. hub_rows) — ("label",\n lambda ...)
    used |= set(re.findall(r'\("([a-z_0-9]+)",\s*\n\s+lambda', src))
    missing = sorted(used - gated)
    assert not missing, f"smoke labels not in any section gate: {missing}"
    assert len(used) > 30  # the extraction itself must keep matching


def test_contract_line_fits_driver_tail_capture():
    """BENCH_r12's round-over-round comparison was lost because the JSON
    contract line outgrew the driver's 2000-char stdout tail capture and
    was stored truncated (r13 verdict task 2).  The line must stay under
    the capture with headroom even at worst-case field widths; everything
    else (queries_cold, per_query_regressions, ...) belongs on the stderr
    diagnostics line."""
    import json

    payload = bench.contract_payload(
        timings={q: 999.999 for q in bench.BENCH_QUERIES},
        sf=0.1,
        n_runs=3,
        total_serving=99999.999,
        total_eval=9999.999,
        load_avg=99.99,
        load_avg_5m=99.99,
        idle_host=False,
        baseline_common_total=99999.999,
        vs_idle_baseline_pct=999.9,
        hot_run_suspected=True,
    )
    line = json.dumps(payload)
    assert len(line) < 1950, (
        f"contract line is {len(line)} chars — the driver tail capture "
        "is 2000; move fields to the stderr diagnostics line"
    )
    # the required driver-contract fields stay present
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in payload


def test_idle_baseline_carries_variance_bands():
    """r12 verdict task 6: per-query cold deltas were being adjudicated
    by hand (the five-run lsh_band_sweep study).  The idle baseline must
    carry a per-entry swing band for every baseline query, measured from
    same-epoch idle runs (record_idle_baseline.py --bands), and bench.py
    must consume them (BAND_MARGIN_PCT + per_query_regressions)."""
    import json
    import pathlib

    baseline = json.loads(
        (pathlib.Path(__file__).resolve().parents[1]
         / "docs" / "BENCH_IDLE_BASELINE.json").read_text()
    )
    bands = baseline.get("bands")
    assert bands, (
        "idle baseline has no variance bands — run bench.py on an idle "
        "host and record with tools/record_idle_baseline.py --bands"
    )
    missing = set(baseline["queries"]) - set(bands)
    assert not missing, f"baseline queries without a band: {sorted(missing)}"
    for q, b in bands.items():
        assert 0.0 <= b < 500.0, (q, b)
    assert baseline.get("bands_from", {}).get("n_samples", 0) >= 2
    # bench.py must expose the classification contract
    assert bench.BAND_MARGIN_PCT > 0
