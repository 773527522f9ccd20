"""Record docs/BENCH_IDLE_BASELINE.json from a bench run's JSON line.

The baseline is the per-query warm-min table bench.py compares every
subsequent run against (the ``hot_run_suspected`` /
``vs_idle_baseline_pct`` fields) — so it must itself come from a
truly-idle run: this script refuses a line whose ``idle_host`` is false
or whose gate margin is thin.

Usage:
    python bench.py | tail -1 | python tools/record_idle_baseline.py
    python tools/record_idle_baseline.py BENCH_rN.json
    python tools/record_idle_baseline.py --force run.json   # see below
    python tools/record_idle_baseline.py --bands run1.json run2.json ...

``--force`` overrides ONLY the hot_run_suspected refusal — needed when
a host-epoch change makes every genuinely idle run read >10% over the
stale baseline (docs/SCALE.md records exactly this cross-epoch drift),
which would otherwise ratchet the baseline shut forever.  idle_host
and the gate margin are never overridable.

``--bands`` (r12 verdict task 6) augments the EXISTING baseline with
per-entry variance bands computed from additional idle runs: for each
baseline query, band_pct = 100 * (max - min) / min over {baseline value,
each run's value}.  The r12 five-run study showed per-entry warm mins
swing up to +-39.5% (lsh_band_sweep) between idle runs whose TOTALS
agree within 4.2% — so per-query deltas can only be adjudicated against
each entry's own observed swing, which these bands record.  bench.py
flags a per-query regression as real only when its deviation exceeds
the entry's band plus a fixed margin; entries without a band fall back
to the widest observed band.  Band runs must pass the same idle checks
as the baseline itself.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "BENCH_IDLE_BASELINE.json")


def _parse(raw: str) -> dict:
    """Accept either bench.py's raw one-line JSON (possibly preceded by
    log noise) or the driver's BENCH_rN.json wrapper ({n, rc, ..., tail,
    parsed}) — whole-document parse first, last-line fallback for piped
    bench output."""
    lines = raw.strip().splitlines()
    if not lines:
        raise SystemExit(
            "refusing: empty input — bench.py printed no JSON line"
        )
    try:
        data = json.loads(raw)
    except json.JSONDecodeError:
        try:
            data = json.loads(lines[-1])
        except json.JSONDecodeError:
            raise SystemExit(
                "refusing: input is not JSON (neither the whole document "
                "nor its last line parses)"
            )
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]  # driver BENCH_rN.json wrapper
    if "queries" not in data:
        raise SystemExit(
            "refusing: no 'queries' field — not a bench JSON line (the "
            "driver wrapper's 'parsed' was empty; its 'tail' is "
            "truncated and unusable)"
        )
    return data


def _check_idle(data: dict, label: str, force: bool) -> str | None:
    """Shared idle-run admission checks; returns a refusal reason or None."""
    if not data.get("idle_host"):
        return f"{label}: idle_host is false"
    if data.get("hot_run_suspected") and not force:
        return f"{label}: hot_run_suspected is true (--force to override)"
    margin = data.get("idle_margin")
    if margin is not None and margin < 1.0:
        return f"{label}: gate margin {margin} < 1.0"
    return None


def record_bands(run_files: list[str], force: bool) -> int:
    """Augment the existing baseline with per-entry variance bands."""
    with open(OUT) as f:
        baseline = json.load(f)
    base_q: dict[str, float] = baseline["queries"]
    samples: dict[str, list[float]] = {q: [v] for q, v in base_q.items()}
    used = []
    for path in run_files:
        data = _parse(open(path).read())
        reason = _check_idle(data, path, force)
        if reason:
            print(f"refusing band run — {reason}", file=sys.stderr)
            return 1
        epoch = data.get("host_epoch")
        base_epoch = baseline.get("recorded_from", {}).get("host_epoch")
        if base_epoch and epoch and epoch != base_epoch:
            print(
                f"refusing band run {path}: host_epoch {epoch} != baseline "
                f"{base_epoch} — cross-epoch swings are drift, not variance",
                file=sys.stderr,
            )
            return 1
        for q, v in data["queries"].items():
            if q in samples:
                samples[q].append(v)
        used.append({
            "file": os.path.basename(path),
            "value": data.get("value"),
            "idle_margin": data.get("idle_margin"),
        })
    short = [q for q, vs in samples.items() if len(vs) < 2]
    if short:
        print(f"refusing: no band sample for {sorted(short)}", file=sys.stderr)
        return 1
    bands = {
        q: round(100.0 * (max(vs) - min(vs)) / min(vs), 1)
        for q, vs in samples.items()
    }
    baseline["bands"] = bands
    baseline["bands_from"] = {
        "n_samples": 1 + len(run_files),
        "runs": used,
    }
    with open(OUT, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
        f.write("\n")
    widest = sorted(bands.items(), key=lambda kv: -kv[1])[:5]
    print(f"wrote bands for {len(bands)} queries from "
          f"{1 + len(run_files)} idle samples; widest: {widest}")
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--force", "--bands")]
    force = "--force" in sys.argv[1:]
    if "--bands" in sys.argv[1:]:
        if not args:
            print("--bands needs at least one idle run JSON", file=sys.stderr)
            return 1
        return record_bands(args, force)
    if args:
        raw = open(args[0]).read()
    else:
        raw = sys.stdin.read()
    data = _parse(raw)
    if not data.get("idle_host"):
        print(
            "refusing: idle_host is false — a hot baseline would mask "
            "every future hot run",
            file=sys.stderr,
        )
        return 1
    if data.get("hot_run_suspected") and not force:
        # loads are sampled at gate-pass time, BEFORE Spark starts; a
        # host that goes busy mid-bench still reports idle_host=true,
        # and hot_run_suspected (warm total >10% over the previous
        # baseline) is the only field that sees it — exactly the run
        # class that must never become the new baseline
        print(
            "refusing: hot_run_suspected is true — the run's warm total "
            "deviates >10% from the current idle baseline.  If this is a "
            "host-epoch change (every idle run now reads slow), re-run "
            "with --force after confirming idle_host and the margin",
            file=sys.stderr,
        )
        return 1
    margin = data.get("idle_margin")
    if margin is not None and margin < 1.0:
        print(
            f"refusing: gate margin {margin} < 1.0 — borderline-idle runs "
            "measure 5-10%+ hot (docs/SCALE.md)",
            file=sys.stderr,
        )
        return 1
    out = {
        "recorded_from": {
            k: data[k]
            for k in (
                "value",
                "sf",
                "runs_per_query",
                "load_avg_at_start",
                "load_avg_5m_at_start",
                "idle_margin",
                "host_epoch",
            )
            if k in data
        },
        "queries": data["queries"],
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(data['queries'])} queries, "
          f"total {data.get('value', '?')}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
