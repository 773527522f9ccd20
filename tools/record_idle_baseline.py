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

``--force`` overrides ONLY the hot_run_suspected refusal — needed when
a host-epoch change makes every genuinely idle run read >10% over the
stale baseline (docs/SCALE.md records exactly this cross-epoch drift),
which would otherwise ratchet the baseline shut forever.  idle_host
and the gate margin are never overridable.
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


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
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
