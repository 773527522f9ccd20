#!/usr/bin/env python
"""Per-query sf0.1 -> sf1 scaling-ratio table (r11 verdict task 2).

Reads two bench JSON lines (the sf0.1 idle baseline run and the sf1 run
on tools/make_scaled_testdata.py data) and prints the markdown trend
table for docs/SCALE.md, flagging ratios beyond the data-size-effect
band.  A 10x data bump on a linear operator lands well under 10x wall
time on a fixed 32-thread host (fixed per-query overheads amortize); a
ratio >12x means super-linear work (pair blowup, an unexpected extra
shuffle round, a cap no longer binding) and must be plan-audited.

Usage: python tools/sf1_ratio_report.py sf01.json sf1.json [flag_ratio]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either a one-line bench output or the (pretty-printed)
    idle-baseline file."""
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        lines = [ln for ln in text.splitlines() if ln.strip()]
        return json.loads(lines[-1])


def main() -> None:
    a = load(sys.argv[1])  # sf0.1
    b = load(sys.argv[2])  # sf1
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    print(f"| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for q in sorted(common, key=lambda q: -(qb[q] / max(qa[q], 1e-9))):
        r = qb[q] / max(qa[q], 1e-9)
        mark = " **AUDIT**" if r > flag else ""
        if r > flag:
            flagged.append((q, r))
        print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {r:.1f}x{mark} |")
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"| **total ({len(common)})** | {ta:.1f} | {tb:.1f} | "
          f"{tb / ta:.1f}x |")
    print(f"\nflagged (> {flag}x): {flagged or 'none'}")


if __name__ == "__main__":
    main()
