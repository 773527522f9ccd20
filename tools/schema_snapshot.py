"""Testdata schema snapshot — the drift tripwire.

Round 3 lost three CORRECTNESS rows to a silent driver-side testdata
regeneration (events.ts moved from int64 nanos to timestamp[us]); the
failures surfaced as N red oracle rows with no hint of the root cause.
This tool pins the parquet schemas the repo was verified against:

    python tools/schema_snapshot.py            # check live vs committed
    python tools/schema_snapshot.py --write    # re-pin after deliberate review

``tests/testdata_schemas.json`` is the committed snapshot; an autouse
session fixture in tests/conftest.py runs :func:`diff_snapshot` so ANY
pytest run fails fast with one actionable message ("driver testdata
changed: ...") instead of a wall of red oracle mismatches.

Only schemas are pinned, not contents — the driver regenerates rows each
round; it is TYPE drift that breaks oracles (timestamp unit, int width).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT_PATH = os.path.join(REPO, "tests", "testdata_schemas.json")
TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIRS = ("sf0.001", "sf0.01", "sf0.1")


def live_schemas(root: str = TESTDATA_ROOT) -> dict[str, dict[str, str]]:
    """{sf_dir/table: {column: arrow_type}} for every parquet present."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, str]] = {}
    for sf in SF_DIRS:
        d = os.path.join(root, sf)
        if not os.path.isdir(d):
            continue
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            schema = pq.read_schema(f)
            table = os.path.splitext(os.path.basename(f))[0]
            out[f"{sf}/{table}"] = {
                name: str(schema.field(name).type) for name in schema.names
            }
    return out


def load_snapshot(path: str = SNAPSHOT_PATH) -> dict[str, dict[str, str]]:
    with open(path) as fh:
        return json.load(fh)


def diff_snapshot(root: str = TESTDATA_ROOT,
                  path: str = SNAPSHOT_PATH) -> list[str]:
    """Human-readable drift lines; empty list = no drift.

    Tables missing on disk are NOT drift (a round may ship fewer sf dirs);
    new tables, dropped columns, and changed types are.
    """
    pinned = load_snapshot(path)
    live = live_schemas(root)
    lines: list[str] = []
    for key, cols in live.items():
        if key not in pinned:
            lines.append(f"NEW table {key}: {cols}")
            continue
        pcols = pinned[key]
        for c in pcols.keys() | cols.keys():
            a, b = pcols.get(c), cols.get(c)
            if a != b:
                lines.append(
                    f"{key}.{c}: pinned {a or 'ABSENT'} -> live {b or 'ABSENT'}"
                )
    return lines


def main() -> int:
    if "--write" in sys.argv:
        schemas = live_schemas()
        with open(SNAPSHOT_PATH, "w") as fh:
            json.dump(schemas, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"pinned {len(schemas)} table schemas -> {SNAPSHOT_PATH}")
        return 0
    drift = diff_snapshot()
    if drift:
        print("DRIVER TESTDATA CHANGED since the committed snapshot:")
        for line in drift:
            print(" ", line)
        print("Review the diff, fix affected readers/oracles, then re-pin "
              "with: python tools/schema_snapshot.py --write")
        return 1
    print("testdata schemas match the committed snapshot")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
