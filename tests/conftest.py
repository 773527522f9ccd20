from __future__ import annotations

import pytest

from airflow_postgres_to_s3_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def _testdata_drift_tripwire():
    """Fail the whole run with ONE actionable message if the driver
    regenerated testdata with different parquet schemas (r3 lost three
    CORRECTNESS rows to silent timestamp-unit drift that surfaced only as
    red oracle value mismatches).  Footer-only reads — costs ~50ms."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from schema_snapshot import SNAPSHOT_PATH, diff_snapshot

    try:
        drift = diff_snapshot()
    except FileNotFoundError:
        pytest.fail(
            f"testdata schema snapshot missing ({SNAPSHOT_PATH}); re-pin "
            "with: python tools/schema_snapshot.py --write"
        )
    if drift:
        pytest.fail(
            "DRIVER TESTDATA CHANGED since the committed schema snapshot "
            "— fix readers/oracles for the drift below, then re-pin with "
            "`python tools/schema_snapshot.py --write`:\n  "
            + "\n  ".join(drift)
        )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def stamp_file_order(dir_path):
    """Force FileStreamSource to pick up files in filename order.

    Tests that split events into per-batch files rely on batch N arriving
    before batch N+1, but the file source orders by MODIFICATION TIME at
    millisecond granularity — files written back-to-back can tie (or, on
    a loaded host, land out of order), letting a high-watermark batch run
    first and silently drop the earlier files' events as late.  Stamp
    strictly increasing mtimes, 2s apart in filename order, so the intended
    order is explicit rather than an artifact of write latency.
    """
    import os
    import time

    files = sorted(
        f for f in os.listdir(str(dir_path)) if f.endswith(".parquet")
    )
    base = time.time() - 2.0 * len(files) - 10.0
    for i, name in enumerate(files):
        p = os.path.join(str(dir_path), name)
        t = base + 2.0 * i
        os.utime(p, (t, t))
