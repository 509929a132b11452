"""Opt-in Iceberg integration test (VERDICT r3 item 5): runs
scripts/iceberg_smoke.py — writeTo(...) with days(warc_ts) hidden
partitioning, format-gated read/sink round-trip, snapshot-based
incremental resume — where the Iceberg Spark runtime jar exists, and
SKIPS (not fakes) where it doesn't.

The smoke runs in a subprocess because an Iceberg session needs
catalog confs that cannot be added to the already-running shared
session fixture (getOrCreate ignores new confs), and two concurrent
Spark sessions deadlock on the Derby metastore lock.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _find_iceberg_jar():
    """The runtime jar, from $SPARK_GRAFT_ICEBERG_JAR or the usual
    spots (pyspark's own jars dir, /opt/spark/jars, /opt/jars)."""
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    candidates = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        "/opt/spark/jars",
        "/opt/jars",
    ]
    for d in candidates:
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


_JAR = _find_iceberg_jar()


@pytest.mark.skipif(
    _JAR is None,
    reason="Iceberg Spark runtime jar not available in this environment "
    "(set SPARK_GRAFT_ICEBERG_JAR to opt in)",
)
def test_iceberg_roundtrip_and_snapshot_resume():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_ICEBERG_JAR=_JAR)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "iceberg_smoke.py")],
        capture_output=True,
        text=True,
        cwd=repo,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ICEBERG SMOKE PASSED" in proc.stdout, proc.stdout[-2000:]
