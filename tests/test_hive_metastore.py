"""Real-metastore MSCK path for register_partitions (the pytest
session uses the in-memory catalog, which can only exercise the
fallback — this drives the derby-backed Hive path in a subprocess,
one SparkContext per JVM)."""

from __future__ import annotations

import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "hive_msck_smoke.py")


def test_msck_registers_reference_style_partition_dirs(tmp_path):
    out = subprocess.run(
        [sys.executable, TOOL],
        cwd=str(tmp_path),  # derby writes metastore_db/ and derby.log into cwd
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "HIVE_MSCK_OK" in out.stdout
