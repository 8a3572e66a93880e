"""Probe-fleet freshness gate (VERDICT r11 #7): every certification
probe script runs end to end at smoke scale, in its own subprocess/JVM,
so refactors cannot silently rot them between full re-certifications.

Deselected by default (pytest.ini: -m "not probes"); run the set with
`python -m pytest -m probes tests/test_probe_smoke.py` — budget < 10
minutes total on local[8]-class hardware.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.probes


def _run(args, timeout=480, env_extra=None):
    env = os.environ.copy()
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, *args], cwd=_REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{args} rc={proc.returncode}\n--- stdout:\n{proc.stdout[-3000:]}"
        f"\n--- stderr:\n{proc.stderr[-2000:]}"
    )
    return proc.stdout


def test_stream_state_probe_smoke():
    # 12 small batches, not 3: the plateau check is a watermark-horizon
    # property — dedup's state legitimately grows until the horizon
    # fills (~5 batches) and the "far below cumulative input" bound
    # needs the post-plateau tail.
    out = _run(["scripts/stream_state_probe.py", "2000", "12"])
    assert "GROWING" not in out and "PLATEAU" in out


def test_scc_scale_probe_smoke():
    out = _run(["scripts/scc_scale_probe.py", "--smoke"])
    assert "equal=True" in out


def test_avro_monolith_probe_smoke():
    out = _run(["scripts/avro_monolith_probe.py", "1"], timeout=600)
    assert "exact" in out.lower() or "ok" in out.lower()


def test_cluster_probe_smoke():
    out = _run(
        ["scripts/cluster_probe.py", "/root/testdata/sf0.01", "tpch_q6",
         "limit_only"],
        timeout=600,
    )
    assert "FAIL" not in out


def test_zipf_probe_smoke(tmp_path):
    out = _run(
        ["scripts/zipf_probe.py", "--smoke", "2",
         str(tmp_path / "zipf"), str(tmp_path / "uni")],
        timeout=600,
        env_extra={
            "PYSPARK_SUBMIT_ARGS": "--driver-memory 8g pyspark-shell",
            "SPARK_GRAFT_CPUS": "8",
        },
    )
    assert "FAIL" not in out


def test_unigram_vocab_probe_smoke():
    out = _run(["scripts/unigram_vocab_probe.py", "--smoke"])
    assert "cost tracks TOTAL VOCAB CHARACTERS" in out


def test_concurrent_probe_smoke():
    out = _run(["scripts/concurrent_probe.py", "--smoke"])
    assert "PROBE OK 8/8" in out and "refcount clean" in out


def test_bpe_byte_vocab_probe_smoke():
    out = _run(["scripts/bpe_byte_vocab_probe.py", "--smoke"])
    assert "PROBE OK" in out


def test_txn_ckpt_probe_smoke():
    out = _run(["scripts/txn_ckpt_probe.py", "--smoke"])
    assert "FLAT" in out and "GROWING" not in out


def test_txn_race_probe_smoke():
    out = _run(["scripts/txn_race_probe.py", "--smoke"], timeout=600)
    assert "RACE OK" in out
