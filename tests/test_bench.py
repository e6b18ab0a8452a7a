"""Supervisor-level gates for the driver-facing bench harness (bench.py).

The driver runs `python bench.py` at the end of each round and must ALWAYS
get exactly one JSON line, whatever the TPU relay does (reference role:
the performance-characterisation ctests, /root/reference/CMakeLists.txt:429-458).
These tests exercise the jax-free parent on the CPU backend via the
BENCH_PLATFORM test hook.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    out = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, timeout=timeout, env=env, cwd=REPO)
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly ONE json line, got: {out.stdout!r}"
    return json.loads(lines[0])


def test_bench_banks_cheap_rung_on_cpu():
    # Generous budget so the B=8 rung (compiles in seconds) completes even
    # on a loaded CI host; the parent exits as soon as the ladder is done.
    res = _run({"BENCH_PLATFORM": "cpu", "BENCH_BUDGET_S": "240"}, timeout=300)
    assert res["metric"] == "streaming_rx_decode"
    assert res["unit"] == "audio-seconds/s/chip"
    assert res["value"] > 0, res
    assert res["vs_baseline"] > 0
    assert "config" in res


def test_bench_emits_error_json_when_budget_expires_resultless():
    # A sub-second budget means no rung can complete: the parent must still
    # print one well-formed JSON line with value 0.0 and an error field.
    res = _run({"BENCH_PLATFORM": "cpu", "BENCH_BUDGET_S": "0.2"}, timeout=90)
    assert res["metric"] == "streaming_rx_decode"
    assert res["value"] == 0.0
    assert "error" in res
