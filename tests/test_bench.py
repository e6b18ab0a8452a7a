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


def test_bench_cache_banking_atomic_and_never_downgrades(tmp_path,
                                                         monkeypatch):
    """_record must (a) never downgrade the banked best, (b) recover from
    a corrupt (e.g. previously truncated) cache file, and (c) publish via
    atomic rename so no reader can observe a partial write (a SIGALRM
    mid-json.dump truncated the real cache once — see bench.py)."""
    import importlib
    import bench as bench_mod
    bench = importlib.reload(bench_mod)

    cache = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CACHE", str(cache))
    monkeypatch.delenv("BENCH_PLATFORM", raising=False)

    bench._record(1_000_000.0, "cfg-big")
    data = json.loads(cache.read_text())
    assert data["value"] == 1_000_000.0

    # smaller value must not clobber the banked best, only last_run
    bench._best["value"] = None          # reset supervisor best
    bench._record(5_000.0, "cfg-small")
    data = json.loads(cache.read_text())
    assert data["value"] == 1_000_000.0, data
    assert data["last_run"]["value"] == 5_000.0

    # corrupt cache (truncated write simulation): next bank must succeed
    # and produce valid JSON again
    cache.write_text('{"value": 1000000.0, "last_run": ')
    bench._best["value"] = None
    bench._record(7_000.0, "cfg-after-corruption")
    data = json.loads(cache.read_text())
    assert data["value"] == 7_000.0      # corrupt prev unreadable -> entry
    assert not (tmp_path / "cache.json.tmp").exists()

    # implausible values are discarded entirely
    bench._best["value"] = None
    bench._record(3e10, "cfg-artifact")
    data = json.loads(cache.read_text())
    assert data["value"] == 7_000.0
