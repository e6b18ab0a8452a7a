"""Focused on-chip sweep: best config for the chain-merged decoder.

Run: timeout 1800 python work/sweep_merged2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import run_bench  # noqa: E402

CONFIGS = [
    ("mergedf32", 2048, 512, 256),
    ("mergedf32", 3072, 512, 256),
    ("mergedf32", 3072, 384, 512),
    ("mergedf32", 4096, 512, 256),
    ("mergedf32", 1024, 512, 256),
    ("mergedf32", 2048, 256, 256),
    ("int8m",     2048, 512, 256),
    ("mergedf32", 3072, 384, 256),   # repeat of yesterday's best
    ("mergedf32", 2048, 512, 256),   # repeat
]

for fused, batch, tile, scan in CONFIGS:
    t0 = time.time()
    try:
        v = run_bench(batch, fused=fused, tile=tile, scan=scan)
        print(f"{fused:10s} B={batch} tile={tile} scan={scan}: "
              f"{v:12,.0f} audio-s/s (wall {time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{fused:10s} B={batch} tile={tile} scan={scan}: "
              f"FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
