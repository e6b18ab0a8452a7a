"""Frames-per-kernel-call experiment on the real serving composite.

The merged kernel's per-STAGE cost (~3.5 us) did not drop when the dot
count dropped, suggesting fixed per-call / per-scan-step overheads.
frames_per_step=N demodulates + decodes N frames per call at identical
math (state chains through z-steps regardless of call boundaries; gated
by test_streaming_rx_step_frames_per_step_matches_chained), so scan*fps
frames land per dispatch with 1/N the per-call overhead.

Run: timeout 1800 python work/sweep_nz.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import run_bench  # noqa: E402

CONFIGS = [
    # (fused, batch, tile, scan, fps)
    ("mergedf32", 2048, 512, 256, 1),   # current headline (baseline)
    ("mergedf32", 2048, 512, 128, 2),
    ("mergedf32", 2048, 512, 64,  4),
    ("mergedf32", 2048, 512, 32,  8),
    ("mergedf32", 2048, 512, 128, 1),   # scan control for the fps=2 row
    ("mergedf32", 2048, 512, 64,  2),   # same frames/dispatch as scan=128
    ("mergedf32", 2048, 512, 256, 2),   # more frames/dispatch
    ("mergedf32", 2048, 1024, 256, 1),  # bigger tile (fewer grid programs)
    ("mergedf32", 2048, 512, 512, 1),   # bigger scan (less dispatch)
]

for fused, batch, tile, scan, fps in CONFIGS:
    t0 = time.time()
    try:
        v = run_bench(batch, fused=fused, tile=tile, scan=scan, fps=fps)
        print(f"{fused} B={batch} tile={tile} scan={scan} fps={fps}: "
              f"{v:12,.0f} audio-s/s (wall {time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{fused} B={batch} tile={tile} scan={scan} fps={fps}: "
              f"FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
