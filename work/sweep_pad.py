"""On-chip sweep: padded scratch-x merged kernel vs the current headline,
plus the frames-per-step (fps) ladder that round 4's relay outage left
unmeasured.

The merged kernel's per-stage floor (~3.5 us over 51 serial dot-stages
per frame) was attributed to issue/VPU overhead, with the growing-concat
copies the prime suspect (RESULTS.md round-4 chain-merge note).
merged="pad" eliminates them (ops/fused_core.py); fps=N decodes N modem
frames per rx-step call to amortise per-call overhead at identical math.

Run: timeout 2400 python work/sweep_pad.py   (relay + compile helper up;
chip otherwise idle; NO concurrent CPU-heavy work)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import run_bench  # noqa: E402

CONFIGS = [
    # (fused, batch, tile, scan, fps)
    ("mergedf32", 2048, 512, 256, 1),   # current headline (baseline ref)
    ("padf32",    2048, 256, 256, 1),   # concat-free scratch-x, small tile
    #   first: pad adds ~2.2MB zero-padded weights + a (tile,1408) f32
    #   scratch on top of a config already near the ~16MB VMEM budget, so
    #   bank a small-tile pad number before risking tile=512
    ("padf32",    2048, 512, 256, 1),
    ("padi8",     2048, 512, 256, 1),   # int8 weights shrink the pad cost
    ("mergedf32", 2048, 512, 128, 2),   # fps ladder: 2 frames per call
    ("mergedf32", 2048, 512, 64,  4),
    ("padf32",    2048, 512, 128, 2),   # best-of-both candidate
    ("mergedf32", 3072, 384, 256, 1),   # batch control at merged tile=384
    ("padf32",    3072, 384, 256, 1),
]

results = []
for fused, batch, tile, scan, fps in CONFIGS:
    t0 = time.time()
    try:
        v = run_bench(batch, fused=fused, tile=tile, scan=scan, fps=fps)
        row = {"fused": fused, "B": batch, "tile": tile, "scan": scan,
               "fps": fps, "value": round(v, 1),
               "wall_s": round(time.time() - t0, 1)}
    except Exception as e:
        row = {"fused": fused, "B": batch, "tile": tile, "scan": scan,
               "fps": fps, "error": f"{type(e).__name__}: {e}"[:200],
               "wall_s": round(time.time() - t0, 1)}
    results.append(row)
    print(json.dumps(row), flush=True)
    with open("/root/repo/work/sweep_pad.json", "w") as f:
        json.dump(results, f, indent=1)
