"""On-chip sweep: chain-merged fused decoder vs round-4 headline, plus
the redesigned (barrel-shift + phasor-table) whole-over batched receiver.

Interleaves int8 (current headline config) with int8m (merged) runs so
both see the same thermal/relay conditions.

Run: timeout 1800 python work/sweep_merged.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import run_bench, REF_AUDIO_SEC_PER_S  # noqa: E402

FRAME_S = 0.12

CONFIGS = [
    ("int8",      3072, 384, 256),   # round-4 headline
    ("int8m",     3072, 384, 256),   # merged, same config
    ("int8",      3072, 384, 256),   # repeat for band
    ("int8m",     3072, 384, 256),
    ("int8m",     2048, 512, 128),
    ("mergedf32", 3072, 384, 256),
    ("int8m",     4096, 512, 256),
    ("int8m",     3072, 768, 256),
]

for fused, batch, tile, scan in CONFIGS:
    t0 = time.time()
    try:
        tpf = run_bench(batch, fused=fused, tile=tile, scan=scan)
        v = batch * FRAME_S / tpf
        print(f"{fused:10s} B={batch} tile={tile} scan={scan}: "
              f"{tpf*1e3:7.3f} ms/frame  {v:12,.0f} audio-s/s "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{fused:10s} B={batch} tile={tile} scan={scan}: "
              f"FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

# ---- whole-over batched receiver (new derotate/align design) ----
from radae_tpu.config import flagship_config          # noqa: E402
from radae_tpu.models.core import CoreDecoder          # noqa: E402
from radae_tpu.runtime import make_batched_receiver    # noqa: E402
from radae_tpu.utils.hostio import device_put_tree     # noqa: E402

cfg = flagship_config()
decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
params = device_put_tree(decoder.init(1))

for B, NF in [(256, 25), (1024, 25)]:
    T = cfg.Nmf + (NF + 1) * cfg.Nmf + cfg.Ncp + 2 * cfg.Nmf + cfg.M
    rng = np.random.default_rng(0)
    rx_dev = jax.device_put(
        (rng.standard_normal((B, T, 2)) * 0.1).astype(np.float32))
    rxf = make_batched_receiver(cfg, decoder, B, n_frames=NF)

    # block_until_ready does NOT wait on this backend — only an
    # np.asarray readback does (see .claude/skills/verify).  Chain each
    # call on the previous call's candidate output to force sequential
    # device execution, enqueue n calls, then read back ONE small array;
    # the two-point slope removes the fixed RTT.
    def run_n(n):
        t0 = time.time()
        c = None
        for _ in range(n):
            rx_in = rx_dev if c is None else (
                rx_dev + 0.0 * c.astype(np.float32)[:, None, None])
            _, c, _, _ = rxf(params, rx_in)
        np.asarray(c)
        return time.time() - t0

    run_n(1)                       # compile + warm
    slopes = []
    for _ in range(5):
        n1, n2 = 2, 10
        ta, tb = run_n(n1), run_n(n2)
        slopes.append((tb - ta) / (n2 - n1))
    per_over = float(np.median(slopes))
    thr = B * NF * FRAME_S / per_over
    print(f"batched rx B={B} nf={NF}: {per_over*1e3:8.2f} ms/over  "
          f"{thr:12,.0f} audio-s/s incl. acquisition", flush=True)
