"""Decoder-only: does batching multiple frames per kernel call help?

The merged kernel's per-STAGE cost (~3.5 us) did not drop when the dot
count dropped, suggesting per-call / per-stage fixed overheads.  nz=6
(two frames per call) halves the per-call share at identical math (state
chains through z-steps regardless of call boundaries).

Run: timeout 1800 python work/sweep_nz.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from radae_tpu.models.core import CoreDecoder  # noqa: E402
from radae_tpu.ops.fused_core import (  # noqa: E402
    make_fused_decoder_step, decoder_weights, decoder_state_zero)

B, TILE = 2048, 512
FRAME_S = 0.12
dec = CoreDecoder(80, 21)
params = dec.init(1)
w = tuple(jax.device_put(a) for a in decoder_weights(params, merged=True))

rng = np.random.default_rng(0)

for nz, scan in [(3, 256), (6, 128), (12, 64), (24, 32)]:
    step = make_fused_decoder_step(80, 21, B, tile=TILE, nz=nz, merged=True)
    z = jax.device_put(np.tanh(
        rng.standard_normal((B, nz, 80))).astype(np.float32))
    state0 = decoder_state_zero(B, merged=True)

    @jax.jit
    def call(w_, z_, st):
        def body(st_, _):
            f, st2 = step(w_, z_, *st_)
            return st2, f[:, 0, 0]
        final, outs = jax.lax.scan(body, st, None, length=scan)
        return outs, final

    t0 = time.time()
    outs, final = call(w, z, state0)
    np.asarray(outs)
    compile_s = time.time() - t0

    def run_n(n, st):
        t0 = time.time()
        for _ in range(n):
            outs, st = call(w, z, st)
        np.asarray(outs)
        return time.time() - t0, st

    st = final
    slopes = []
    for _ in range(5):
        ta, st = run_n(1, st)
        tb, st = run_n(4, st)
        slopes.append((tb - ta) / 3)
    per_call = float(np.median(slopes))
    frames = scan * nz / 3                    # 3 z-steps per 120 ms frame
    per_frame = per_call / frames
    thr = B * FRAME_S / per_frame
    print(f"nz={nz:2d} scan={scan:3d}: {per_frame*1e3:7.4f} ms/frame  "
          f"{thr:12,.0f} audio-s/s  (compile {compile_s:.0f}s)", flush=True)
