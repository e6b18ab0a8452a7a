"""Keep-or-retire measurement for the FIXED fused encoder kernel (round 5:
flat 2-D conv-history rings replace the 3-D blocks that didn't lower
through Mosaic).  Times the streaming tx step (stateful encoder + OFDM
mod + PA model) with the Pallas kernel vs plain XLA, state-chained scan,
two-point slope — same methodology as bench.run_bench.

Run: timeout 2400 python work/sweep_enc.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                                    # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp                                       # noqa: E402

from radae_tpu.config import flagship_config                  # noqa: E402
from radae_tpu.models.core import CoreEncoder                 # noqa: E402
from radae_tpu.runtime import make_streaming_tx_step          # noqa: E402
from radae_tpu.utils.hostio import device_put_tree            # noqa: E402

cfg = flagship_config()
SCAN = 256

def measure(batch, fused, tile, quant=None):
    encoder = CoreEncoder(cfg.feature_dim, cfg.latent_dim,
                          bottleneck=cfg.bottleneck)
    enc_params_tree = encoder.init(1)
    step = make_streaming_tx_step(cfg, encoder, batch, fused=fused,
                                  fused_tile=tile, fused_quant=quant)
    if fused:
        from radae_tpu.ops.fused_core import (encoder_weights,
                                              encoder_state_zero)
        params = tuple(jax.device_put(w)
                       for w in encoder_weights(enc_params_tree,
                                                quant=quant))
        mkstate = lambda: encoder_state_zero(batch)
    else:
        params = device_put_tree(enc_params_tree)
        mkstate = lambda: encoder.zero_state(batch)
    rng = np.random.default_rng(0)
    feats = jax.device_put((rng.standard_normal(
        (batch, 12, cfg.feature_dim)) * 0.3).astype(np.float32))

    @jax.jit
    def call(p, f, state):
        def body(st, _):
            tx, st2 = step(p, f, st)
            return st2, tx[:, 0, 0]
        final, outs = jax.lax.scan(body, state, None, length=SCAN)
        return outs, final

    out = call(params, feats, mkstate())
    np.asarray(out[0])

    def run_n(n):
        state = mkstate()
        t0 = time.time()
        out = None
        for _ in range(n):
            out, state = call(params, feats, state)
        np.asarray(out)
        return time.time() - t0

    slopes = []
    for _ in range(3):
        t1, t2 = run_n(2), run_n(10)
        slopes.append((t2 - t1) / 8)
    dt = float(np.median(slopes)) / SCAN
    return batch * cfg.Tmf / dt, dt


if __name__ == "__main__":
    import json
    cfgs = [(2048, False, 0, None), (2048, True, 256, None),
            (2048, True, 256, "int8"), (2048, True, 512, "int8"),
            (2048, True, 256, None)]           # control repeat
    if len(sys.argv) > 1:                      # custom rung list as JSON
        cfgs = [tuple(c) for c in json.loads(sys.argv[1])]
    for batch, fused, tile, quant in cfgs:
        t0 = time.time()
        try:
            v, dt = measure(batch, fused, tile, quant)
            print(f"tx B={batch} fused={fused} tile={tile} quant={quant}: "
                  f"{v:12,.0f} audio-s/s ({dt*1e3:.3f} ms/frame, "
                  f"wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"tx B={batch} fused={fused} tile={tile} quant={quant}: "
                  f"FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
