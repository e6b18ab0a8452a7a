"""Headline benchmark: streaming rx decode throughput, audio-seconds/s/chip.

Batches the 120 ms streaming receiver step (OFDM demod + LS pilot EQ +
stateful core decoder — the radae_rxe hot path) across independent streams
(channel realisations), the serving configuration for TPU.  The decoder
runs as the Pallas VMEM-resident fused kernel (radae_tpu/ops/fused_core.py).

Baseline: the reference streaming receiver decodes 9.82 s of audio in
6.41 s of CPU time (65.26% of real time on a laptop core; reference
README.md:312-318) = 1.532 audio-seconds/s.

Robustness contract (the driver runs this under `timeout` on a relay-
tunnelled TPU where session setup alone can take 30 s - 5 min):
  * the KNOWN-GOOD FASTEST config runs first and its result is recorded
    immediately;
  * SIGTERM/SIGALRM handlers flush the best result obtained so far, so
    even a driver timeout yields a parsed JSON line;
  * larger configs are attempted only while inside the internal budget.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s/chip", "vs_baseline": N}
"""

import json
import os
import signal
import sys
import time

import numpy as np

REF_AUDIO_SEC_PER_S = 9.82 / 6.41     # reference CPU realtime throughput
T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "360"))

_best = {"value": None, "config": None, "printed": False}


CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache.json")


def _emit(error=None):
    """Print the single JSON result line (idempotent)."""
    if _best["printed"]:
        return
    _best["printed"] = True
    if _best["value"] is None:
        out = {"metric": "streaming_rx_decode", "value": 0.0,
               "unit": "audio-seconds/s/chip", "vs_baseline": 0.0,
               "error": (error or "no config completed")[:200]}
        try:
            with open(CACHE) as f:
                # informational only: the most recent SUCCESSFUL on-chip
                # measurement from a previous run (value stays 0.0)
                out["last_measured"] = json.load(f)
        except Exception:
            pass
    else:
        out = {"metric": "streaming_rx_decode",
               "value": round(_best["value"], 1),
               "unit": "audio-seconds/s/chip",
               "vs_baseline": round(_best["value"] / REF_AUDIO_SEC_PER_S, 1),
               "config": _best["config"]}
    sys.stdout.write(json.dumps(out) + "\n")
    sys.stdout.flush()


def _on_signal(signum, frame):
    _emit(error=f"interrupted by signal {signum}")
    os._exit(0)


def run_bench(batch: int, n_frames: int = 5, fused: bool = True,
              tile: int = 512, scan: int = 32):
    """Steady-state decode throughput via the two-point slope method.

    The streaming receiver decodes modem frames back-to-back, so the
    serving unit of work is `scan` state-chained frames inside ONE jitted
    program (lax.scan): per-frame time is then pure device time.  On
    tunnelled TPU runtimes a single device->host readback also carries a
    large fixed latency that has nothing to do with chip throughput, so we
    additionally time n1 and n2 chained calls and take (t2-t1)/(n2-n1)
    as the per-call time."""
    import jax
    from radae_tpu.config import flagship_config
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_streaming_rx_step
    from radae_tpu.utils.hostio import device_put_tree

    cfg = flagship_config()
    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params_tree = decoder.init(1)

    # The step is throughput-timed, so any well-scaled signal works: feed
    # unit-power noise shaped like one modem frame + look-ahead symbol.
    # (Avoids compiling the tx path just to manufacture input.)
    rng = np.random.default_rng(0)
    n_samp = (cfg.Ns + 2) * (cfg.M + cfg.Ncp)
    rx = (rng.standard_normal((batch, n_samp, 2)) * 0.5).astype(np.float32)

    rx_step = make_streaming_rx_step(cfg, decoder, batch, fused=fused,
                                     fused_tile=tile)
    if fused:
        from radae_tpu.ops.fused_core import (decoder_weights,
                                              decoder_state_zero)
        dec_params = tuple(jax.device_put(w)
                           for w in decoder_weights(dec_params_tree))
        mkstate = lambda: decoder_state_zero(batch)
    else:
        dec_params = device_put_tree(dec_params_tree)
        mkstate = lambda: decoder.zero_state(batch)
    rx = jax.device_put(rx)

    if scan > 1:
        @jax.jit
        def call(p, rx, state):
            def body(st, _):
                f, st2 = rx_step(p, rx, st)
                return st2, f[:, 0, 0]
            _, outs = jax.lax.scan(body, state, None, length=scan)
            return outs
    else:
        call = rx_step

    # warmup / compile (np.asarray forces real completion)
    out = call(dec_params, rx, mkstate())
    np.asarray(out[0] if isinstance(out, tuple) else out)

    def run_n(n):
        state = mkstate()
        t0 = time.time()
        out = None
        for _ in range(n):
            if scan > 1:
                out = call(dec_params, rx, state)
            else:
                out, state = call(dec_params, rx, state)
        np.asarray(out)
        return time.time() - t0

    n1, n2 = n_frames, 5 * n_frames
    slopes = []
    for _ in range(3):
        t1, t2 = run_n(n1), run_n(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    dt = float(np.median(slopes)) / max(scan, 1)          # per frame

    audio_per_step = batch * cfg.Tmf                      # B * 0.12 s
    return audio_per_step / dt


def _watchdog():
    """Last-resort flush that works even when the main thread is stuck in
    an uninterruptible C call (e.g. the TPU client retrying a dead relay
    tunnel internally, where SIGALRM/SIGTERM handlers never get to run:
    this is how round 1's driver bench produced no JSON at all)."""
    time.sleep(BUDGET_S + 60)
    _emit(error="watchdog: TPU backend unresponsive")
    os._exit(0)


def main():
    import threading
    threading.Thread(target=_watchdog, daemon=True).start()
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(BUDGET_S))

    err = None
    # Fastest-known-good first (measured sweep, round 2: B=2048/tile=512 =
    # 643k audio-s/s, 0.38 ms/step; B=4096/tile=512 VMEM-OOMs).  Each
    # success records immediately so a timeout mid-rung still reports.
    ladder = ((2048, True, 512), (1024, True, 512),
              (1024, False, 0), (8, False, 0))
    for batch, fused, tile in ladder:
        elapsed = time.time() - T_START
        if _best["value"] is not None:
            break                       # got a number: don't risk it
        if elapsed > 0.8 * BUDGET_S:
            break
        try:
            v = run_bench(batch, fused=fused, tile=tile or 512)
            if _best["value"] is None or v > _best["value"]:
                _best["value"] = v
                _best["config"] = f"B={batch},fused={fused},tile={tile}"
                try:
                    with open(CACHE, "w") as f:
                        json.dump({"value": round(v, 1),
                                   "config": _best["config"],
                                   "unix_time": int(time.time())}, f)
                except Exception:
                    pass
        except Exception as e:          # TPU runtime flake: try next rung
            err = f"{type(e).__name__}: {e}"
            continue
    if hasattr(signal, "SIGALRM"):
        signal.alarm(0)
    _emit(error=err)


if __name__ == "__main__":
    main()
