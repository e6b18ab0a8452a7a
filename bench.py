"""Headline benchmark: streaming rx decode throughput, audio-seconds/s/chip.

Batches the 120 ms streaming receiver step (OFDM demod + LS pilot EQ +
stateful core decoder -- the radae_rxe hot path) across independent streams
(channel realisations), the serving configuration for TPU.  The decoder
runs as the Pallas VMEM-resident fused kernel (radae_tpu/ops/fused_core.py).

Baseline: the reference streaming receiver decodes 9.82 s of audio in
6.41 s of CPU time (65.26% of real time on a laptop core; reference
README.md:312-318) = 1.532 audio-seconds/s.

Robustness contract (the driver runs this under `timeout` on a relay-
tunnelled TPU where session setup alone can take 30 s - 5 min, and where
the TPU client can hang *uninterruptibly* inside C code -- signal handlers
never run; that is how rounds 1 and 2 scored 0.0):

  * The PARENT process never imports jax, so it can always flush a result.
  * All TPU work happens in a CHILD process (its own session group).  The
    child runs a ladder of configs CHEAPEST-COMPILE-FIRST and streams one
    result line per completed rung; the first rung (B=8, unfused, no scan)
    compiles in seconds and banks a nonzero number immediately.
  * If the child produces nothing within FIRST_RESULT_DEADLINE, the parent
    kills the whole child process group and retries ONCE with a fresh child
    (fresh TPU session) restricted to the cheap rungs.
  * SIGTERM/SIGINT/SIGALRM and a watchdog thread in the parent flush the
    best result obtained so far.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s/chip", "vs_baseline": N}
"""

import json
import os
import queue
import signal
import subprocess
import sys
import threading
import time

REF_AUDIO_SEC_PER_S = 9.82 / 6.41     # reference CPU realtime throughput
T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "360"))
HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, ".bench_cache.json")

# Ladder of (batch, fused, tile, scan), cheapest compile first.  Each rung
# reports immediately on completion; later rungs only improve the result.
# Round-4 sweep #2: the CHAIN-MERGED kernel (17 instead of 27 serial dots
# per z-step, identical numerics — ops/fused_core.py merged=True) beats
# everything: mergedf32 B=2048 tile=512 scan=256 = 1.85-1.92M
# audio-s/s/chip (the headline; B=3072/1024 within 4%, tile=256 -15%,
# B=4096 HTTP 500s in the compile helper).  Merged f32 > merged int8
# (1.80M): with fewer serial dots the kernel is issue/VPU-latency-bound
# and the dequant multiplies cost more than the VMEM savings buy; the
# UNmerged kernel keeps the opposite ordering (int8 1.37M > f32 1.31M,
# round-4 sweep #1).  The whole-frame kernel stays RETIRED (compiles
# post-fix but trails the composite at every config — RESULTS.md).
# Round-5 sweep (work/sweep_pad.json): the padded scratch-x kernel
# (merged="pad", 1.19-1.25M) and frames_per_step>1 (1.55-1.65M) are both
# measured SLOWER than the headline at every config and stay off the
# ladder — see RESULTS.md round-5 note for the numbers and reading.
# Rung order: two instant-compile rungs bank a nonzero number, then go
# STRAIGHT for the headline (slow relay windows can fit only one big
# compile in the budget); remaining rungs are fallbacks/filler for
# healthy windows.
LADDER = (
    (8,    False, 0,   1),    # compiles in seconds: banks a nonzero number
    (256,  False, 0,   8),    # small unfused scan: still cheap, ~600k
    (2048, "mergedf32", 512, 256),  # 1.85-1.92M merged-kernel headline
    (3072, "int8m", 384, 256),  # 1.78-1.80M merged int8
    (3072, "int8", 384, 256),  # 1.35-1.39M round-4 #1 headline (fallback)
    (3072, True,  384, 256),  # 1.29M f32 unmerged (round-3 sweep)
)
CHEAP_RUNGS = 2               # retry child only attempts LADDER[:CHEAP_RUNGS]


# --------------------------------------------------------------------------
# Child: owns the TPU session, runs the ladder, one result line per rung.
# --------------------------------------------------------------------------

def run_bench(batch: int, n_frames: int = 5, fused: bool = True,
              tile: int = 512, scan: int = 32, fps: int = 1):
    """Steady-state decode throughput via the two-point slope method.

    The streaming receiver decodes modem frames back-to-back, so the
    serving unit of work is `scan` state-chained frames inside ONE jitted
    program (lax.scan): per-frame time is then pure device time.  On
    tunnelled TPU runtimes a single device->host readback also carries a
    large fixed latency that has nothing to do with chip throughput, so we
    additionally time n1 and n2 chained calls and take (t2-t1)/(n2-n1)
    as the per-call time.  Consecutive calls are state-chained (each call
    consumes the previous call's on-device final state) so they stay
    strictly sequential on device even under async dispatch.
    """
    import numpy as np
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
    n_samp = fps * cfg.Nmf + cfg.M + cfg.Ncp   # fps frames + closing pilot
    rx = (rng.standard_normal((batch, n_samp, 2)) * 0.5).astype(np.float32)

    # fused: False = plain XLA; True = composite (XLA demod + fused
    # decoder kernel); "frame" = whole-frame kernel with manual rx DMA
    # (demod+EQ+demap+decoder in ONE Pallas program, rx block in HBM);
    # "frame_vmem" = same kernel with the rx block pipelined into VMEM by
    # the grid instead of hand-DMA'd
    if fused in ("frame", "frame_vmem"):
        from radae_tpu.ops.fused_core import (make_fused_rx_frame_step,
                                              fused_rx_weights,
                                              decoder_state_zero)
        frame_step = make_fused_rx_frame_step(cfg, batch, tile=tile,
                                              rx_dma=(fused == "frame"))
        rx_step = lambda p, r, st: frame_step(p, r, *st)
        dec_params = tuple(jax.device_put(w)
                           for w in fused_rx_weights(dec_params_tree, cfg))
        mkstate = lambda: decoder_state_zero(batch)
    else:
        # fused="int8" = composite with int8 VMEM-resident decoder weights;
        # "int8bf16" additionally computes the matmuls in bf16;
        # "int8m"/"mergedf32" = the chain-merged kernel (17 instead of 27
        # serial dots per z-step, identical numerics) with int8/f32 weights;
        # "padf32"/"padi8" = the chain-merged kernel with the padded
        # scratch-x layout (growing-concat copies eliminated)
        import jax.numpy as jnp
        quant = ("int8" if fused in ("int8", "int8bf16", "int8m", "padi8")
                 else None)
        dtype = jnp.bfloat16 if fused == "int8bf16" else None
        merged = ("pad" if fused in ("padf32", "padi8")
                  else fused in ("int8m", "mergedf32"))
        rx_step = make_streaming_rx_step(cfg, decoder, batch,
                                         fused=bool(fused),
                                         fused_tile=tile, fused_quant=quant,
                                         fused_dtype=dtype,
                                         fused_merged=merged,
                                         frames_per_step=fps)
        if fused:
            from radae_tpu.ops.fused_core import (decoder_weights,
                                                  decoder_state_zero)
            dec_params = tuple(jax.device_put(w)
                               for w in decoder_weights(dec_params_tree,
                                                        quant=quant,
                                                        merged=merged))
            mkstate = lambda: decoder_state_zero(batch, merged=merged)
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
            final_state, outs = jax.lax.scan(body, state, None, length=scan)
            return outs, final_state
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
            out, state = call(dec_params, rx, state)
        np.asarray(out)
        return time.time() - t0

    n1, n2 = n_frames, 5 * n_frames

    def measure():
        slopes = []
        for _ in range(3):
            t1, t2 = run_n(n1), run_n(n2)
            slopes.append((t2 - t1) / (n2 - n1))
        return float(np.median(slopes)) / (max(scan, 1) * fps)  # per frame

    # A relay stall during a t1 window can make a slope non-positive
    # (observed once: it floored dt and produced a 3e10 "result").  A
    # per-frame time below 1us is physically impossible for this model
    # (one frame reads 3.6 MB of weights); treat it as a timing glitch
    # and re-measure once, then fail the rung rather than report it.
    dt = measure()
    if dt < 1e-6:
        dt = measure()
    if dt < 1e-6:
        raise RuntimeError(f"implausible per-frame time {dt:.3e}s "
                           "(relay timing glitch)")

    audio_per_step = batch * cfg.Tmf                      # B * 0.12 s
    return audio_per_step / dt


def child_main(deadline: float, max_rungs: int):
    """Run the ladder; print '@RUNG {json}' per completed rung (stdout is a
    pipe to the parent, line-buffered via flush)."""
    plat = os.environ.get("BENCH_PLATFORM")      # test hook: "cpu"
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    try:
        # persistent compilation cache inside the repo: a fresh bench
        # process (the driver's) reuses compiles banked by earlier runs in
        # the same working tree — compiles, not measurement, dominate the
        # ladder's wall-clock when the relay compile helper is slow
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    for batch, fused, tile, scan in LADDER[:max_rungs]:
        if time.time() > deadline:
            break
        try:
            v = run_bench(batch, fused=fused, tile=tile or 512, scan=scan)
            msg = {"value": v,
                   "config": f"B={batch},fused={fused},tile={tile},scan={scan}"}
            sys.stdout.write("@RUNG " + json.dumps(msg) + "\n")
            sys.stdout.flush()
        except Exception as e:                     # TPU flake: try next rung
            sys.stderr.write(f"rung B={batch} failed: "
                             f"{type(e).__name__}: {e}\n")
            sys.stderr.flush()


# --------------------------------------------------------------------------
# Parent: jax-free supervisor; always emits exactly one JSON line.
# --------------------------------------------------------------------------

_best = {"value": None, "config": None, "printed": False}


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


# Physical plausibility ceiling for the parent-side guard: decoding one
# audio-second costs ~45 MFLOP in the decoder alone (25 z-steps x 1.8
# MFLOP), so even at the full ~100 TFLOP/s MXU peak one chip tops out
# around 2.2M audio-s/s.  Anything reported an order of magnitude above
# that is a measurement artifact, not throughput.
PLAUSIBLE_MAX = 2e7


def _record(value, config):
    if not (0.0 < value < PLAUSIBLE_MAX):
        sys.stderr.write(f"discarding implausible rung value {value:.3e} "
                         f"({config})\n")
        return
    if _best["value"] is None or value > _best["value"]:
        _best["value"] = value
        _best["config"] = config
        if os.environ.get("BENCH_PLATFORM"):
            # test-hook runs (CPU) must not clobber the real on-chip
            # cache that the error path reports as last_measured
            return
        try:
            # never DOWNGRADE the banked number: a deadline-truncated run
            # that only reached a cheap rung must not clobber a previous
            # full-ladder result (the cache is the outage-fallback record).
            # Every run still stamps last_run so the record shows how
            # recent the most recent successful measurement is.
            prev = {}
            try:
                with open(CACHE) as f:
                    prev = json.load(f)
            except Exception:
                pass
            entry = {"value": round(value, 1), "config": config,
                     "unix_time": int(time.time())}
            best = dict(entry) if value > prev.get("value", 0.0) else \
                {k: prev[k] for k in ("value", "config", "unix_time")
                 if k in prev}
            # dict(entry) above is load-bearing: with best IS entry,
            # the next line made the object self-referential and the old
            # streaming json.dump wrote a prefix then raised "Circular
            # reference detected" (swallowed) — every fresh-cache write
            # was silently truncated at '"last_run": ', and the corrupt
            # file then defeated the never-downgrade guard on all later
            # runs.
            best["last_run"] = entry
            # Serialize FIRST and publish with an atomic rename: neither
            # a mid-dump exception nor a signal (e.g. the parent's own
            # SIGALRM budget handler) can leave a partial file behind a
            # rename.
            payload = json.dumps(best)
            tmp = CACHE + ".tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, CACHE)
        except Exception:
            pass


_children = []


def _kill_children():
    for proc in _children:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except Exception:
                pass


def _on_signal(signum, frame):
    _kill_children()
    _emit(error=f"interrupted by signal {signum}")
    os._exit(0)


def _spawn_child(max_rungs: int):
    deadline = T_START + 0.92 * BUDGET_S
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         f"{deadline}", f"{max_rungs}"],
        stdout=subprocess.PIPE, stderr=sys.stderr,
        cwd=HERE, start_new_session=True, text=True)
    _children.append(proc)
    q = queue.Queue()

    def reader():
        try:
            for line in proc.stdout:
                if line.startswith("@RUNG "):
                    try:
                        q.put(json.loads(line[6:]))
                    except Exception:
                        pass
        except Exception:
            pass
        q.put(None)                                   # EOF sentinel

    threading.Thread(target=reader, daemon=True).start()
    return proc, q


def _harvest(proc, q, stop_if_no_result_by: float):
    """Drain rung results until child exit, parent budget expiry, or (while
    still resultless) the first-result deadline.  Returns True if any result
    arrived."""
    got = _best["value"] is not None
    while True:
        now = time.time()
        hard_deadline = T_START + 0.95 * BUDGET_S
        deadline = hard_deadline if got else min(hard_deadline,
                                                 stop_if_no_result_by)
        if now >= deadline:
            return got
        try:
            item = q.get(timeout=min(2.0, deadline - now))
        except queue.Empty:
            continue
        if item is None:                               # child EOF
            try:
                # The TPU client's exit destructors can hang even after a
                # successful run; never let that (or any wait error) unwind
                # past _emit -- the banked result must still be printed.
                proc.wait(timeout=10)
            except Exception:
                pass
            return got
        _record(item["value"], item["config"])
        got = True


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(BUDGET_S))

    def watchdog():
        time.sleep(BUDGET_S + 30)
        _kill_children()
        _emit(error="watchdog: parent overran budget")
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    # Attempt 1: full ladder.  The TPU client can take 30s-5min just to
    # open a session; give the first rung up to 55% of budget before
    # declaring the session dead.
    proc, q = _spawn_child(max_rungs=len(LADDER))
    got = _harvest(proc, q, stop_if_no_result_by=T_START + 0.55 * BUDGET_S)

    if not got:
        # Session hung or child died resultless: kill the group, retry once
        # with a fresh session on the cheap rungs only (the relay may have
        # recovered).
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except Exception:
                pass
        time.sleep(2)                     # let the chip lease lapse
        proc2, q2 = _spawn_child(max_rungs=CHEAP_RUNGS)
        got = _harvest(proc2, q2,
                       stop_if_no_result_by=T_START + 0.95 * BUDGET_S)

    _kill_children()
    if hasattr(signal, "SIGALRM"):
        signal.alarm(0)
    _emit(error="TPU backend produced no result within budget")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        child_main(deadline=float(sys.argv[2]), max_rungs=int(sys.argv[3]))
    else:
        main()
