"""Profile the whole-over batched receiver piecewise on the real chip.

Breaks make_batched_receiver's 77/143 ms (B=256, n_frames=8/25) into
stages, each timed as its OWN jitted program with the two-point slope
method, to find where the ~3.9 ms/frame slope actually goes:

  A. detect (acquisition grid matmuls)        -- fixed per over
  B. derotate + align gathers                 -- fixed per over
  C. frame-window gather + scan decode        -- per frame
  D. scan decode with PRE-STACKED windows     -- per frame, no take in body

Run: timeout 1200 python work/prof_batched_rx.py [B] [n_frames]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from radae_tpu.config import flagship_config
from radae_tpu.models.core import CoreDecoder
from radae_tpu.ops import cplx
from radae_tpu.ops.acquisition_op import make_detect_pilots
from radae_tpu.runtime import make_streaming_rx_step, make_batched_receiver
from radae_tpu.utils.hostio import device_put_tree

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 25

cfg = flagship_config()
M, Ncp, Nmf, Fs, Ns = cfg.M, cfg.Ncp, cfg.Nmf, cfg.Fs, cfg.Ns
frame_len = (Ns + 2) * (M + Ncp)
T = Nmf + (NF + 1) * Nmf + Ncp + 2 * Nmf + M
decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
params = device_put_tree(decoder.init(1))

rng = np.random.default_rng(0)
rx_np = (rng.standard_normal((B, T, 2)) * 0.1).astype(np.float32)
rx_dev = jax.device_put(rx_np)


def timeit(fn, *args, reps=(2, 8)):
    out = fn(*args)
    jax.block_until_ready(out)
    n1, n2 = reps
    slopes = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n1):
            jax.block_until_ready(fn(*args))
        t1 = time.time()
        for _ in range(n2):
            jax.block_until_ready(fn(*args))
        t2 = time.time()
        slopes.append(((t2 - t1) - (t1 - t0) * (n2 / n1)) / (n2 - n1))
    # two-point slope removes fixed per-batch overhead only partially;
    # use median of per-call means as the robust statistic
    means = sorted(slopes)
    return means[1]


# ---- whole receiver (the measured headline path) ----
rx_full = make_batched_receiver(cfg, decoder, B, n_frames=NF)
t_full = timeit(lambda r: rx_full(params, r), rx_dev)
print(f"full receiver      B={B} nf={NF}: {t_full*1e3:8.2f} ms/over")

# ---- A: detect only ----
detect = make_detect_pilots(cfg, B)
acq_in = rx_dev[:, : 2 * Nmf + M + Ncp]
t_det = timeit(lambda r: detect(r), acq_in)
print(f"A detect only                  : {t_det*1e3:8.2f} ms")

# ---- B: derotate + align ----
@jax.jit
def derot_align(rx_packed, fmax, tmax):
    rxc = cplx.from_last(rx_packed)
    t = jnp.arange(T, dtype=jnp.float32)[None, :]
    ph = -2.0 * jnp.pi * fmax[:, None] * t / Fs
    rxc = rxc * cplx.C(jnp.cos(ph), jnp.sin(ph))
    start = jnp.maximum(tmax - Ncp, 0)
    n_keep = T - Nmf
    idx = start[:, None] + jnp.arange(n_keep, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(idx, T - 1)
    return cplx.C(jnp.take_along_axis(rxc.re, idx, axis=1),
                  jnp.take_along_axis(rxc.im, idx, axis=1))

fmax = jnp.zeros((B,), jnp.float32) + 1.5
tmax = jnp.zeros((B,), jnp.int32) + 37
t_da = timeit(lambda r: derot_align(r, fmax, tmax), rx_dev)
print(f"B derotate+align               : {t_da*1e3:8.2f} ms")

aligned = derot_align(rx_dev, fmax, tmax)
aligned_packed = jax.device_put(np.asarray(cplx.stack_last(aligned)))

# ---- C: per-frame gather + scan decode (as the receiver does) ----
step = make_streaming_rx_step(cfg, decoder, B)
n_keep = T - Nmf

def make_scan_gather():
    f_idx = (jnp.arange(NF, dtype=jnp.int32)[:, None] * Nmf
             + jnp.arange(frame_len, dtype=jnp.int32)[None, :])
    f_idx = jnp.minimum(f_idx, n_keep - 1)

    @jax.jit
    def run(p, al_packed):
        al = cplx.from_last(al_packed)

        def body(st, fi):
            win = cplx.C(jnp.take(al.re, fi, axis=1),
                         jnp.take(al.im, fi, axis=1))
            f, st = step(p, cplx.stack_last(win), st)
            return st, f
        _, feats = jax.lax.scan(body, decoder.zero_state(B), f_idx)
        return feats
    return run

run_c = make_scan_gather()
t_c = timeit(lambda p, a: run_c(p, a), params, aligned_packed)
print(f"C gather+scan decode           : {t_c*1e3:8.2f} ms "
      f"({t_c/NF*1e3:.3f} ms/frame)")

# ---- D: pre-stacked windows (reshape trick), scan over xs ----
def make_prestacked():
    @jax.jit
    def run(p, al_packed):
        al = al_packed[:, : (NF + 1) * Nmf]          # (B, (NF+1)*Nmf, 2)
        base = al[:, : NF * Nmf].reshape(B, NF, Nmf, 2)
        nxt = al[:, Nmf:].reshape(B, NF, Nmf, 2)[:, :, : frame_len - Nmf]
        wins = jnp.concatenate([base, nxt], axis=2)   # (B, NF, frame_len, 2)
        wins = jnp.swapaxes(wins, 0, 1)               # (NF, B, frame_len, 2)

        def body(st, w):
            f, st = step(p, w, st)
            return st, f
        _, feats = jax.lax.scan(body, decoder.zero_state(B), wins)
        return feats
    return run

run_d = make_prestacked()
t_d = timeit(lambda p, a: run_d(p, a), params, aligned_packed)
print(f"D prestack+scan decode         : {t_d*1e3:8.2f} ms "
      f"({t_d/NF*1e3:.3f} ms/frame)")

# ---- E: decode only, fixed window (lower bound for the scan) ----
@jax.jit
def run_e(p, w):
    def body(st, _):
        f, st = step(p, w, st)
        return st, f[:, 0, 0]
    _, feats = jax.lax.scan(body, decoder.zero_state(B), None, length=NF)
    return feats

one_win = aligned_packed[:, :frame_len]
t_e = timeit(lambda p, w: run_e(p, w), params, one_win)
print(f"E scan decode only (no gather) : {t_e*1e3:8.2f} ms "
      f"({t_e/NF*1e3:.3f} ms/frame)")

print(f"\nsum A+B+C = {(t_det+t_da+t_c)*1e3:.2f} ms vs full {t_full*1e3:.2f}")
