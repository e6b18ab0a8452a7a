"""Piecewise profile of the REDESIGNED whole-over batched receiver on the
real chip (VERDICT r4 item 3: the shipped 0.63/9.3/0.27 ms split described
the old pre-barrel-shift design; re-profile the current program and the
new product-grade acquisition).

Stages, each its own jitted program:

  A. legacy one-shot receiver  (n_windows=1, the round-4 headline program)
  B. product receiver          (n_windows=12 + refine + eoo, this round)
  C. windowed detect only      (12-window scan of grid matmuls)
  D. refine only
  E. barrel-shift align + derotate only
  F. decode scan w/ dynamic-slice windows (new) vs jnp.take gather (old)

Timing: state-chained slope method — block_until_ready does NOT wait on
this backend; each call consumes a value derived from the previous call's
output and only the last output is read back (see bench.run_bench).

Run: timeout 1800 python work/prof_batched_rx2.py [B] [n_frames]
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
from radae_tpu.models.core import CoreDecoder                 # noqa: E402
from radae_tpu.ops import cplx                                # noqa: E402
from radae_tpu.ops.acquisition_op import (                    # noqa: E402
    make_detect_pilots, make_detect_pilots_windowed, make_refine)
from radae_tpu.runtime import (make_streaming_rx_step,        # noqa: E402
                               make_batched_receiver)
from radae_tpu.utils.hostio import device_put_tree            # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 25
NW = 12

cfg = flagship_config()
M, Ncp, Nmf, Fs, Ns = cfg.M, cfg.Ncp, cfg.Nmf, cfg.Fs, cfg.Ns
frame_len = (Ns + 2) * (M + Ncp)
T = max((NW + 1) * Nmf + M + Ncp,
        NW * Nmf + (NF + 1) * Nmf + Ncp) + M
decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
params = device_put_tree(decoder.init(1))

rng = np.random.default_rng(0)
rx_np = (rng.standard_normal((B, T, 2)) * 0.1).astype(np.float32)
rx_dev = jax.device_put(rx_np)


def timeit(call, reps=(2, 10)):
    """Chained two-point slope: call(rx)->scalar; each iteration's input
    depends on the previous output so calls serialize on device."""
    s = call(rx_dev)
    np.asarray(s)                       # force compile + completion

    def run_n(n):
        r = rx_dev
        t0 = time.time()
        out = None
        for _ in range(n):
            out = call(r)
            r = rx_dev + out * 0.0      # data dependency, ~free
        np.asarray(out)
        return time.time() - t0

    n1, n2 = reps
    slopes = []
    for _ in range(3):
        t1, t2 = run_n(n1), run_n(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    return float(np.median(slopes))


def scalar(x):
    return jnp.asarray(x, jnp.float32).reshape(-1)[0]


# ---- A: legacy one-shot receiver ----
rx_a = make_batched_receiver(cfg, decoder, B, n_frames=NF)
t_a = timeit(jax.jit(lambda r: scalar(rx_a(params, r)[0][:, 0, 0, 0].sum())))
print(f"A legacy receiver (1 window)      : {t_a*1e3:8.2f} ms/over", flush=True)

# ---- B: product receiver ----
rx_b = make_batched_receiver(cfg, decoder, B, n_frames=NF,
                             n_windows=NW, refine=True, eoo=True)
def _b_call(r):
    o = rx_b(params, r)
    return scalar(o["features"][:, 0, 0, 0].sum()
                  + o["eoo_bits"][:, 0].sum() * 0.0)


t_b = timeit(jax.jit(_b_call))
print(f"B product receiver (12w+ref+eoo)  : {t_b*1e3:8.2f} ms/over", flush=True)

# ---- C: windowed detect only ----
det_w = make_detect_pilots_windowed(cfg, B, NW)
t_c = timeit(jax.jit(lambda r: scalar(det_w(r)[1].sum())))
print(f"C windowed detect only            : {t_c*1e3:8.2f} ms", flush=True)

det_1 = make_detect_pilots(cfg, B)
t_c1 = timeit(jax.jit(
    lambda r: scalar(det_1(r[:, : 2 * Nmf + M + Ncp])[1].sum())))
print(f"C1 one-window detect only         : {t_c1*1e3:8.2f} ms", flush=True)

# ---- D: refine only ----
ref = make_refine(cfg, B)
tm = jnp.full((B,), 1000, jnp.int32)
fm = jnp.full((B,), 3.0, jnp.float32)


@jax.jit
def d_call(r):
    x = cplx.from_last(r)
    t2, f2 = ref(x.re, x.im, tm, fm)
    return scalar(t2.sum() + f2.sum())


t_d = timeit(d_call)
print(f"D refine only                     : {t_d*1e3:8.2f} ms", flush=True)

# ---- E: barrel-shift align + derotate only ----
nbits = int(np.ceil(np.log2(NW * Nmf)))
n_keep = T - NW * Nmf


@jax.jit
def e_call(r):
    x = cplx.from_last(r)
    start = jnp.full((B,), 4321, jnp.int32)
    xr, xi = x.re, x.im

    def shift(a, sh):
        return jnp.concatenate(
            [a[:, sh:], jnp.broadcast_to(a[:, -1:], (B, sh))], axis=1)

    for k in range(nbits):
        sh = 1 << k
        bit = (((start >> k) & 1) > 0)[:, None]
        xr = jnp.where(bit, shift(xr, sh), xr)
        xi = jnp.where(bit, shift(xi, sh), xi)
    xr, xi = xr[:, :n_keep], xi[:, :n_keep]
    th = -2.0 * jnp.pi * fm / Fs
    hi_n = -(-n_keep // 128)
    a_lo = th[:, None] * jnp.arange(128, dtype=jnp.float32)[None, :]
    a_hi = th[:, None] * (128.0 * jnp.arange(hi_n, dtype=jnp.float32)[None, :]
                          + start[:, None].astype(jnp.float32))
    cl, sl = jnp.cos(a_lo), jnp.sin(a_lo)
    chh, shh = jnp.cos(a_hi), jnp.sin(a_hi)
    rr = (chh[:, :, None] * cl[:, None, :]
          - shh[:, :, None] * sl[:, None, :]).reshape(B, hi_n * 128)[:, :n_keep]
    ri = (chh[:, :, None] * sl[:, None, :]
          + shh[:, :, None] * cl[:, None, :]).reshape(B, hi_n * 128)[:, :n_keep]
    return scalar((xr * rr - xi * ri).sum())


t_e = timeit(e_call)
print(f"E barrel align+derotate only      : {t_e*1e3:8.2f} ms", flush=True)

# ---- F: decode scan, dynamic-slice vs take-gather windows ----
step = make_streaming_rx_step(cfg, decoder, B)
al_np = (rng.standard_normal((B, n_keep + Nmf, 2)) * 0.1).astype(np.float32)
al_dev = jax.device_put(al_np)


@jax.jit
def f_slice(a):
    ar, ai = a[..., 0], a[..., 1]

    def body(st, k):
        wr = jax.lax.dynamic_slice_in_dim(ar, k * Nmf, frame_len, axis=1)
        wi = jax.lax.dynamic_slice_in_dim(ai, k * Nmf, frame_len, axis=1)
        f, st = step(params, cplx.stack_last(cplx.C(wr, wi)), st)
        return st, f[:, 0, 0]

    _, fs = jax.lax.scan(body, decoder.zero_state(B),
                         jnp.arange(NF, dtype=jnp.int32))
    return scalar(fs.sum())


@jax.jit
def f_take(a):
    ar, ai = a[..., 0], a[..., 1]
    f_idx = (jnp.arange(NF, dtype=jnp.int32)[:, None] * Nmf
             + jnp.arange(frame_len, dtype=jnp.int32)[None, :])

    def body(st, fi):
        win = cplx.C(jnp.take(ar, fi, axis=1), jnp.take(ai, fi, axis=1))
        f, st = step(params, cplx.stack_last(win), st)
        return st, f[:, 0, 0]

    _, fs = jax.lax.scan(body, decoder.zero_state(B), f_idx)
    return scalar(fs.sum())


def timeit_al(call):
    s = call(al_dev)
    np.asarray(s)

    def run_n(n):
        a = al_dev
        t0 = time.time()
        out = None
        for _ in range(n):
            out = call(a)
            a = al_dev + out * 0.0
        np.asarray(out)
        return time.time() - t0

    slopes = []
    for _ in range(3):
        t1, t2 = run_n(2), run_n(10)
        slopes.append((t2 - t1) / 8)
    return float(np.median(slopes))


t_fs = timeit_al(f_slice)
t_ft = timeit_al(f_take)
print(f"F decode scan, dynamic-slice wins : {t_fs*1e3:8.2f} ms "
      f"({t_fs/NF*1e3:.3f} ms/frame)", flush=True)
print(f"F decode scan, take-gather wins   : {t_ft*1e3:8.2f} ms "
      f"({t_ft/NF*1e3:.3f} ms/frame)", flush=True)

print(f"\nB={B} NF={NF} T={T}; legacy {t_a*1e3:.2f} ms, "
      f"product {t_b*1e3:.2f} ms; audio-s/s legacy "
      f"{B*NF*cfg.Tmf/t_a:,.0f}, product {B*NF*cfg.Tmf/t_b:,.0f}")
