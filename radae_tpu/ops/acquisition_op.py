"""Batched pilot acquisition as MXU matmuls.

The coarse acquisition search correlates the received buffer against
freq-shifted pilot replicas over a (time=Nmf) x (freq=40) grid.  Host-side
this is the numpy Acquisition class (dsp/acquisition.py); for many parallel
streams (the rx-at-scale / evaluate path) this op expresses the whole grid
as two matmuls per stream:

    D[t, f] = | conj(rx[t : t+M]) @ p_w[:, f] |

with the (B, Nmf, M) sliding window built by gather — an
(B*Nmf, M) @ (M, F) MXU contraction (SURVEY §7 stage 6 design).
Split-complex throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import C


def make_detect_pilots(cfg, batch: int, frange=100.0, fstep=2.5,
                       Pacq_error1=1e-5):
    """Build a jitted batched detector.

    detect(rx_packed (B, 2*Nmf+M+Ncp, 2)) ->
        (candidate (B,) bool, tmax (B,) int32, fmax (B,) float32,
         Dthresh (B,), Dtmax (B,))
    """
    M, Nmf = cfg.M, cfg.Nmf
    fcoarse = np.arange(-frange / 2, frange / 2, fstep)
    F = len(fcoarse)
    # freq-shifted pilot replicas (M, F), split on host
    n = np.arange(M)[:, None]
    p_w = np.exp(1j * 2 * np.pi * fcoarse[None, :] * n / cfg.Fs) * cfg.p[:, None]
    PWr = jnp.asarray(np.ascontiguousarray(p_w.real, np.float32))
    PWi = jnp.asarray(np.ascontiguousarray(p_w.imag, np.float32))
    thresh_k = float(2.0 * np.sqrt(-np.log(Pacq_error1 / 5.0)))

    # sliding-window gather indices (Nmf, M)
    win_idx = (np.arange(Nmf)[:, None] + np.arange(M)[None, :]).astype(np.int32)

    def grid(rx: C, offset: int):
        """|corr| grid (B, Nmf, F) for windows starting at offset."""
        wr = rx.re[:, offset:offset + Nmf + M - 1][:, win_idx]  # (B,Nmf,M)
        wi = rx.im[:, offset:offset + Nmf + M - 1][:, win_idx]
        # conj(rx) @ p_w  (split): re = wr@PWr + wi@PWi; im = wr@PWi - wi@PWr
        Dr = wr @ PWr + wi @ PWi
        Di = wr @ PWi - wi @ PWr
        return jnp.sqrt(Dr * Dr + Di * Di)

    def detect(rx_packed):
        rx = cplx.from_last(rx_packed)
        D1 = grid(rx, 0)                     # pilots at frame start
        D2 = grid(rx, Nmf)                   # pilots one frame later
        D12 = D1 + D2                        # (B, Nmf, F)
        flat = D12.reshape(D12.shape[0], -1)
        amax = jnp.argmax(flat, axis=1)
        tmax = (amax // F).astype(jnp.int32)
        fmax = jnp.asarray(fcoarse, jnp.float32)[amax % F]
        Dtmax = jnp.take_along_axis(flat, amax[:, None], axis=1)[:, 0]
        sigma_r = 0.5 * (D1.mean(axis=(1, 2)) + D2.mean(axis=(1, 2))) \
            / np.sqrt(np.pi / 2)
        Dthresh = thresh_k * sigma_r
        return Dtmax > Dthresh, tmax, fmax, Dthresh, Dtmax

    return jax.jit(detect)
