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


def _pilot_replicas(cfg, frange, fstep, Pacq_error1):
    """Shared coarse-search setup: freq-shifted pilot replicas (M, F)
    split-complex, the coarse frequency axis, and the Rayleigh threshold
    multiplier 2*sqrt(-ln(Pa/5)) (reference: dsp.py:217-221).  Both
    detectors below derive from this so replica phase / threshold fixes
    cannot diverge."""
    fcoarse = np.arange(-frange / 2, frange / 2, fstep)
    n = np.arange(cfg.M)[:, None]
    p_w = (np.exp(1j * 2 * np.pi * fcoarse[None, :] * n / cfg.Fs)
           * cfg.p[:, None])
    PWr = jnp.asarray(np.ascontiguousarray(p_w.real, np.float32))
    PWi = jnp.asarray(np.ascontiguousarray(p_w.imag, np.float32))
    thresh_k = float(2.0 * np.sqrt(-np.log(Pacq_error1 / 5.0)))
    return fcoarse, PWr, PWi, thresh_k


def make_detect_pilots(cfg, batch: int, frange=100.0, fstep=2.5,
                       Pacq_error1=1e-5):
    """Build a jitted batched detector.

    detect(rx_packed (B, 2*Nmf+M+Ncp, 2)) ->
        (candidate (B,) bool, tmax (B,) int32, fmax (B,) float32,
         Dthresh (B,), Dtmax (B,))
    """
    M, Nmf = cfg.M, cfg.Nmf
    fcoarse, PWr, PWi, thresh_k = _pilot_replicas(cfg, frange, fstep,
                                                  Pacq_error1)
    F = len(fcoarse)

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


def make_detect_pilots_windowed(cfg, batch: int, n_windows: int,
                                frange=100.0, fstep=2.5, Pacq_error1=1e-5,
                                consec: int | None = None,
                                t_match_tol: int | None = None,
                                tstride: int = 2):
    """Windowed-retry batched detector — the product receiver's
    search->candidate->acquired state machine (one detect_pilots attempt
    per 120 ms frame; acquire only after `consec` CONSECUTIVE above-
    threshold detections whose timing agrees within t_match_tol samples,
    reference: rx.py:146-199 — a lone threshold crossing at operating
    SNR is often a fade/data artifact with wrong (t, f); only the true
    pilot peak is stable across successive windows) inside ONE XLA
    program: the detection grid is evaluated over n_windows successive
    2-frame windows (window k = frames k, k+1).  Per-frame grids are
    computed once and shared by the two windows that use them (a
    lax.scan carries grid k while computing grid k+1), so the cost is
    (n_windows+1) grid matmuls, not 2*n_windows.

    consec defaults to min(3, n_windows) (the reference requires 3;
    capped so tiny window budgets can still acquire); t_match_tol
    defaults to the reference's 0.02*M (widened to cover tstride).

    tstride correlates the time grid every `tstride` samples instead of
    every sample: the grid is HBM-bound on its (B, Nt, M) sliding-window
    materialisation (~1.2 GB/window at B=256 full-rate, measured ~1.9 ms
    each), and the pilot correlation peak is several samples wide (the
    reference's own match tolerance is 0.02*M = 3.2 samples), so stride 2
    halves the traffic at no detection loss; the downstream refine stage
    searches +-2 samples and recovers the exact timing.

    detect(rx_packed (B, T, 2)), T >= (n_windows+1)*Nmf + M + Ncp ->
        (candidate (B,) bool   -- acquired (consec stable hits),
         tmax (B,) int32       -- ABSOLUTE sample index of the pilot
                                  (k*Nmf + t at the acquiring window k;
                                  best-effort argmax row if no hit),
         fmax (B,) float32,
         win (B,) int32        -- acquiring window (n_windows if none),
         Dthresh (B,) float32) -- threshold from the across-window mean
                                  sigma_r (reused as the EOO threshold,
                                  reference: dsp.py:300-320)
    """
    M, Nmf, Fs = cfg.M, cfg.Nmf, cfg.Fs
    if consec is None:
        consec = min(3, n_windows)
    if t_match_tol is None:
        # reference rx.py:175 (0.02*M), widened so a true peak quantised
        # to adjacent stride bins still matches
        t_match_tol = max(int(round(0.02 * M)), tstride + 2)
    fcoarse, PWr, PWi, thresh_k = _pilot_replicas(cfg, frange, fstep,
                                                  Pacq_error1)
    F = len(fcoarse)
    toff = np.arange(0, Nmf, tstride)
    win_idx = (toff[:, None] + np.arange(M)[None, :]).astype(np.int32)
    fvec = jnp.asarray(fcoarse, jnp.float32)

    def grid_at(xr, xi, off):
        """|corr| grid (B, Nt, F) for windows starting at sample `off`
        (traced scalar ok: dynamic_slice + static sliding-window gather)."""
        sr = jax.lax.dynamic_slice_in_dim(xr, off, Nmf + M - 1, axis=1)
        si = jax.lax.dynamic_slice_in_dim(xi, off, Nmf + M - 1, axis=1)
        wr, wi = sr[:, win_idx], si[:, win_idx]         # (B, Nt, M)
        Dr = wr @ PWr + wi @ PWi
        Di = wr @ PWi - wi @ PWr
        return jnp.sqrt(Dr * Dr + Di * Di)

    def detect(rx_packed):
        B = rx_packed.shape[0]
        assert rx_packed.shape[1] >= (n_windows + 1) * Nmf + M, \
            (rx_packed.shape, n_windows)
        xr, xi = rx_packed[..., 0], rx_packed[..., 1]
        G0 = grid_at(xr, xi, 0)
        zi = jnp.zeros((B,), jnp.int32)
        zf = jnp.zeros((B,), jnp.float32)
        init = (G0, jnp.zeros((B,), bool), zi, zf,
                jnp.full((B,), n_windows, jnp.int32),    # win
                zi, jnp.full((B,), -10 * Nmf, jnp.int32),  # count, t_prev
                jnp.full((B,), -1.0, jnp.float32), zi, zf,  # global best
                (zf, zf))                # (sigma sum, nonzero-window count)

        def body(carry, k):
            (G_prev, found, tmax, fmax, win, count, t_prev,
             bD, bt, bf, sig) = carry
            G_next = grid_at(xr, xi, (k + 1) * Nmf)
            D12 = G_prev + G_next
            flat = D12.reshape(B, -1)
            amax = jnp.argmax(flat, axis=1)
            t_rel = (tstride * (amax // F)).astype(jnp.int32)  # within-frame
            t_k = k.astype(jnp.int32) * Nmf + t_rel      # absolute
            f_k = fvec[amax % F]
            D_k = jnp.take_along_axis(flat, amax[:, None], axis=1)[:, 0]
            sigma_k = 0.5 * (G_prev.mean(axis=(1, 2))
                             + G_next.mean(axis=(1, 2))) / np.sqrt(np.pi / 2)
            cand_k = D_k > thresh_k * sigma_k
            # candidate state machine: consecutive hits must agree in
            # within-frame timing (pilots are Nmf-periodic, so the true
            # peak's t_rel is stable; fade/data artifacts move around).
            # Wrap-aware distance: a pilot sitting within tol of the
            # frame boundary can flip its argmax between t~0 and t~Nmf-1
            # across windows and must still count as agreement
            dt_ = jnp.abs(t_rel - t_prev)
            agree = jnp.minimum(dt_, Nmf - dt_) <= t_match_tol
            count = jnp.where(cand_k & agree, count + 1,
                              jnp.where(cand_k, 1, 0))
            t_prev = jnp.where(cand_k, t_rel, t_prev)
            hit = (~found) & (count >= consec)
            tmax = jnp.where(hit, t_k, tmax)
            fmax = jnp.where(hit, f_k, fmax)
            win = jnp.where(hit, k.astype(jnp.int32), win)
            found = found | hit
            better = D_k > bD
            bD = jnp.where(better, D_k, bD)
            bt = jnp.where(better, t_k, bt)
            bf = jnp.where(better, f_k, bf)
            # exclude exact-zero windows from the sigma average: buffers
            # are zero-padded to the acquisition length (rx_batch, short
            # overs), and averaging empty windows in would deflate the
            # EOO threshold downstream into false end-of-over detections
            nz_ = sigma_k > 0.0
            return (G_next, found, tmax, fmax, win, count, t_prev,
                    bD, bt, bf,
                    (sig[0] + jnp.where(nz_, sigma_k, 0.0),
                     sig[1] + nz_.astype(jnp.float32))), None

        carry, _ = jax.lax.scan(body, init, jnp.arange(n_windows))
        _, found, tmax, fmax, win, _, _, bD, bt, bf, sig = carry
        tmax = jnp.where(found, tmax, bt)
        fmax = jnp.where(found, fmax, bf)
        Dthresh = thresh_k * sig[0] / jnp.maximum(sig[1], 1.0)
        return found, tmax, fmax, win, Dthresh

    return jax.jit(detect)


def make_refine(cfg, batch: int, t_half: int = 2,
                f_half: float = 2.0, f_step: float = 0.25):
    """Batched fine time/frequency refinement around a coarse peak — the
    product path's acquisition.refine (reference: dsp.py:233-270), split-
    complex and factored so the per-row frequency shift is an outer
    product with FIXED fine-offset replica matrices:

        D[b,dt,df] = | R1[b,dt,:] @ w1(fmax[b]+df) + R2 @ w2(...) |
        w1(f)[n] = exp(-i 2 pi f n / Fs) conj(p)[n]
        w2(f)    = w1(f) * exp(-i 2 pi f Nmf / Fs)

    with exp(-i 2 pi (fmax+df) ...) = per-row(fmax) * static(df).  The
    coarse grid's fstep=2.5 Hz leaves up to +-1.25 Hz residual; this
    brings it to +-f_step/2 (the product receiver's sync entry does the
    same before starting to decode, rx.py:201-205).

    refine(xr, xi (B, T), tmax (B,) int32, fmax (B,) f32)
        -> (tmax, fmax) refined."""
    M, Nmf, Fs = cfg.M, cfg.Nmf, cfg.Fs
    dts = np.arange(-t_half, t_half + 1, dtype=np.int32)
    dfs = np.arange(-f_half, f_half + f_step / 2, f_step, dtype=np.float32)
    nt, nf = len(dts), len(dfs)
    n = np.arange(M, dtype=np.float32)
    cp_r = np.ascontiguousarray(cfg.p.real, np.float32)      # conj(p)
    cp_i = np.ascontiguousarray(-cfg.p.imag, np.float32)
    ang = -2.0 * np.pi * n[:, None] * dfs[None, :] / Fs      # (M, nf)
    Fr, Fi = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))
    a2 = -2.0 * np.pi * dfs * Nmf / Fs                       # (nf,)
    g2r, g2i = jnp.asarray(np.cos(a2)), jnp.asarray(np.sin(a2))
    narr = jnp.asarray(n)

    # window extraction: ONE contiguous (M + 2*t_half)-column gather per
    # pilot copy, then the nt time-shifted windows as STATIC slices of
    # that block — element gathers don't vectorise on the VPU (the naive
    # (B, nt*M) gather measured 11 ms at B=256; this is ~5x less traffic
    # and the slices are free copies).  Clamp semantics identical: block
    # index j = dt + t_half + n covers exactly the old tmax+dt+n range.
    blk = M + 2 * t_half

    def windows(x, idx):
        b = jnp.take_along_axis(x, idx, axis=1)              # (B, blk)
        return jnp.stack([b[:, d:d + M] for d in range(nt)], axis=1)

    def refine(xr, xi, tmax, fmax):
        B, T = xr.shape
        idxb = jnp.clip(tmax[:, None] - t_half
                        + jnp.arange(blk, dtype=jnp.int32)[None, :], 0, T - 1)
        idx2 = jnp.clip(idxb + Nmf, 0, T - 1)
        R1r, R1i = windows(xr, idxb), windows(xi, idxb)      # (B, nt, M)
        R2r, R2i = windows(xr, idx2), windows(xi, idx2)
        # per-row base replica A[b,n] * conj(p)[n]
        th = (-2.0 * jnp.pi / Fs) * fmax[:, None] * narr[None, :]
        Ar, Ai = jnp.cos(th), jnp.sin(th)
        Wr = Ar * cp_r[None, :] - Ai * cp_i[None, :]
        Wi = Ar * cp_i[None, :] + Ai * cp_r[None, :]
        Q1r = R1r * Wr[:, None, :] - R1i * Wi[:, None, :]
        Q1i = R1r * Wi[:, None, :] + R1i * Wr[:, None, :]
        Q2r = R2r * Wr[:, None, :] - R2i * Wi[:, None, :]
        Q2i = R2r * Wi[:, None, :] + R2i * Wr[:, None, :]
        D1r, D1i = Q1r @ Fr - Q1i @ Fi, Q1r @ Fi + Q1i @ Fr  # (B, nt, nf)
        D2r, D2i = Q2r @ Fr - Q2i @ Fi, Q2r @ Fi + Q2i @ Fr
        phb = (-2.0 * jnp.pi * Nmf / Fs) * fmax              # (B,)
        cb, sb = jnp.cos(phb), jnp.sin(phb)
        c2r = cb[:, None] * g2r[None, :] - sb[:, None] * g2i[None, :]
        c2i = cb[:, None] * g2i[None, :] + sb[:, None] * g2r[None, :]
        Dr = D1r + c2r[:, None, :] * D2r - c2i[:, None, :] * D2i
        Di = D1i + c2r[:, None, :] * D2i + c2i[:, None, :] * D2r
        D = (Dr * Dr + Di * Di).reshape(B, -1)
        amax = jnp.argmax(D, axis=1)
        dt = jnp.asarray(dts)[amax // nf]
        df = jnp.asarray(dfs)[amax % nf]
        return tmax + dt, fmax + df

    return refine
