"""Pilot-based channel estimation and equalisation, batched, split-complex.

The reference equalises with Python loops over modem frames and carriers
(reference: radae/radae.py:312-384, radae/dsp.py:401-484).  Here the same
estimators are expressed as gathers + batched matmuls over the whole
(batch, frame, carrier) grid at once, on (re, im) float planes (see
ops/cplx.py).  Phase-only EQ multiplies by conj(h)/|h| instead of
exp(-j*angle(h)) — identical math, no transcendental angle/exp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import C

LOCAL_PATH_DELAY_S = 0.0025   # assumed path delay for the LS fit (radae.py:338)


def window3_index(Nc: int) -> np.ndarray:
    """(Nc, 3) gather indices: carriers c-1..c+1 with edges clamped inward.

    Edge carriers reuse the windows of their inward neighbours (the
    reference's "wingman pilot" edge handling, radae.py:333-337)."""
    mid = np.clip(np.arange(Nc), 1, Nc - 2)
    return np.stack([mid - 1, mid, mid + 1], axis=1)


def ls_pmat(w: np.ndarray, Fs: int) -> np.ndarray:
    """Per-carrier 3-pilot least-squares projection matrices, (Nc, 2, 3).

    Solves for a 2-ray channel model h(w) = g0 + g1*exp(-j*w*a) from three
    adjacent pilots (reference: radae.py:331-344, dsp.py:400-412)."""
    Nc = len(w)
    a = LOCAL_PATH_DELAY_S * Fs
    mid = np.clip(np.arange(Nc), 1, Nc - 2)
    Pmat = np.zeros((Nc, 2, 3), dtype=np.complex64)
    for c in range(Nc):
        m = mid[c]
        A = np.array([[1, np.exp(-1j * w[m - 1] * a)],
                      [1, np.exp(-1j * w[m] * a)],
                      [1, np.exp(-1j * w[m + 1] * a)]])
        Pmat[c] = np.linalg.inv(A.conj().T @ A) @ A.conj().T
    return Pmat


def _gather(x: C, idx) -> C:
    return C(x.re[..., idx], x.im[..., idx])


def _ratio_to_P(pilot_rows: C, P: np.ndarray) -> C:
    """received pilot / known pilot, via a host-precomputed 1/P."""
    invP = (1.0 / np.asarray(P)).astype(np.complex64)
    return cplx.mul_const(pilot_rows, invP)


def est_pilots_mean3(pilot_rows: C, P, idx) -> C:
    """3-pilot local mean across frequency (eq_mean6 estimator).

    pilot_rows: (..., Nc) received pilot symbols; P: (Nc,) known pilots;
    idx: window3_index(Nc).  Returns (..., Nc) channel estimates
    (reference: radae.py:321-328)."""
    ratio = _ratio_to_P(pilot_rows, P)
    win = _gather(ratio, idx)
    return C(win.re.mean(axis=-1), win.im.mean(axis=-1))


def est_pilots_ls(pilot_rows: C, P, idx, Pmat, w, Fs=8000) -> C:
    """3-pilot least-squares fit across frequency.

    Returns (..., Nc) channel estimates h_c = g0 + g1*exp(-j*w_c*a)
    (reference: radae.py:331-344)."""
    a = LOCAL_PATH_DELAY_S * Fs    # w is in rad/sample
    ratio = _ratio_to_P(pilot_rows, P)
    h = _gather(ratio, idx)                                   # (..., Nc, 3)
    Pr = jnp.asarray(Pmat.real.astype(np.float32))
    Pi = jnp.asarray(Pmat.imag.astype(np.float32))
    g = C(jnp.einsum("cij,...cj->...ci", Pr, h.re)
          - jnp.einsum("cij,...cj->...ci", Pi, h.im),
          jnp.einsum("cij,...cj->...ci", Pr, h.im)
          + jnp.einsum("cij,...cj->...ci", Pi, h.re))         # (..., Nc, 2)
    phase = np.exp(-1j * np.asarray(w) * a).astype(np.complex64)
    return g[..., 0] + cplx.mul_const(g[..., 1], phase)


def interp_pilot_eq(rx_sym_pilots: C, rx_pilots: C, Ns: int,
                    phase_mag_eq: bool = False) -> C:
    """Linearly interpolate pilot channel estimates across each frame and
    equalise the data symbols.

    rx_sym_pilots: (B, nmf, Ns+1, Nc) with the pilot in row 0.
    rx_pilots: (B, nmf, Nc) pilot channel estimates per frame.
    Frames 0..nmf-2 interpolate toward the next frame's pilot; the final
    frame extrapolates with the previous slope (reference: radae.py:351-370).
    """
    B, nmf, _, Nc = rx_sym_pilots.shape
    if nmf > 1:
        slopes = (rx_pilots[:, 1:] - rx_pilots[:, :-1]) * (1.0 / (Ns + 1))
        slopes = cplx.concatenate([slopes, slopes[:, -1:]], axis=1)
    else:
        slopes = rx_pilots * 0.0
    steps = jnp.arange(1, Ns + 1, dtype=jnp.float32)[None, None, :, None]
    rx_ch = rx_pilots[:, :, None, :] + slopes[:, :, None, :] * steps
    data = rx_sym_pilots[:, :, 1:Ns + 1, :]
    if phase_mag_eq:
        data = data / rx_ch
    else:
        data = data * rx_ch.unit().conj()
    return cplx.concatenate([rx_sym_pilots[:, :, :1, :], data], axis=2)


def coarse_mag_correction(rx_sym_pilots: C, rx_pilots: C, P0_abs, pilot_gain,
                          bottleneck):
    """Scale symbols by the RMS pilot magnitude (per batch element).

    The ML decoder is magnitude-sensitive unlike classical PSK, so a coarse
    AGC from the pilots is applied (reference: radae.py:376-382)."""
    mag = jnp.sqrt(rx_pilots.abs2().mean(axis=(1, 2)))        # (B,)
    if bottleneck == 3:
        mag = mag * P0_abs / pilot_gain
    inv = (1.0 / mag)[:, None, None, None]
    return rx_sym_pilots * inv, mag


def pilot_eq(cfg, rx_sym_pilots: C, *, idx=None, Pmat=None) -> C:
    """Full pilot-based EQ pass over (B, nmf, Ns+1, Nc) symbols.

    Dispatches between the 3-pilot-mean and least-squares estimators and
    optionally applies coarse magnitude correction, mirroring
    RADAE.do_pilot_eq (reference: radae.py:312-384)."""
    Nc = cfg.Nc
    if idx is None:
        idx = window3_index(Nc)
    pilot_rows = rx_sym_pilots[:, :, 0, :]                    # (B,nmf,Nc)
    if cfg.per_carrier_eq:
        if cfg.eq_mean6:
            rx_pilots = est_pilots_mean3(pilot_rows, cfg.P, idx)
        else:
            if Pmat is None:
                Pmat = ls_pmat(cfg.w, cfg.Fs)
            rx_pilots = est_pilots_ls(pilot_rows, cfg.P, idx, Pmat, cfg.w, cfg.Fs)
    else:
        ratio = _ratio_to_P(pilot_rows, cfg.P)
        m = C(ratio.re.mean(axis=-1, keepdims=True),
              ratio.im.mean(axis=-1, keepdims=True))
        rx_pilots = C(jnp.broadcast_to(m.re, pilot_rows.shape),
                      jnp.broadcast_to(m.im, pilot_rows.shape))
    rx_sym_pilots = interp_pilot_eq(rx_sym_pilots, rx_pilots, cfg.Ns,
                                    cfg.phase_mag_eq)
    if cfg.coarse_mag:
        rx_sym_pilots, _ = coarse_mag_correction(
            rx_sym_pilots, rx_pilots, float(np.abs(cfg.P[0])),
            cfg.pilot_gain, cfg.bottleneck)
    return rx_sym_pilots
