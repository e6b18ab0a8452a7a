"""Pilot-based channel estimation and equalisation, batched.

The reference equalises with Python loops over modem frames and carriers
(reference: radae/radae.py:312-384, radae/dsp.py:401-484).  Here the same
estimators are expressed as gathers + batched matmuls over the whole
(batch, frame, carrier) grid at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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


def est_pilots_mean3(pilot_rows, P, idx):
    """3-pilot local mean across frequency (eq_mean6 estimator).

    pilot_rows: (..., Nc) received pilot symbols; P: (Nc,) known pilots;
    idx: window3_index(Nc).  Returns (..., Nc) channel estimates
    (reference: radae.py:321-328)."""
    ratio = pilot_rows / P
    return ratio[..., idx].mean(axis=-1)


def est_pilots_ls(pilot_rows, P, idx, Pmat, w, Fs=8000):
    """3-pilot least-squares fit across frequency.

    Returns (..., Nc) channel estimates h_c = g0 + g1*exp(-j*w_c*a)
    (reference: radae.py:331-344)."""
    a = LOCAL_PATH_DELAY_S * Fs    # w is in rad/sample
    ratio = pilot_rows / P
    h = ratio[..., idx]                                   # (..., Nc, 3)
    g = jnp.einsum("cij,...cj->...ci", jnp.asarray(Pmat), h)  # (..., Nc, 2)
    phase = jnp.exp(-1j * jnp.asarray(w) * a).astype(h.dtype)
    return g[..., 0] + g[..., 1] * phase


def interp_pilot_eq(rx_sym_pilots, rx_pilots, Ns, phase_mag_eq=False):
    """Linearly interpolate pilot channel estimates across each frame and
    equalise the data symbols.

    rx_sym_pilots: (B, nmf, Ns+1, Nc) with the pilot in row 0.
    rx_pilots: (B, nmf, Nc) pilot channel estimates per frame.
    Frames 0..nmf-2 interpolate toward the next frame's pilot; the final
    frame extrapolates with the previous slope (reference: radae.py:351-370).
    """
    B, nmf, _, Nc = rx_sym_pilots.shape
    if nmf > 1:
        slopes = (rx_pilots[:, 1:] - rx_pilots[:, :-1]) / (Ns + 1)   # (B, nmf-1, Nc)
        slopes = jnp.concatenate([slopes, slopes[:, -1:]], axis=1)   # last frame reuses
    else:
        slopes = jnp.zeros_like(rx_pilots)
    steps = jnp.arange(1, Ns + 1, dtype=jnp.float32)[None, None, :, None]
    rx_ch = rx_pilots[:, :, None, :] + slopes[:, :, None, :] * steps  # (B,nmf,Ns,Nc)
    data = rx_sym_pilots[:, :, 1:Ns + 1, :]
    if phase_mag_eq:
        data = data / rx_ch
    else:
        data = data * jnp.exp(-1j * jnp.angle(rx_ch)).astype(data.dtype)
    return rx_sym_pilots.at[:, :, 1:Ns + 1, :].set(data)


def coarse_mag_correction(rx_sym_pilots, rx_pilots, P0_abs, pilot_gain,
                          bottleneck):
    """Scale symbols by the RMS pilot magnitude (per batch element).

    The ML decoder is magnitude-sensitive unlike classical PSK, so a coarse
    AGC from the pilots is applied (reference: radae.py:376-382)."""
    mag = jnp.sqrt((jnp.abs(rx_pilots) ** 2).mean(axis=(1, 2)))      # (B,)
    if bottleneck == 3:
        mag = mag * P0_abs / pilot_gain
    return rx_sym_pilots / mag[:, None, None, None], mag


def pilot_eq(cfg, rx_sym_pilots, *, idx=None, Pmat=None):
    """Full pilot-based EQ pass over (B, nmf, Ns+1, Nc) symbols.

    Dispatches between the 3-pilot-mean and least-squares estimators and
    optionally applies coarse magnitude correction, mirroring
    RADAE.do_pilot_eq (reference: radae.py:312-384)."""
    Nc = cfg.Nc
    if idx is None:
        idx = window3_index(Nc)
    P = jnp.asarray(cfg.P)
    pilot_rows = rx_sym_pilots[:, :, 0, :]                            # (B,nmf,Nc)
    if cfg.per_carrier_eq:
        if cfg.eq_mean6:
            rx_pilots = est_pilots_mean3(pilot_rows, P, idx)
        else:
            if Pmat is None:
                Pmat = ls_pmat(cfg.w, cfg.Fs)
            rx_pilots = est_pilots_ls(pilot_rows, P, idx, Pmat, cfg.w, cfg.Fs)
    else:
        rx_pilots = (pilot_rows / P).mean(axis=-1, keepdims=True)
        rx_pilots = jnp.broadcast_to(rx_pilots, pilot_rows.shape)
    rx_sym_pilots = interp_pilot_eq(rx_sym_pilots, rx_pilots, cfg.Ns,
                                    cfg.phase_mag_eq)
    if cfg.coarse_mag:
        rx_sym_pilots, _ = coarse_mag_correction(
            rx_sym_pilots, rx_pilots, float(np.abs(cfg.P[0])),
            cfg.pilot_gain, cfg.bottleneck)
    return rx_sym_pilots
