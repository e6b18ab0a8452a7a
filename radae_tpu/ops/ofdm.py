"""OFDM modulation primitives as batched matmul-friendly JAX ops.

All complex quantities are split-complex `cplx.C` pairs (see ops/cplx.py):
the Nc<->M carrier transforms are explicit small non-power-of-2 DFT
matrices applied as pairs of real matmuls — the right shape for the MXU
(same insight as the reference's matrix DFT, radae/radae.py:170-179, but
batched over sequences x modem frames and real-valued for the hardware).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import cplx
from .cplx import C


def qpsk_map(z) -> C:
    """Interleaved real latents -> complex QPSK symbols.

    z: (..., L) real -> C of shape (..., L/2); even indices = I, odd = Q
    (reference: radae/radae.py:482).
    """
    return C(z[..., ::2], z[..., 1::2])


def qpsk_demap(sym: C, dtype=jnp.float32):
    """Complex symbols -> interleaved real latents (reference: radae.py:649-651)."""
    return jnp.stack([sym.re, sym.im], axis=-1).reshape(
        sym.re.shape[:-1] + (2 * sym.re.shape[-1],)).astype(dtype)


def magnitude_bottleneck(x: C) -> C:
    """tanh() saturation of complex magnitude, phase preserved.

    Used for bottleneck 2 (per-symbol) and bottleneck 3 (time-domain PA
    saturation model) (reference: radae.py:487,525-526).  Implemented as a
    radial rescale — no angle/exp needed."""
    r = jnp.sqrt(x.abs2() + 1e-12)
    return x * (jnp.tanh(r) / r)


def insert_pilots(tx_sym: C, P: np.ndarray, pilot_gain: float, Ns: int) -> C:
    """Insert one pilot row per modem frame: D...D -> PD...D.

    tx_sym: (B, T_Rs, Nc) with T_Rs divisible by Ns; P: (Nc,) complex numpy.
    Returns (B, T_Rs + T_Rs//Ns, Nc) (reference: radae.py:493-500).
    """
    B, T, Nc = tx_sym.shape
    nmf = T // Ns
    framed = tx_sym.reshape(B, nmf, Ns, Nc)
    Pg = pilot_gain * np.asarray(P)
    pr = jnp.broadcast_to(jnp.asarray(Pg.real.astype(np.float32)), (B, nmf, 1, Nc))
    pi = jnp.broadcast_to(jnp.asarray(Pg.imag.astype(np.float32)), (B, nmf, 1, Nc))
    out = cplx.concatenate([C(pr, pi), framed], axis=2)
    return out.reshape(B, nmf * (Ns + 1), Nc)


def strip_pilots(rx_sym: C, Ns: int) -> C:
    """Drop the pilot row of each PD...D modem frame.

    rx_sym: (B, T', Nc) with T' divisible by Ns+1 -> (B, nmf, Ns, Nc)."""
    B, T, Nc = rx_sym.shape
    nmf = T // (Ns + 1)
    return rx_sym.reshape(B, nmf, Ns + 1, Nc)[:, :, 1:, :]


def idft(tx_sym: C, Winv: np.ndarray) -> C:
    """Carriers -> time samples: (B, T, Nc) @ (Nc, M) -> (B, T, M)."""
    return cplx.matmul_const(tx_sym, Winv)


def dft(rx: C, Wfwd: np.ndarray) -> C:
    """Time samples -> carriers: (B, T, M) @ (M, Nc) -> (B, T, Nc)."""
    return cplx.matmul_const(rx, Wfwd)


def add_cp(tx: C, Ncp: int) -> C:
    """Prefix each symbol with its last Ncp samples: (B,T,M) -> (B,T,M+Ncp)."""
    if Ncp == 0:
        return tx
    return cplx.concatenate([tx[:, :, -Ncp:], tx], axis=-1)


def strip_cp(rx: C, M: int, Ncp: int, time_offset: int = 0) -> C:
    """(B, T, M+Ncp) -> (B, T, M) sampling at Ncp+time_offset."""
    st = Ncp + time_offset
    return rx[:, :, st:st + M]


def set_eoo_bits(cfg, eoo_bits):
    """Embed (Ns-1)*Nc QPSK symbols worth of +/-1 bits in the EOO frame.

    Returns a new (1, Nmf+M+Ncp) complex64 EOO frame (reference:
    radae/radae.py:441-455).  Host-side (numpy): EOO frames are built once.
    """
    Ns, Ncp, M, Nc, Nmf = cfg.Ns, cfg.Ncp, cfg.M, cfg.Nc, cfg.Nmf
    eoo_bits = np.asarray(eoo_bits, dtype=np.float32)
    eoo_syms = (eoo_bits[::2] + 1j * eoo_bits[1::2]).reshape(1, Ns - 1, Nc)
    eoo_tx = eoo_syms @ cfg.Winv
    assert Ncp, "EOO data requires a cyclic prefix"
    eoo_tx_cp = np.concatenate([eoo_tx[:, :, -Ncp:], eoo_tx], axis=-1)
    eoo_tx = eoo_tx_cp.reshape(1, (Ns - 1) * (M + Ncp)) * cfg.pilot_gain
    if cfg.bottleneck == 3:
        eoo_tx = np.tanh(np.abs(eoo_tx)) * np.exp(1j * np.angle(eoo_tx))
    eoo = cfg.eoo.copy()
    eoo[0, 2 * (M + Ncp):Nmf] = eoo_tx
    return eoo.astype(np.complex64)
