"""Simulated HF channel, functional, PRNG-key driven, split-complex.

Implements the reference's in-model channel simulation (reference:
radae/radae.py:505-634) as pure functions over (re, im) float planes: two-
path Watterson multipath with Doppler-spread gains G1/G2, phase/freq/df_dt
offsets, per-sequence random phase/freq and gain draws (training), and AWGN
with the per-bottleneck sigma calibration formulas copied exactly.

Every random draw comes from an explicit jax PRNG key so that sequences stay
independent per batch shard under pjit — the statistical contract the
reference gets from torch's global RNG (radae.py:470-473,556-564).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from ..ops.cplx import C


def draw_EbNodB(cfg, key, num_batches: int):
    """Per-sequence Eb/No draw: fixed, or uniform over a 20 dB range
    (reference: radae.py:470-473)."""
    if cfg.range_EbNo:
        return cfg.range_EbNo_start + 20.0 * jax.random.uniform(
            key, (num_batches, 1, 1), jnp.float32)
    return cfg.EbNodB * jnp.ones((num_batches, 1, 1), jnp.float32)


def complex_normal(key, shape) -> C:
    """Unit-total-variance circular complex Gaussian (matches the variance
    convention of torch.randn_like on complex tensors)."""
    kr, ki = jax.random.split(key)
    s = 1.0 / np.sqrt(2.0)
    return C(s * jax.random.normal(kr, shape, jnp.float32),
             s * jax.random.normal(ki, shape, jnp.float32))


def multipath_two_path(tx: C, G: C, d_samples: int) -> C:
    """Two-path Watterson model: rx = tx*G1 + delay(tx, d)*G2, power
    normalised so measured SNR stays calibrated (reference: radae.py:529-539).

    tx: (B, N); G: (B, N, 2) Doppler gains (split-complex)."""
    d = d_samples
    G1, G2 = G[:, :, 0], G[:, :, 1]
    tail = tx[:, :-d] * G2[:, :-d]
    delayed = cplx.concatenate(
        [cplx.zeros(tx.re[:, :d].shape), tail], axis=1)
    tx_mp = tx * G1 + delayed
    mp_gain = jnp.sqrt(tx.abs2().mean() / tx_mp.abs2().mean())
    return tx_mp * mp_gain


def _sigma_rate_fs(cfg, EbNo):
    """AWGN sigma at rate Fs (reference: radae.py:570-577)."""
    if cfg.bottleneck == 3:
        # rms power var(tx) ~ 1 after the PA saturation model
        S = 1.0
        return jnp.sqrt(S * cfg.Fs / (EbNo * cfg.Rb))
    return (EbNo * cfg.M) ** -0.5


def _sigma_rate_rs(cfg, EbNodB):
    """AWGN sigma at rate Rs (reference: radae.py:627-632)."""
    if cfg.bottleneck == 3:
        EbNo = 10.0 ** (EbNodB / 10.0)
        sigma = cfg.M / jnp.sqrt(2.0 * cfg.Nc * EbNo)
        return sigma / jnp.sqrt(2.0)
    return 10.0 ** (-EbNodB / 20.0)


def rate_fs_channel(cfg, key, tx: C, G: C, EbNodB) -> Tuple[C, jnp.ndarray, C]:
    """Rate-Fs (time domain) channel simulation.

    Args:
      tx: (B, N) split-complex transmit samples (after PA bottleneck).
      G: (B, N, 2) split-complex Doppler-spread path gains.
      EbNodB: (B, 1, 1) per-sequence Eb/No.
    Returns (rx, sigma, final_phase): received samples, noise sigma (B,1),
      final phase rotation of any freq offset (for EOO phase continuity,
      reference: radae.py:553, inference.py:267-272).
    """
    B, N = tx.shape
    keys = jax.random.split(key, 5)

    tx = multipath_two_path(tx, G, cfg.d_samples)
    final_phase = C(jnp.ones((B,)), jnp.zeros((B,)))

    # deterministic user-supplied impairments (inference time)
    if cfg.phase_offset:
        tx = tx * cplx.expj(jnp.float32(cfg.phase_offset))
    lin_phase = None
    if cfg.freq_offset:
        freq = (cfg.freq_offset
                + cfg.df_dt * jnp.arange(N, dtype=jnp.float32) / cfg.Fs)
        omega = freq * 2.0 * jnp.pi / cfg.Fs
        lin_phase = cplx.expj(jnp.cumsum(omega))
        tx = tx * C(lin_phase.re[None, :], lin_phase.im[None, :])
        final_phase = C(jnp.broadcast_to(lin_phase.re[-1], (B,)),
                        jnp.broadcast_to(lin_phase.im[-1], (B,)))

    # per-sequence random phase + freq offset (training)
    if cfg.freq_rand:
        phase = 2.0 * jnp.pi * jax.random.uniform(keys[0], (B, 1))
        freq_offset = 40.0 * (jax.random.uniform(keys[1], (B, 1)) - 0.5)
        omega = freq_offset * 2.0 * jnp.pi / cfg.Fs
        lin = omega * jnp.arange(N, dtype=jnp.float32)[None, :]
        tx = tx * cplx.expj(phase + lin)

    EbNodB = EbNodB.reshape(B, 1)
    EbNo = 10.0 ** (EbNodB / 10.0)
    sigma = _sigma_rate_fs(cfg, EbNo)                                # (B,1)
    rx = tx + complex_normal(keys[2], tx.shape) * sigma

    # per-sequence random gain -20..+20 dB, SNR unchanged (training)
    if cfg.gain_rand:
        gain_dB = -20.0 + 40.0 * jax.random.uniform(keys[3], (B, 1))
        rx = rx * (10.0 ** (gain_dB / 20.0))

    rx = rx * cfg.gain
    if cfg.freq_offset and cfg.correct_freq_offset:
        rx = rx * C(lin_phase.re[None, :], -lin_phase.im[None, :])
    return rx, sigma, final_phase


def rate_rs_channel(cfg, key, tx_sym: C, H, EbNodB):
    """Rate-Rs (one sample per symbol) channel: per-carrier magnitude fade
    H plus AWGN (reference: radae.py:616-634).

    tx_sym: (B, T_Rs, Nc) split-complex; H: (B, T_Rs, Nc) real fades.
    Returns (rx_sym, sigma, faded tx_sym)."""
    if cfg.phase_offset:
        tx_sym = tx_sym * cplx.expj(jnp.float32(cfg.phase_offset))
    tx_sym = tx_sym * H
    sigma = _sigma_rate_rs(cfg, EbNodB)
    rx_sym = tx_sym + complex_normal(key, tx_sym.shape) * sigma
    # faded tx_sym also returned so callers can measure post-channel power
    return rx_sym, sigma, tx_sym
