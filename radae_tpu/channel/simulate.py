"""Simulated HF channel, functional and PRNG-key driven.

Implements the reference's in-model channel simulation (reference:
radae/radae.py:505-634) as pure functions: two-path Watterson multipath with
Doppler-spread gains G1/G2, phase/freq/df_dt offsets, per-sequence random
phase/freq and gain draws (training), and AWGN with the per-bottleneck sigma
calibration formulas copied exactly.

Every random draw comes from an explicit jax PRNG key so that sequences stay
independent per batch shard under pjit — the statistical contract the
reference gets from torch's global RNG (radae.py:470-473,556-564).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def draw_EbNodB(cfg, key, num_batches: int):
    """Per-sequence Eb/No draw: fixed, or uniform over a 20 dB range
    (reference: radae.py:470-473)."""
    if cfg.range_EbNo:
        return cfg.range_EbNo_start + 20.0 * jax.random.uniform(
            key, (num_batches, 1, 1), jnp.float32)
    return cfg.EbNodB * jnp.ones((num_batches, 1, 1), jnp.float32)


def complex_normal(key, shape, dtype=jnp.complex64):
    """Unit-total-variance circular complex Gaussian (matches the variance
    convention of torch.randn_like on complex tensors)."""
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, shape, jnp.float32)
    im = jax.random.normal(ki, shape, jnp.float32)
    return ((re + 1j * im) / jnp.sqrt(2.0)).astype(dtype)


def multipath_two_path(tx, G, d_samples: int):
    """Two-path Watterson model: rx = tx*G1 + delay(tx, d)*G2, power
    normalised so measured SNR stays calibrated (reference: radae.py:529-539).

    tx: (B, N) complex; G: (B, N, 2) complex Doppler gains."""
    d = d_samples
    delayed = jnp.concatenate(
        [jnp.zeros_like(tx[:, :d]), tx[:, :-d] * G[:, :-d, 1]], axis=1)
    tx_mp = tx * G[:, :, 0] + delayed
    tx_power = (jnp.abs(tx) ** 2).mean()
    tx_mp_power = (jnp.abs(tx_mp) ** 2).mean()
    mp_gain = jnp.sqrt(tx_power / tx_mp_power)
    return mp_gain * tx_mp


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


def rate_fs_channel(cfg, key, tx, G, EbNodB) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rate-Fs (time domain) channel simulation.

    Args:
      tx: (B, N) complex64 transmit samples (after PA bottleneck).
      G: (B, N, 2) complex Doppler-spread path gains.
      EbNodB: (B, 1, 1) per-sequence Eb/No.
    Returns (rx, sigma, final_phase): received samples, noise sigma (B,1),
      final phase rotation of any freq offset (for EOO phase continuity,
      reference: radae.py:553, inference.py:267-272).
    """
    B, N = tx.shape
    keys = jax.random.split(key, 5)

    tx = multipath_two_path(tx, G, cfg.d_samples)
    final_phase = jnp.ones((B,), jnp.complex64)

    # deterministic user-supplied impairments (inference time)
    if cfg.phase_offset:
        tx = tx * jnp.exp(1j * jnp.float32(cfg.phase_offset))
    if cfg.freq_offset:
        freq = (cfg.freq_offset
                + cfg.df_dt * jnp.arange(N, dtype=jnp.float32) / cfg.Fs)
        omega = freq * 2.0 * jnp.pi / cfg.Fs
        lin_phase = jnp.exp(1j * jnp.cumsum(omega))
        tx = tx * lin_phase[None, :]
        final_phase = jnp.broadcast_to(lin_phase[-1], (B,))

    # per-sequence random phase + freq offset (training)
    if cfg.freq_rand:
        phase = 2.0 * jnp.pi * jax.random.uniform(keys[0], (B, 1))
        freq_offset = 40.0 * (jax.random.uniform(keys[1], (B, 1)) - 0.5)
        omega = freq_offset * 2.0 * jnp.pi / cfg.Fs
        lin_phase = omega * jnp.arange(N, dtype=jnp.float32)[None, :]
        tx = tx * jnp.exp(1j * (phase + lin_phase))

    EbNodB = EbNodB.reshape(B, 1)
    EbNo = 10.0 ** (EbNodB / 10.0)
    sigma = _sigma_rate_fs(cfg, EbNo)                                # (B,1)
    rx = tx + sigma * complex_normal(keys[2], tx.shape)

    # per-sequence random gain -20..+20 dB, SNR unchanged (training)
    if cfg.gain_rand:
        gain_dB = -20.0 + 40.0 * jax.random.uniform(keys[3], (B, 1))
        rx = rx * 10.0 ** (gain_dB / 20.0)

    rx = rx * cfg.gain
    if cfg.freq_offset and cfg.correct_freq_offset:
        rx = rx * jnp.conj(lin_phase)[None, :]
    return rx, sigma, final_phase


def rate_rs_channel(cfg, key, tx_sym, H, EbNodB):
    """Rate-Rs (one sample per symbol) channel: per-carrier magnitude fade
    H plus AWGN (reference: radae.py:616-634).

    tx_sym: (B, T_Rs, Nc) complex; H: (B, T_Rs, Nc) real fades.
    Returns (rx_sym, sigma)."""
    if cfg.phase_offset:
        tx_sym = tx_sym * jnp.exp(1j * jnp.float32(cfg.phase_offset))
    tx_sym = tx_sym * H
    sigma = _sigma_rate_rs(cfg, EbNodB)
    rx_sym = tx_sym + sigma * complex_normal(key, tx_sym.shape)
    # faded tx_sym also returned so callers can measure post-channel power
    return rx_sym, sigma, tx_sym
