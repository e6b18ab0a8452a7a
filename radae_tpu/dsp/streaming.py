"""Single-modem-frame streaming transmitter and receiver.

These process one 120 ms modem frame at a time with fixed shapes, so the
whole per-frame pipeline jits into a single XLA computation (the hot path
of real-time operation).  Mirrors the reference's transmitter_one /
receiver_one (reference: radae/dsp.py:323-526) including the embedded SNR
estimator with a straight-line calibration refit on this pipeline and ~1 s IIR
smoothing (dsp.py:437-456).

Device boundaries use packed (..., 2) float arrays (ops/cplx.py) — complex
never crosses the host<->device transfer layer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import calibration
from ..ops import cplx, ofdm
from ..ops.cplx import C
from ..ops import pilots as pilots_ops


class TransmitterOne:
    """z latents for one modem frame -> Nmf rate-Fs samples."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._jit_tx = jax.jit(self._tx)

    def _tx(self, z):
        cfg = self.cfg
        n_rs = z.shape[1] * cfg.latent_dim // (cfg.bps * cfg.Nc)
        tx_sym = ofdm.qpsk_map(z)
        if cfg.bottleneck == 2:
            tx_sym = ofdm.magnitude_bottleneck(tx_sym)
        tx_sym = tx_sym.reshape(1, n_rs, cfg.Nc)
        tx_sym = ofdm.insert_pilots(tx_sym, cfg.P, cfg.pilot_gain, cfg.Ns)
        tx = ofdm.idft(tx_sym, cfg.Winv)
        tx = ofdm.add_cp(tx, cfg.Ncp)
        tx = tx.reshape(1, -1)
        if cfg.bottleneck == 3:
            tx = ofdm.magnitude_bottleneck(tx)
        return cplx.stack_last(tx)

    def transmit(self, z) -> np.ndarray:
        """z: (1, Nzmf, latent_dim) -> (Nmf,) complex64 numpy."""
        packed = np.asarray(self._jit_tx(jnp.asarray(z)))
        return cplx.unpack_np(packed).flatten()


class ReceiverOne:
    """One modem frame of rate-Fs samples -> z_hat latents.

    Expects P DDDD P framing: the pilot of this frame plus the pilot of the
    next frame, Ns+2 OFDM symbols in total."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._idx = pilots_ops.window3_index(cfg.Nc)
        self._pmat = pilots_ops.ls_pmat(cfg.w, cfg.Fs)
        self.snrdB_3k_est = 0.0
        # straight-line SNR correction refit on THIS pipeline over 0-12 dB
        # (tools/est_snr.py refit_pipeline, 3 seeds, max resid 0.52 dB;
        # analog of the reference's empirical fit, dsp.py:415-416).
        # Single source of truth shared with native/snr_cal.h:
        self.m = calibration.SNR_CAL_M
        self.c = calibration.SNR_CAL_C
        self._jit_rx = jax.jit(self._rx)
        self._jit_rx_eoo = jax.jit(self._rx_eoo)

    def _demod(self, rx: C) -> C:
        cfg = self.cfg
        n_rs = rx.shape[0] // (cfg.M + cfg.Ncp)
        rx = rx.reshape(1, n_rs, cfg.M + cfg.Ncp)
        rx_dash = ofdm.strip_cp(rx, cfg.M, cfg.Ncp, cfg.time_offset)
        return ofdm.dft(rx_dash, cfg.Wfwd)        # (1, Ns+2, Nc)

    def _est_pilots(self, rx_sym: C) -> C:
        """LS channel estimate from the two pilot rows (0 and Ns+1)."""
        cfg = self.cfg
        pilot_rows = rx_sym[:, (0, cfg.Ns + 1), :]      # (1, 2, Nc)
        return pilots_ops.est_pilots_ls(pilot_rows, cfg.P, self._idx,
                                        self._pmat, cfg.w, cfg.Fs)

    def _rx(self, rx_packed):
        """Returns (z_hat, snr_stats) for a normal PDDDDP frame."""
        cfg = self.cfg
        Ns = cfg.Ns
        rx = cplx.from_last(rx_packed)
        rx_sym = self._demod(rx)                         # (1, Ns+2, Nc)
        rx_pilots = self._est_pilots(rx_sym)             # (1, 2, Nc)

        # SNR estimator statistics from the first pilot row (dsp.py:437-446):
        # rotate received pilots by -phase(est) and compare I/Q powers
        Pcn_hat = rx_sym[0, 0, :]
        rot = rx_pilots[0, 0, :].unit().conj()
        Rcn_hat = Pcn_hat * rot
        S1 = jnp.sum(Pcn_hat.abs2())
        S2 = jnp.sum(Rcn_hat.im ** 2) + 1e-12

        # linear phase interpolation between the two pilots
        slope = (rx_pilots[:, 1, :] - rx_pilots[:, 0, :]) * (1.0 / (Ns + 1))
        steps = jnp.arange(1, Ns + 1, dtype=jnp.float32)[None, :, None]
        rx_ch = rx_pilots[:, None, 0, :] + slope[:, None, :] * steps
        data = rx_sym[:, 1:Ns + 1, :] * rx_ch.unit().conj()

        if cfg.coarse_mag:
            mag = jnp.sqrt(rx_pilots.abs2().mean()) + 1e-6
            if cfg.bottleneck == 3:
                mag = mag * float(np.abs(cfg.P[0])) / cfg.pilot_gain
            data = data * (1.0 / mag)

        z_hat = ofdm.qpsk_demap(data.reshape(1, -1, cfg.latent_dim // 2))
        return z_hat, jnp.stack([S1, S2])

    def _rx_eoo(self, rx_packed):
        """EOO frame P E D..D E: simple per-carrier mean-phase EQ, returns
        soft data symbols (reference: dsp.py:513-524)."""
        cfg = self.cfg
        Ns = cfg.Ns + 1
        rx = cplx.from_last(rx_packed)
        rx_sym = self._demod(rx)                         # (1, Ns+2, Nc)
        invP = (1.0 / cfg.P).astype(np.complex64)
        invPend = (1.0 / cfg.Pend).astype(np.complex64)
        s = (cplx.mul_const(rx_sym[0, 0, :], invP)
             + cplx.mul_const(rx_sym[0, 1, :], invPend)
             + cplx.mul_const(rx_sym[0, Ns, :], invPend))   # (Nc,)
        rot = s.unit().conj()
        eq = rx_sym[0] * C(rot.re[None, :], rot.im[None, :])
        data = eq[2:Ns, :].reshape(1, -1)
        return ofdm.qpsk_demap(data)

    def _update_snr(self, S1, S2):
        cfg = self.cfg
        snr_est = float(S1) / (2.0 * float(S2)) - 1.0
        if snr_est <= 0:
            snr_est = 0.1
        snrdB_est = 10 * math.log10(snr_est)
        snrdB_est = (snrdB_est - self.c) / self.m
        Rs = cfg.Fs / cfg.M
        snrdB_3k = (snrdB_est + 10 * math.log10(Rs * cfg.Nc / 3000)
                    + 10 * math.log10((cfg.M + cfg.Ncp) / cfg.M))
        self.snrdB_3k_est = 0.9 * self.snrdB_3k_est + 0.1 * snrdB_3k

    def receive(self, rx, endofover: bool = False) -> np.ndarray:
        """rx: (Nmf + M + Ncp,) complex64 -> z_hat (1, Nzmf, latent_dim)
        numpy, or EOO soft bits when endofover."""
        cfg = self.cfg
        packed = cplx.pack_np(np.asarray(rx, np.complex64))
        if endofover:
            return np.asarray(self._jit_rx_eoo(packed))
        z_hat, stats = self._jit_rx(packed)
        stats = np.asarray(stats)
        self._update_snr(stats[0], stats[1])
        z = np.asarray(z_hat)
        return z.reshape(1, cfg.Nzmf, cfg.latent_dim)
