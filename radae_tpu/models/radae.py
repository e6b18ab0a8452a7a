"""The RADAE model: encoder -> OFDM tx -> simulated channel -> rx -> decoder.

Functional equivalent of the reference RADAE module's forward pass
(reference: radae/radae.py:457-669) plus the vanilla batch receiver
(radae.py:387-428) and the pilot-correlation SNR estimator (radae.py:433-439),
re-expressed as pure jittable functions over (params, inputs, PRNG key).
All configuration is static (closed over from RADAEConfig) so XLA sees fixed
shapes and control flow; all complex math runs split-complex (ops/cplx.py)
so it lowers to plain float VPU/MXU ops.

Complex-valued outputs in the forward dict (tx_sym, tx, rx, final_phase)
are cplx.C pairs; convert with cplx.to_c64 on host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RADAEConfig
from ..ops import cplx, ofdm, pilots as pilots_ops
from ..ops.cplx import C
from ..channel.simulate import (
    draw_EbNodB, rate_fs_channel, rate_rs_channel)
from .core import CoreEncoder, CoreDecoder


def _as_C(x, packed_ndim=None) -> Optional[C]:
    """Accept a C, a host complex numpy array, a packed (..., 2) float
    array, or a traced complex array."""
    if x is None:
        return None
    if isinstance(x, C):
        return x
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return cplx.of(x)
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return C(x.real, x.imag)
    # packed float: trailing interleave axis
    assert x.shape[-1] == 2, "packed complex arrays must end in (re, im)"
    return cplx.from_last(x)


class RADAE:
    def __init__(self, cfg: RADAEConfig):
        self.cfg = cfg
        self.core_encoder = CoreEncoder(cfg.feature_dim, cfg.latent_dim,
                                        bottleneck=cfg.bottleneck)
        self.core_decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
        # host-side EQ constants
        self._eq_idx = pilots_ops.window3_index(cfg.Nc)
        self._eq_pmat = pilots_ops.ls_pmat(cfg.w, cfg.Fs)

    # -- parameters --------------------------------------------------------
    def init(self, key) -> Dict:
        from .layers import as_rng
        rng = as_rng(key)
        return {"encoder": self.core_encoder.init(rng),
                "decoder": self.core_decoder.init(rng)}

    # -- helpers (host-side numpy) -----------------------------------------
    def default_G(self, num_batches: int, n_fs: int):
        """Benign (AWGN) Doppler gains G1=1, G2=0, packed (B, N, 2, 2) f32."""
        G = np.zeros((num_batches, n_fs, 2, 2), np.float32)
        G[:, :, 0, 0] = 1.0
        return G

    def default_H(self, num_batches: int, n_rs: int):
        return np.ones((num_batches, n_rs, self.cfg.Nc), np.float32)

    def _noise_key(self, key):
        return key if (key is not None and self.cfg.quant_noise) else None

    # -- transmitter side --------------------------------------------------
    def transmitter(self, z, num_timesteps_at_rate_Rs: int) -> C:
        """Latents -> rate-Fs time-domain samples (pilots + CP + PA model).

        z: (B, Tz, latent_dim) -> tx C(B, N).  Mirrors the tx half of the
        reference forward() (radae.py:480-527)."""
        cfg = self.cfg
        B = z.shape[0]
        tx_sym = ofdm.qpsk_map(z)
        if cfg.bottleneck == 2:
            tx_sym = ofdm.magnitude_bottleneck(tx_sym)
        tx_sym = tx_sym.reshape(B, num_timesteps_at_rate_Rs, cfg.Nc)
        n_rs = num_timesteps_at_rate_Rs
        if cfg.pilots:
            tx_sym = ofdm.insert_pilots(tx_sym, cfg.P, cfg.pilot_gain, cfg.Ns)
            n_rs = tx_sym.shape[1]
        tx = ofdm.idft(tx_sym, cfg.Winv)
        tx = ofdm.add_cp(tx, cfg.Ncp)
        tx = tx.reshape(B, n_rs * (cfg.M + cfg.Ncp))
        if cfg.bottleneck == 3:
            tx = ofdm.magnitude_bottleneck(tx)
        return tx

    # -- full autoencoder + channel forward --------------------------------
    def forward(self, params, features, H, G=None, key=None, EbNodB=None):
        """Run encoder -> channel -> decoder.

        Args:
          features: (B, T10ms, feature_dim)
          H: (B, T_Rs, Nc) rate-Rs fade magnitudes (data symbols only)
          G: rate-Fs Doppler gains — C, complex numpy (B,N,2), or packed
             float (B,N,2,2) (required when rate_Fs; default_G otherwise)
          key: PRNG key driving channel noise, Eb/No draws and quantization
               noise; None = fixed seed.
          EbNodB: optional per-row Eb/No tensor, shape (B,) or (B,1,1).
               Overrides the config draw, so one compiled forward serves a
               whole SNR grid (the reference recompiles its model per SNR
               via inference.sh loops; see tools/evaluate.py).
        Returns dict with features_hat, z, z_hat, tx_sym, tx, rx, sigma,
        EbNodB, final_phase (reference: radae.py:457-669).
        """
        cfg = self.cfg
        B, T, _ = features.shape
        n_rs_data = cfg.num_timesteps_at_rate_Rs(T)
        if H is None:
            # benign channel built in-graph: costs nothing, saves the
            # host->device transfer of an all-ones batch every step
            H = jnp.ones((B, n_rs_data, cfg.Nc), jnp.float32)
        assert H.shape == (B, n_rs_data, cfg.Nc), (H.shape, (B, n_rs_data, cfg.Nc))

        if key is None:
            key = jax.random.PRNGKey(0)
        k_ebno, k_enc, k_ber, k_chan, k_dec = jax.random.split(key, 5)
        if EbNodB is None:
            EbNodB = draw_EbNodB(cfg, k_ebno, B)
        else:
            EbNodB = jnp.asarray(EbNodB, jnp.float32).reshape(B, 1, 1)

        z, _ = self.core_encoder(params["encoder"], features,
                                 key=self._noise_key(k_enc))
        if cfg.ber_test:
            z = jnp.sign(jax.random.uniform(k_ber, z.shape) - 0.5)

        qpsk_shape = (B, z.shape[1], cfg.latent_dim // 2)
        tx_sym = ofdm.qpsk_map(z)
        if cfg.bottleneck == 2:
            tx_sym = ofdm.magnitude_bottleneck(tx_sym)
        tx_sym = tx_sym.reshape(B, n_rs_data, cfg.Nc)

        n_rs = n_rs_data
        num_modem_frames = n_rs_data // cfg.Ns
        if cfg.pilots:
            tx_sym = ofdm.insert_pilots(tx_sym, cfg.P, cfg.pilot_gain, cfg.Ns)
            n_rs = tx_sym.shape[1]

        tx_before_channel = None
        rx = None
        final_phase = C(jnp.ones((B,)), jnp.zeros((B,)))
        if cfg.rate_Fs:
            # --- simulate at M samples per symbol (radae.py:505-602) ------
            tx = ofdm.idft(tx_sym, cfg.Winv)
            tx = ofdm.add_cp(tx, cfg.Ncp)
            n_fs = n_rs * (cfg.M + cfg.Ncp)
            tx = tx.reshape(B, n_fs)
            if cfg.bottleneck == 3:
                tx = ofdm.magnitude_bottleneck(tx)
            tx_before_channel = tx

            Gc = _as_C(G)
            if Gc is None:
                # benign AWGN gains G1=1, G2=0 built in-graph
                Gc = C(jnp.concatenate(
                    [jnp.ones((B, n_fs, 1)), jnp.zeros((B, n_fs, 1))], -1),
                    jnp.zeros((B, n_fs, 2)))
            rx, sigma, final_phase = rate_fs_channel(cfg, k_chan, tx, Gc, EbNodB)

            rx_dash = rx.reshape(B, n_rs, cfg.M + cfg.Ncp)
            rx_dash = ofdm.strip_cp(rx_dash, cfg.M, cfg.Ncp, cfg.time_offset)
            rx_sym = ofdm.dft(rx_dash, cfg.Wfwd)
        else:
            # --- simulate at one sample per symbol (radae.py:603-634) -----
            if cfg.bottleneck == 3:
                # hybrid time/freq: need time domain to apply the PA model
                tx = ofdm.idft(tx_sym, cfg.Winv)
                tx = ofdm.magnitude_bottleneck(tx)
                tx_before_channel = tx
                tx_sym = ofdm.dft(tx, cfg.Wfwd)
            H_all = jnp.asarray(H)
            if cfg.pilots:
                # NB: the reference crashes on pilots+rate_Rs (H is sized
                # for data symbols only); we make the combination work by
                # replicating each frame's first fade row onto its pilot
                H_framed = H_all.reshape(B, num_modem_frames, cfg.Ns, cfg.Nc)
                H_all = jnp.concatenate([H_framed[:, :, :1, :], H_framed],
                                        axis=2).reshape(B, n_rs, cfg.Nc)
            rx_sym, sigma, tx_sym = rate_rs_channel(cfg, k_chan, tx_sym,
                                                    H_all, EbNodB)

        # --- strip pilots / EQ (radae.py:636-644) --------------------------
        if cfg.pilots:
            rx_sym_pilots = rx_sym.reshape(B, num_modem_frames, cfg.Ns + 1, cfg.Nc)
            if cfg.pilot_eq:
                rx_sym_pilots = pilots_ops.pilot_eq(
                    cfg, rx_sym_pilots, idx=self._eq_idx, Pmat=self._eq_pmat)
            rx_sym = rx_sym_pilots[:, :, 1:cfg.Ns + 1, :]

        rx_sym = rx_sym.reshape(*qpsk_shape)
        z_hat = ofdm.qpsk_demap(rx_sym)

        out = {}
        if cfg.ber_test:
            err = -z * z_hat > 0
            out["n_bits"] = z.size
            out["n_errors"] = jnp.sum(err)
            # per-sequence errors for batched BER grids (evaluate --ber)
            out["ber_row"] = (jnp.sum(err, axis=tuple(range(1, z.ndim)))
                              / (z.size // z.shape[0]))

        features_hat, _ = self.core_decoder(params["decoder"], z_hat,
                                            key=self._noise_key(k_dec))
        out.update({
            "features_hat": features_hat,
            "z": z,
            "z_hat": z_hat,
            "tx_sym": tx_sym,
            "tx": tx_before_channel,
            "rx": rx,
            "sigma": sigma,
            "EbNodB": EbNodB,
            "final_phase": final_phase,
        })
        return out

    # -- vanilla batch receiver (radae.py:387-428) --------------------------
    def receiver(self, params, rx, key=None):
        """Decode a rate-Fs sample stream (1-D complex or C) to features.

        Assumes coarse sync already done (time/freq aligned): integer number
        of modem frames starting with a pilot."""
        cfg = self.cfg
        rx = _as_C(rx)
        Ns = cfg.Ns + 1 if cfg.pilots else cfg.Ns
        n_rs = rx.shape[0] // (cfg.M + cfg.Ncp)
        nmf = n_rs // Ns
        n_rs = Ns * nmf
        rx = rx[: n_rs * (cfg.M + cfg.Ncp)].reshape(1, n_rs, cfg.M + cfg.Ncp)
        rx_dash = ofdm.strip_cp(rx, cfg.M, cfg.Ncp, cfg.time_offset)
        rx_sym = ofdm.dft(rx_dash, cfg.Wfwd)
        if cfg.pilots:
            rx_sym_pilots = rx_sym.reshape(1, nmf, cfg.Ns + 1, cfg.Nc)
            if cfg.pilot_eq:
                rx_sym_pilots = pilots_ops.pilot_eq(
                    cfg, rx_sym_pilots, idx=self._eq_idx, Pmat=self._eq_pmat)
            rx_sym = rx_sym_pilots[:, :, 1:cfg.Ns + 1, :]
        rx_sym = rx_sym.reshape(1, -1, cfg.latent_dim // 2)
        z_hat = ofdm.qpsk_demap(rx_sym)
        features_hat, _ = self.core_decoder(params["decoder"], z_hat,
                                            key=self._noise_key(key))
        return features_hat, z_hat

    # -- SNR estimation from a received pilot (radae.py:433-439) ------------
    def est_snr(self, r, time_offset=0):
        """Host-side numpy: r is a (M,) complex vector of received pilot
        samples."""
        cfg = self.cfg
        st = cfg.Ncp + time_offset
        p = np.asarray(cfg.p_cp[st:st + cfg.M])
        r = np.asarray(r)
        Ct = np.abs(np.vdot(r, p)) ** 2 / np.vdot(r, r)
        SNR_est = Ct / (np.vdot(p, p) - Ct)
        return float(SNR_est.real)
