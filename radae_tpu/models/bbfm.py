"""Baseband-FM variant: same core autoencoder, analog-FM channel model.

The channel is an FM-demod SNR piecewise model built from relus so it stays
differentiable, parameterised by carrier-to-noise ratio CNRdB and Carson's
rule FM gain (reference: radae/bbfm.py:157-197).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BBFMConfig
from .core import CoreEncoder, CoreDecoder


class BBFM:
    def __init__(self, cfg: BBFMConfig):
        self.cfg = cfg
        self.core_encoder = CoreEncoder(cfg.feature_dim, cfg.latent_dim,
                                        bottleneck=1)
        self.core_decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)

    def init(self, key):
        from .layers import as_rng
        rng = as_rng(key)
        return {"encoder": self.core_encoder.init(rng),
                "decoder": self.core_decoder.init(rng)}

    def _noise_key(self, key):
        return key if (key is not None and self.cfg.quant_noise) else None

    def channel(self, key, z, H, CNRdB=None):
        """Apply the FM-demod noise model to latents.

        z: (B, Tz, latent_dim) in [-1, 1]; H: (B, T_Rs, 1) fade magnitudes,
        one per symbol.  Returns (z_hat, sigma, CNRdB_vec)
        (reference: bbfm.py:170-190)."""
        cfg = self.cfg
        B = z.shape[0]
        n_rs = z.shape[1] * cfg.latent_dim
        z_flat = z.reshape(B, n_rs, 1)
        if CNRdB is None:
            CNRdB = cfg.CNRdB
        CNRdB_vec = 20.0 * jnp.log10(H) + CNRdB
        # piecewise FM demod SNR: above threshold (12 dB) SNR = CNR + Gfm;
        # below, a steeper 1+Gfm/3 dB/dB slope models threshold collapse
        SNRdB = jax.nn.relu(CNRdB_vec - 12.0) + 12.0 + cfg.Gfm
        SNRdB = SNRdB - jax.nn.relu(-(CNRdB_vec - 12.0)) * (1.0 + cfg.Gfm / 3.0)
        SNR = 10.0 ** (SNRdB / 10.0)
        sigma = 1.0 / jnp.sqrt(SNR)
        n = sigma * jax.random.normal(key, z_flat.shape, z_flat.dtype)
        z_hat = jnp.clip(z_flat + n, -1.0, 1.0)
        return z_hat.reshape(z.shape), sigma, CNRdB_vec

    def forward(self, params, features, H, key=None):
        """features: (B, T10ms, F); H: (B, T_Rs, 1) with T_Rs = Rb * seconds
        (reference: bbfm.py:157-197)."""
        cfg = self.cfg
        B, T, _ = features.shape
        n_rs = cfg.num_timesteps_at_rate_Rs(T)
        assert H.shape == (B, n_rs, 1)

        if key is None:
            key = jax.random.PRNGKey(0)
        k_enc, k_chan, k_dec = jax.random.split(key, 3)

        z, _ = self.core_encoder(params["encoder"], features,
                                 key=self._noise_key(k_enc))
        z_hat, sigma, CNRdB = self.channel(k_chan, z, H)
        features_hat, _ = self.core_decoder(params["decoder"], z_hat,
                                            key=self._noise_key(k_dec))
        return {"features_hat": features_hat, "z": z, "z_hat": z_hat,
                "sigma": sigma, "CNRdB": CNRdB}

    def receiver(self, params, z_hat, key=None):
        """Stand-alone receiver: symbols -> features (reference: bbfm.py:135-145)."""
        features_hat, _ = self.core_decoder(params["decoder"], z_hat,
                                            key=self._noise_key(key))
        return features_hat
