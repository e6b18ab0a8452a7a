"""End-to-end forward-pass tests: shapes, calibration, BER vs theory.

Mirrors the reference's calibration/BER ctest category (CMakeLists.txt:
117-131): QPSK-substitution BER at the operating point vs closed-form
theory, and measured Eb/No consistency with the target (inference.py:187-229).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radae_tpu.config import RADAEConfig, flagship_config
from radae_tpu.models.radae import RADAE
from radae_tpu.models.core import distortion_loss


def make_model(cfg):
    model = RADAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def make_features(B, T, F, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, T, F)).astype(np.float32) * 0.3


def test_forward_rate_rs_shapes():
    cfg = RADAEConfig(feature_dim=20, latent_dim=80, EbNodB=10.0)
    model, params = make_model(cfg)
    B, T = 2, 120
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(1))
    assert out["features_hat"].shape == (B, T, 20)
    assert out["z_hat"].shape == (B, T // 4, 80)
    loss = distortion_loss(feats, out["features_hat"])
    assert np.all(np.isfinite(np.asarray(loss)))


def test_forward_flagship_rate_fs_shapes():
    cfg = flagship_config(EbNodB=10.0)
    model, params = make_model(cfg)
    B, T = 2, 120
    feats = make_features(B, T, 21)
    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    H = model.default_H(B, n_rs)
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(1))
    assert out["features_hat"].shape == (B, T, 21)
    n_fs = cfg.num_timesteps_at_rate_Fs(n_rs)
    assert out["tx"].shape == (B, n_fs)
    # PA bottleneck keeps |tx| < 1 => PAPR < ~1 dB headline property
    assert float(out["tx"].abs().max()) <= 1.0


def ber_cfg(**kw):
    """Configuration of the reference's calibration/BER tests: bottleneck 1,
    rate Fs, pilots + CP + LS pilot EQ (model05 waveform,
    test/inference_ber_awgn.sh:8-9)."""
    base = dict(feature_dim=20, latent_dim=80, rate_Fs=True, pilots=True,
                pilot_eq=True, eq_mean6=False, cyclic_prefix=0.004,
                bottleneck=1, ber_test=True)
    base.update(kw)
    return RADAEConfig(**base)


def test_measured_EbNo_matches_target_rate_fs():
    """Measured Eb/No from tx power and sigma must hit the target
    (reference printout math, inference.py:205-212).  ber_test mode gives
    unit-energy QPSK symbols so the measurement is exact for bottleneck 1."""
    cfg = ber_cfg(EbNodB=6.0)
    model, params = make_model(cfg)
    B, T = 1, 240
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    from radae_tpu.ops import cplx
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(3))
    tx = cplx.to_c64(out["tx"])
    S = (np.abs(tx) ** 2).mean()
    N = float(np.asarray(out["sigma"]).flatten()[0]) ** 2
    CNodB_meas = 10 * np.log10(S * cfg.Fs / N)
    EbNodB_meas = CNodB_meas + 10 * np.log10(cfg.M / (cfg.Fs * cfg.Nc * cfg.bps))
    assert abs(EbNodB_meas - 6.0) < 0.5


def test_ber_no_noise_is_zero():
    """No-noise BER must be exactly zero (ctest inference_ber,
    CMakeLists.txt:117-121)."""
    cfg = ber_cfg(EbNodB=100.0)
    model, params = make_model(cfg)
    B, T = 1, 240
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(4))
    assert int(out["n_errors"]) == 0


def test_ber_awgn_vs_theory_rate_rs():
    """QPSK BER at Eb/No = 0 dB vs 0.5*erfc(sqrt(EbNo)), 2 dB budget
    (reference: test/inference_ber_awgn.sh:5-13)."""
    cfg = RADAEConfig(feature_dim=20, latent_dim=80, EbNodB=0.0, ber_test=True)
    model, params = make_model(cfg)
    B, T = 2, 240
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(5))
    ber = float(out["n_errors"]) / out["n_bits"]
    theory = 0.5 * math.erfc(math.sqrt(10 ** (0.0 / 10)))
    budget = 0.5 * math.erfc(math.sqrt(10 ** (-2.0 / 10)))
    assert ber < budget, (ber, theory, budget)
    assert ber > theory * 0.5


def test_ber_awgn_vs_theory_rate_fs_pilots():
    """Rate-Fs path with pilots + CP + LS pilot EQ at Eb/No = 0 dB, ideal
    sync: BER within the 2 dB implementation-loss budget of QPSK theory
    (test/inference_ber_awgn.sh:5-13)."""
    cfg = ber_cfg(EbNodB=0.0)
    model, params = make_model(cfg)
    B, T = 2, 240
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(6))
    ber = float(out["n_errors"]) / out["n_bits"]
    budget = 0.5 * math.erfc(math.sqrt(10 ** (-2.0 / 10)))
    assert ber < budget, (ber, budget)


def test_forward_jits():
    cfg = flagship_config(EbNodB=10.0)
    model, params = make_model(cfg)
    B, T = 1, 120
    feats = make_features(B, T, 21)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))

    fwd = jax.jit(lambda p, f, h, k: model.forward(p, f, h, key=k)["features_hat"])
    out = fwd(params, feats, H, jax.random.PRNGKey(0))
    assert out.shape == (B, T, 21)


def test_bottleneck2():
    cfg = RADAEConfig(feature_dim=20, latent_dim=80, EbNodB=10.0, bottleneck=2)
    model, params = make_model(cfg)
    B, T = 1, 120
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(7))
    assert out["features_hat"].shape == (B, T, 20)


def test_latent40_forward():
    """latent_dim 40 (Nc=15) end-to-end (reference --latent-dim 40 models)."""
    cfg = RADAEConfig(feature_dim=20, latent_dim=40, EbNodB=10.0,
                      rate_Fs=True, pilots=True, pilot_eq=True,
                      eq_mean6=False, cyclic_prefix=0.004, bottleneck=3,
                      coarse_mag=True)
    assert cfg.Nc == 15
    model, params = make_model(cfg)
    B, T = 1, 120
    feats = make_features(B, T, 20)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, feats, H, key=jax.random.PRNGKey(1))
    assert out["features_hat"].shape == (B, T, 20)
    assert out["z_hat"].shape == (B, T // 4, 40)


def test_per_row_EbNodB_tensor():
    """forward(EbNodB=tensor) matches forward with the config constant
    exactly (same key), enabling the one-compile SNR grid in
    tools/evaluate.py (vs the reference's per-SNR inference.sh loop)."""
    B, T = 2, 120
    feats = make_features(B, T, 20)
    key = jax.random.PRNGKey(3)

    cfg = flagship_config(feature_dim=20)
    model, params = make_model(cfg)
    H = model.default_H(B, cfg.num_timesteps_at_rate_Rs(T))
    n_fs = cfg.num_timesteps_at_rate_Fs(cfg.num_timesteps_at_rate_Rs(T))
    G = model.default_G(B, n_fs)

    out_t = model.forward(params, feats, H, G, key=key,
                          EbNodB=np.array([3.0, 3.0], np.float32))

    cfg3 = flagship_config(feature_dim=20, EbNodB=3.0)
    model3 = RADAE(cfg3)
    out_c = model3.forward(params, feats, H, G, key=key)

    np.testing.assert_allclose(np.asarray(out_t["features_hat"]),
                               np.asarray(out_c["features_hat"]),
                               rtol=0, atol=1e-6)

    # and per-row values really differ in noise level: row at 20 dB must
    # beat row at -3 dB on distortion
    out_m = model.forward(params, feats, H, G, key=key,
                          EbNodB=np.array([-3.0, 20.0], np.float32))
    sig = np.asarray(out_m["sigma"]).reshape(B)
    assert sig[0] > 5 * sig[1]


def test_ber_mpp_vs_rayleigh_theory():
    """QPSK-substitution BER through the rate-Fs MPP channel at Eb/No = 0 dB
    vs closed-form Rayleigh theory 0.5*(1-sqrt(EbNo/(EbNo+1))), 2 dB
    implementation-loss budget (reference: test/inference_ber_mpp.sh:7-15)."""
    from radae_tpu.channel.doppler import multipath_samples
    from radae_tpu.ops import cplx

    cfg = ber_cfg(EbNodB=0.0, freq_offset=1.0, correct_freq_offset=True)
    model, params = make_model(cfg)
    B, T = 4, 720                            # 4 x 7.2 s for fading statistics
    feats = make_features(B, T, 20)
    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    n_fs = cfg.num_timesteps_at_rate_Fs(n_rs)
    H = model.default_H(B, n_rs)

    rng = np.random.default_rng(42)
    G = np.zeros((B, n_fs, 2), np.complex64)
    for b in range(B):
        _, Gs, hf_gain = multipath_samples(
            "mpp", cfg.Fs, cfg.Rs_dash, cfg.Nc, n_fs / cfg.Fs + 1, rng=rng)
        G[b] = hf_gain * Gs[:n_fs]

    out = model.forward(params, feats, H, cplx.pack_np(G),
                        key=jax.random.PRNGKey(9))
    ber = float(out["n_errors"]) / out["n_bits"]
    EbNo_budget = 10 ** (-2.0 / 10)          # theory at EbNo - 2 dB
    target = 0.5 * (1 - math.sqrt(EbNo_budget / (EbNo_budget + 1)))
    theory = 0.5 * (1 - math.sqrt(1.0 / 2.0))
    assert ber < target, (ber, theory, target)
    assert ber > 0.5 * theory, (ber, theory)
