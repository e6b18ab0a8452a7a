"""Channel simulation statistics: multipath power normalisation, AWGN sigma
calibration, Doppler spreading spectrum, file-format compatibility."""

import numpy as np
import jax
import jax.numpy as jnp

from radae_tpu.config import RADAEConfig, flagship_config
from radae_tpu.ops import cplx
from radae_tpu.channel.simulate import (
    multipath_two_path, complex_normal, rate_fs_channel, draw_EbNodB)
from radae_tpu.channel.doppler import (
    doppler_spread, multipath_samples, load_g_file, load_h_file)


def test_complex_normal_variance():
    x = complex_normal(jax.random.PRNGKey(0), (100000,))
    v = float(jnp.mean(x.abs2()))
    assert abs(v - 1.0) < 0.02


def test_multipath_power_normalised(rng):
    n = 16000
    tx = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    G = np.zeros((2, n, 2), np.complex64)
    G[:, :, 0] = 0.7
    G[:, :, 1] = 0.7
    rx = multipath_two_path(cplx.of(tx), cplx.of(G), 16)
    p_tx = float(np.mean(np.abs(tx) ** 2))
    p_rx = float(jnp.mean(rx.abs2()))
    assert abs(p_rx / p_tx - 1.0) < 0.05


def _awgn_G(n):
    G = np.zeros((1, n, 2), np.complex64)
    G[:, :, 0] = 1
    return cplx.of(G)


def test_awgn_sigma_rate_fs_bottleneck1():
    """sigma = (EbNo*M)^-0.5 for bottleneck 1/2 (radae.py:576)."""
    cfg = RADAEConfig(latent_dim=80, EbNodB=3.0, rate_Fs=True, bottleneck=1)
    n = 8000
    tx = cplx.of(np.ones((1, n), np.complex64))
    EbNodB = 3.0 * jnp.ones((1, 1, 1))
    rx, sigma, _ = rate_fs_channel(cfg, jax.random.PRNGKey(0), tx, _awgn_G(n), EbNodB)
    expect = (10 ** (3.0 / 10) * cfg.M) ** -0.5
    assert abs(float(sigma[0, 0]) - expect) < 1e-6


def test_awgn_sigma_rate_fs_bottleneck3():
    cfg = flagship_config(EbNodB=0.0)
    n = 8000
    tx = cplx.of(np.ones((1, n), np.complex64))
    EbNodB = jnp.zeros((1, 1, 1))
    rx, sigma, _ = rate_fs_channel(cfg, jax.random.PRNGKey(0), tx, _awgn_G(n), EbNodB)
    expect = np.sqrt(cfg.Fs / (1.0 * cfg.Rb))
    assert abs(float(sigma[0, 0]) - expect) < 1e-5


def test_range_EbNo_draw():
    cfg = RADAEConfig(latent_dim=80, range_EbNo=True, range_EbNo_start=-6.0)
    e = draw_EbNodB(cfg, jax.random.PRNGKey(0), 1000)
    e = np.asarray(e).flatten()
    assert e.min() >= -6.0 and e.max() <= 14.0
    assert e.std() > 4.0   # roughly uniform over 20 dB


def test_doppler_spread_spectrum(rng):
    Fs, spread = 8000, 2.0
    x = doppler_spread(spread, Fs, 4 * Fs, rng)
    assert x.shape == (4 * Fs,)
    X = np.abs(np.fft.fft(x)) ** 2
    f = np.fft.fftfreq(len(x), 1 / Fs)
    in_band = X[np.abs(f) < 3 * spread].sum()
    assert in_band / X.sum() > 0.95


def test_multipath_samples_files(tmp_path, rng):
    Fs, Rs, Nc = 8000, 50, 30
    h_fn = str(tmp_path / "h.f32")
    g_fn = str(tmp_path / "g.f32")
    H, G, hf_gain = multipath_samples("mpp", Fs, Rs, Nc, 2.0, h_fn, g_fn, rng)
    assert H.shape == (2 * Rs * int(Fs / (Fs / Rs)) // Rs * Rs // Rs, Nc) or H.shape[1] == Nc
    H2 = load_h_file(h_fn, Nc)
    np.testing.assert_allclose(H2, H, rtol=1e-6)
    G2 = load_g_file(g_fn)
    np.testing.assert_allclose(G2, hf_gain * G, rtol=1e-4)
    # power through channel ~ 1 after hf_gain normalisation
    p = np.var(hf_gain * G[:, 0]) + np.var(hf_gain * G[:, 1])
    assert abs(p - 1.0) < 0.05


def test_fading_depth_mpp(rng):
    """MPP channel |H| must actually fade (peaks and notches)."""
    H, _, _ = multipath_samples("mpp", 8000, 50, 30, 4.0, rng=rng)
    assert H.min() < 0.5
    assert H.max() > 1.2


def test_analog_fm_baseline():
    """Analog FM mod/demod: output SNR improves with C/N and shows the
    threshold effect (reference: fm.m analog_fm_test)."""
    from radae_tpu.channel.fm import AnalogFM
    fm = AnalogFM()
    hi = fm.snr_test(30.0)
    lo = fm.snr_test(5.0)
    assert hi > 20.0
    assert hi > lo + 8.0
