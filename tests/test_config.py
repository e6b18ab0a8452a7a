"""Modem derived-parameter math vs the reference's published table.

Expected values from the reference model banner (radae/radae.py:224) and
SURVEY table: with pilots+cp=0.004, latent 80: Rs'=50, Ts'=0.02, Ns=4,
Nc=30, M=160, Ncp=32, Nmf=960.
"""

import numpy as np
import pytest

from radae_tpu.config import RADAEConfig, flagship_config, barker_pilots


def test_flagship_modem_constants():
    cfg = flagship_config()
    assert cfg.latent_dim == 80
    assert abs(cfg.Rs - 100 / 3) < 1e-9
    assert abs(cfg.Rs_dash - 50.0) < 1e-9
    assert abs(cfg.Ts_dash - 0.02) < 1e-12
    assert cfg.Nsmf == 120
    assert cfg.Ns == 4
    assert cfg.Nc == 30
    assert cfg.M == 160
    assert cfg.Ncp == 32
    assert cfg.Nmf == 960
    assert cfg.Tmf == pytest.approx(0.12)
    assert cfg.Rb == pytest.approx(2000.0)
    assert cfg.Nseoo == (cfg.Ns - 1) * cfg.Nc


def test_latent40_constants():
    cfg = RADAEConfig(latent_dim=40, pilots=True, cyclic_prefix=0.004)
    assert cfg.Nc == 15
    assert cfg.Ns == 4


def test_no_pilots_constants():
    cfg = RADAEConfig(latent_dim=80, pilots=False)
    assert cfg.Ts == 0.02
    assert cfg.Ns == 6
    assert cfg.Nc == 20
    assert cfg.M == round(cfg.Fs / cfg.Rs_dash)


def test_dft_roundtrip():
    # integer-bin carriers: Winv then Wfwd must reconstruct symbols exactly
    cfg = flagship_config()
    sym = (np.random.default_rng(0).standard_normal((3, cfg.Nc))
           + 1j * np.random.default_rng(1).standard_normal((3, cfg.Nc))).astype(np.complex64)
    time = sym @ cfg.Winv
    back = time @ cfg.Wfwd
    np.testing.assert_allclose(back, sym, rtol=1e-4, atol=1e-4)


def test_carriers_centred_1500():
    cfg = flagship_config()
    centre = (cfg.w[0] + cfg.w[-1]) / 2 * cfg.Fs / (2 * np.pi)
    assert abs(centre - 1475.0) < 26  # integer-bin rounding keeps near 1500


def test_barker_pilots():
    P = barker_pilots(30)
    assert P[:13].tolist() == [1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1]
    assert np.all(np.abs(P) == 1)


def test_pilot_gain_bottleneck3():
    cfg = flagship_config()
    assert cfg.pilot_gain == pytest.approx(
        10 ** (-2 / 20) * cfg.M / np.sqrt(cfg.Nc))
    cfg1 = RADAEConfig(pilots=True, cyclic_prefix=0.004, bottleneck=1)
    assert cfg1.pilot_gain == 1.0


def test_eoo_structure():
    cfg = flagship_config()
    eoo = cfg.eoo
    assert eoo.shape == (1, cfg.Nmf + cfg.M + cfg.Ncp)
    # bottleneck 3 clamps magnitude below 1
    assert np.max(np.abs(eoo)) <= 1.0


def test_sequence_helpers():
    cfg = flagship_config()
    # 120 x 10ms frames = 1 modem frame group of 12 => 40 rate-Rs data symbols
    assert cfg.num_timesteps_at_rate_Rs(120) == 40
    assert cfg.num_10ms_times_steps_rounded_to_modem_frames(125) == 120
    n_fs = cfg.num_timesteps_at_rate_Fs(40)
    assert n_fs == int((cfg.Ns + 1) / cfg.Ns * 40 * (cfg.M + cfg.Ncp))
