"""End-to-end quality with a genuinely trained checkpoint.

fixtures/model_rs_ep150.npz was trained in-framework on the TPU (150
epochs, rate-Rs, Eb/No 10 dB) over ~116 s of speech features extracted by
the built-in vocoder from the reference's public wav fixtures; final
training loss 0.133 — inside the reference's trained-model band of
0.112-0.15 (reference README.md:412-419)."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
CKPT = os.path.join(FIX, "model_rs_ep150.npz")
FEATS = os.path.join(FIX, "speech_feats.f32")


@pytest.fixture(scope="module")
def trained():
    if not (os.path.exists(CKPT) and os.path.exists(FEATS)):
        pytest.skip("trained fixture not present")
    from radae_tpu.config import RADAEConfig
    from radae_tpu.models.radae import RADAE
    from radae_tpu.convert import load_checkpoint
    cfg = RADAEConfig(feature_dim=20, latent_dim=80, EbNodB=10.0)
    model = RADAE(cfg)
    params, meta = load_checkpoint(CKPT)
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)[:, :20]
    return model, params, feats


def test_trained_loss_at_operating_point(trained):
    import jax
    from radae_tpu.models.core import distortion_loss
    model, params, feats = trained
    cfg = model.cfg
    T = cfg.num_10ms_times_steps_rounded_to_modem_frames(2400)
    f = feats[None, :T, :]
    H = model.default_H(1, cfg.num_timesteps_at_rate_Rs(T))
    out = model.forward(params, f, H, key=jax.numpy.asarray(
        np.array([0, 0], np.uint32)))
    loss = float(np.asarray(distortion_loss(f, out["features_hat"]))[0])
    assert loss < 0.25, loss           # trained operating point

    # SNR sensitivity: 0 dB must be clearly worse than 10 dB
    from radae_tpu.config import RADAEConfig
    from radae_tpu.models.radae import RADAE
    m0 = RADAE(RADAEConfig(feature_dim=20, latent_dim=80, EbNodB=0.0))
    out0 = m0.forward(params, f, H, key=jax.numpy.asarray(
        np.array([0, 0], np.uint32)))
    loss0 = float(np.asarray(distortion_loss(f, out0["features_hat"]))[0])
    assert loss0 > loss + 0.05, (loss, loss0)


def test_trained_z_magnitude(trained):
    """After training |z| ~ 1 (the assumption behind the Eb calibration,
    reference radae.py:480-481)."""
    import jax
    model, params, feats = trained
    T = 1200
    z, _ = model.core_encoder(params["encoder"], feats[None, :T, :], key=None)
    rms = float(np.sqrt((np.asarray(z) ** 2).mean()))
    assert 0.5 < rms <= 1.0, rms


def test_trained_latent40_operating_point():
    """The latent-40 model family (reference model18: half the symbol
    rate, Nc=15) trained in-framework at the product config."""
    L40 = os.path.join(FIX, "model_l40.npz")
    if not os.path.exists(L40):
        pytest.skip("latent-40 fixture not present")
    import jax
    from radae_tpu.config import RADAEConfig
    from radae_tpu.models.radae import RADAE
    from radae_tpu.convert import load_checkpoint
    from radae_tpu.models.core import distortion_loss
    from radae_tpu.ops import cplx

    cfg = RADAEConfig(feature_dim=21, latent_dim=40, EbNodB=13.0,
                      rate_Fs=True, pilots=True, pilot_eq=True,
                      eq_mean6=False, cyclic_prefix=0.004, coarse_mag=True,
                      time_offset=-16, bottleneck=3)
    assert cfg.Nc == 15
    model = RADAE(cfg)
    params, meta = load_checkpoint(L40)
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)
    T = cfg.num_10ms_times_steps_rounded_to_modem_frames(2400)
    f = np.concatenate([feats[:T, :20], -np.ones((T, 1), np.float32)],
                       axis=1)[None]
    H = model.default_H(1, cfg.num_timesteps_at_rate_Rs(T))
    n_fs = cfg.num_timesteps_at_rate_Fs(cfg.num_timesteps_at_rate_Rs(T))
    G = model.default_G(1, n_fs)
    out = model.forward(params, f, H, G,
                        key=jax.numpy.asarray(np.array([0, 0], np.uint32)))
    loss = float(np.asarray(distortion_loss(
        f[..., :20], out["features_hat"][..., :20]))[0])
    train_loss = float(meta.get("loss", 0.5))
    # half the bits/s of the latent-80 waveform: quality tracks its own
    # training loss, with product-path implementation slack
    assert loss < train_loss + 0.15, (loss, train_loss)
    ber = float(np.mean(
        f[..., 20] * np.asarray(out["features_hat"])[..., 20] < 0))
    assert ber < 0.05, ber
