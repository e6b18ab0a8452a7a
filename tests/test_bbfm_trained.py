"""BBFM end-to-end with the trained checkpoint: through the single-carrier
modem, decoded loss must be close to the clean-z loss (reference BBFM.md:
79-84 gate: 0.033 clean vs 0.035 through modem)."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
CKPT = os.path.join(FIX, "model_bbfm.npz")
FEATS = os.path.join(FIX, "speech_feats.f32")


@pytest.fixture(scope="module")
def bbfm():
    if not (os.path.exists(CKPT) and os.path.exists(FEATS)):
        pytest.skip("bbfm fixture not present")
    from radae_tpu.config import BBFMConfig
    from radae_tpu.models.bbfm import BBFM
    from radae_tpu.convert import load_checkpoint
    cfg = BBFMConfig(feature_dim=20, latent_dim=80, CNRdB=10.0)
    model = BBFM(cfg)
    params, meta = load_checkpoint(CKPT)
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)[:, :20]
    return cfg, model, params, feats


def test_bbfm_operating_point(bbfm):
    import jax
    from radae_tpu.models.core import distortion_loss
    cfg, model, params, feats = bbfm
    T = 2400
    f = feats[None, :T, :]
    H = np.ones((1, cfg.num_timesteps_at_rate_Rs(T), 1), np.float32)
    out = model.forward(params, f, H, key=jax.numpy.asarray(
        np.zeros(2, np.uint32)))
    loss = float(np.asarray(distortion_loss(f, out["features_hat"]))[0])
    assert loss < 0.2, loss


def test_bbfm_through_sc_modem(bbfm):
    """z through the single-carrier PSK modem (clean channel): loss delta
    vs direct decode must be small (BBFM.md:79-84)."""
    import jax
    from radae_tpu.models.core import distortion_loss
    from radae_tpu.dsp.single_carrier import SingleCarrier
    cfg, model, params, feats = bbfm
    T = 960
    f = feats[None, :T, :]
    z, _ = model.core_encoder(params["encoder"], f, key=None)
    z = np.asarray(z).reshape(-1, 80)        # one 80-sym frame per z-step

    # direct decode
    fh_direct = np.asarray(model.receiver(
        params, z.reshape(1, -1, 80).astype(np.float32)))
    loss_direct = float(np.asarray(distortion_loss(
        f[:, :fh_direct.shape[1]], fh_direct))[0])

    # through the SC modem
    tx_modem = SingleCarrier(fcentreHz=1500)
    rx_modem = SingleCarrier(fcentreHz=1500)
    samples = np.concatenate(
        [tx_modem.tx(z[i].astype(np.complex64)) for i in range(len(z))]
        + [tx_modem.tx(np.zeros(80, np.complex64))])
    recovered = []
    n = 0
    nin = rx_modem.nin
    while len(samples[n:]) >= nin:
        syms = rx_modem.rx(samples[n:n + nin])
        if rx_modem.state == "sync":
            recovered.append((rx_modem.g * syms.real).astype(np.float32))
        n += nin
        nin = rx_modem.nin
    z_rx = np.stack(recovered)
    # first synced frame aligns to some tx frame; find offset by correlation
    best_off, best = 0, -1
    for off in range(min(4, len(z) - 1)):
        c = np.corrcoef(z_rx[0], z[off])[0, 1]
        if c > best:
            best, best_off = c, off
    nz = min(len(z_rx), len(z) - best_off)
    z_aligned = z_rx[:nz]
    fh_modem = np.asarray(model.receiver(
        params, z_aligned.reshape(1, -1, 80).astype(np.float32)))
    ref = f[:, best_off * 4:best_off * 4 + fh_modem.shape[1]]
    loss_modem = float(np.asarray(distortion_loss(ref, fh_modem))[0])
    assert best > 0.98, best
    assert abs(loss_modem - loss_direct) < 0.02, (loss_direct, loss_modem)
