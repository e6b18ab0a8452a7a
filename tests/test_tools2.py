"""Second CLI tool batch: BBFM, SC modem pipes, stateful checks, est_snr,
ml_pilots."""

import io
import os
import sys

import numpy as np
import pytest

from radae_tpu.data.io import NB_TOTAL_FEATURES
from tests.test_tools import make_feature_file


def test_bbfm_inference_and_rx(tmp_path, capsys):
    from radae_tpu.tools.bbfm import bbfm_inference, bbfm_rx
    fin = str(tmp_path / "f.f32")
    fhat = str(tmp_path / "fh.f32")
    zf = str(tmp_path / "z.f32")
    make_feature_file(fin, nframes=96)
    bbfm_inference(["random", fin, fhat, "--CNRdB", "20",
                    "--write_latent", zf])
    out = np.fromfile(fhat, np.float32).reshape(-1, NB_TOTAL_FEATURES)
    assert out.shape[0] == 96
    assert "loss:" in capsys.readouterr().out

    fhat2 = str(tmp_path / "fh2.f32")
    bbfm_rx(["random", zf, fhat2])
    out2 = np.fromfile(fhat2, np.float32).reshape(-1, NB_TOTAL_FEATURES)
    assert out2.shape[0] == 96
    # same params (seed 0) and z: decoder outputs close (the inference
    # decoder ran with quantization dither, the rx decoder without, so
    # allow the accumulated +-1/254-per-layer dither)
    np.testing.assert_allclose(out2[:, :20], out[:, :20], atol=0.03)


def test_train_bbfm_one_epoch(tmp_path):
    from radae_tpu.tools.bbfm import train_bbfm
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin, nframes=48 * 8)
    out = str(tmp_path / "runb")
    train_bbfm([fin, out, "--epochs", "1", "--batch-size", "4",
                "--sequence-length", "48", "--CNRdB", "10"])
    assert os.path.exists(os.path.join(out, "checkpoints",
                                       "checkpoint_epoch_1.npz"))


def test_sc_tx_rx_pipe(tmp_path, capsys, monkeypatch):
    """z frames through the single-carrier modem pipe, BER test mode
    (ctest category 11)."""
    from radae_tpu.tools.sc_modem import sc_tx, sc_rx

    nframes = 20
    z = np.zeros(80 * nframes, np.float32)   # ber_test ignores payload

    tx_out = io.BytesIO()
    monkeypatch.setattr(sys, "stdin",
                        type("S", (), {"buffer": io.BytesIO(z.tobytes())})())
    monkeypatch.setattr(sys, "stdout", type("S", (), {"buffer": tx_out})())
    sc_tx(["--ber_test"])

    rx_out = io.BytesIO()
    monkeypatch.setattr(sys, "stdin",
                        type("S", (), {"buffer": io.BytesIO(tx_out.getvalue())})())
    monkeypatch.setattr(sys, "stdout", type("S", (), {"buffer": rx_out})())
    sc_rx(["--ber_test", "--target_ber", "0.0", "-v", "0"])
    err = capsys.readouterr().err
    assert "PASS" in err


def test_stateful_encoder_tool(tmp_path, capsys):
    from radae_tpu.tools.stateful import stateful_encoder
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin, nframes=120)
    rc = stateful_encoder(["random", fin])
    assert rc == 0
    assert "PASS" in capsys.readouterr().out


def test_stateful_decoder_tool(tmp_path, capsys):
    from radae_tpu.tools.stateful import stateful_decoder
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin, nframes=120)
    rc = stateful_decoder(["random", fin])
    assert rc == 0
    assert "PASS" in capsys.readouterr().out


def test_est_snr_calibration():
    """The estimator should track target SNR monotonically with a roughly
    linear relationship over the operating range (reference est_snr.py
    calibration)."""
    from radae_tpu.tools.est_snr import run_sweep
    t, e = run_sweep(np.arange(0, 16, 5.0), nframes=20)
    assert np.all(np.diff(e) > 0)
    m, c = np.polyfit(t, e, 1)
    assert 0.6 < m < 1.3, (m, c)


def test_ml_pilots_short():
    from radae_tpu.tools.ml_pilots import train_pilots
    params, papr = train_pilots(EsNodB=10, epochs=5, batches=3)
    assert np.isfinite(papr)
    assert np.all(np.isfinite(params["Pr"]))
