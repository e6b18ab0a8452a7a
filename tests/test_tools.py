"""End-to-end CLI tool pipelines: inference -> rx -> loss, training CLI,
converters, chirp/C-No estimation (reference ctest categories 1, 5, 6)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from radae_tpu.data.io import NB_TOTAL_FEATURES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_feature_file(path, nframes=240, seed=0):
    rng = np.random.default_rng(seed)
    f = np.zeros((nframes, NB_TOTAL_FEATURES), np.float32)
    f[:, :20] = rng.standard_normal((nframes, 20)) * 0.3
    f.tofile(path)
    return f


def run_tool(mod, argv):
    import importlib
    m = importlib.import_module(f"radae_tpu.tools.{mod}")
    return m.main(argv)


def test_inference_roundtrip(tmp_path, capsys):
    fin = str(tmp_path / "f.f32")
    fout = str(tmp_path / "fhat.f32")
    make_feature_file(fin)
    run_tool("inference", ["random", fin, fout, "--EbNodB", "10",
                           "--pilots", "--pilot_eq", "--eq_ls",
                           "--cp", "0.004", "--rate_Fs", "--bottleneck", "3",
                           "--coarse_mag"])
    out = np.fromfile(fout, np.float32).reshape(-1, NB_TOTAL_FEATURES)
    assert out.shape[0] == 240
    cap = capsys.readouterr().out
    assert "loss:" in cap and "Measured:" in cap


def test_inference_ber_printout(tmp_path, capsys):
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin)
    run_tool("inference", ["random", fin, "/dev/null", "--EbNodB", "100",
                           "--pilots", "--pilot_eq", "--eq_ls", "--cp", "0.004",
                           "--rate_Fs", "--ber_test"])
    cap = capsys.readouterr().out
    assert "BER: 0.000" in cap     # ctest inference_ber gate


def test_inference_rx_loss_pipeline(tmp_path, capsys):
    """File tx -> rx file with noise pre/append -> standalone rx acquisition
    -> loss alignment (the reference's streaming robustness shape)."""
    fin = str(tmp_path / "f.f32")
    rxf = str(tmp_path / "rx.f32")
    fhat = str(tmp_path / "fhat.f32")
    make_feature_file(fin, nframes=480)
    run_tool("inference", ["random", fin, "/dev/null", "--EbNodB", "30",
                           "--pilots", "--pilot_eq", "--eq_ls", "--cp", "0.004",
                           "--rate_Fs", "--bottleneck", "3", "--coarse_mag",
                           "--time_offset", "-16",
                           "--freq_offset", "2", "--write_rx", rxf,
                           "--prepend_noise", "0.5", "--append_noise", "0.3",
                           "--end_of_over"])
    run_tool("rx", ["random", rxf, fhat, "--bottleneck", "3"])
    rc = run_tool("loss", [fin, fhat, "--clip_end", "100", "--acq_time_test", "1.5"])
    cap = capsys.readouterr().out
    assert "PASS" in cap
    assert rc == 0


def test_rx_does_not_acquire_on_noise(tmp_path):
    rng = np.random.default_rng(0)
    rxf = str(tmp_path / "noise.f32")
    n = 8000 * 4
    ((rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
     ).astype(np.complex64).tofile(rxf)
    with pytest.raises(SystemExit):
        run_tool("rx", ["random", rxf, "/dev/null", "--bottleneck", "3"])


def test_train_cli_one_epoch(tmp_path, capsys):
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin, nframes=48 * 16)
    out = str(tmp_path / "run1")
    run_tool("train", [fin, out, "--epochs", "1", "--batch-size", "4",
                       "--sequence-length", "48", "--EbNodB", "10"])
    ckpt = os.path.join(out, "checkpoints", "checkpoint_epoch_1.npz")
    assert os.path.exists(ckpt)
    from radae_tpu.convert import load_checkpoint
    params, meta = load_checkpoint(ckpt)
    assert meta["epoch"] == 1
    assert "encoder" in params and "decoder" in params


def test_train_resume(tmp_path):
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin, nframes=48 * 8)
    out = str(tmp_path / "run2")
    run_tool("train", [fin, out, "--epochs", "1", "--batch-size", "4",
                       "--sequence-length", "48"])
    ckpt = os.path.join(out, "checkpoints", "checkpoint_epoch_1.npz")
    run_tool("train", [fin, out, "--epochs", "2", "--batch-size", "4",
                       "--sequence-length", "48",
                       "--initial-checkpoint", ckpt])
    assert os.path.exists(os.path.join(out, "checkpoints",
                                       "checkpoint_epoch_2.npz"))


def test_chirp_CNo(tmp_path):
    from radae_tpu.tools.chirp import gen_chirp, est_CNo
    rng = np.random.default_rng(0)
    chirp = gen_chirp(T=2.0, amp=0.5)
    sigma = 0.01
    noisy = np.concatenate([
        sigma * (rng.standard_normal(8000) + 1j * rng.standard_normal(8000)),
        chirp + sigma * (rng.standard_normal(len(chirp))
                         + 1j * rng.standard_normal(len(chirp)))])
    CNo, t = est_CNo(noisy.astype(np.complex64))
    # rough calibration: C = 0.25 (amp^2), No = 2*sigma^2/Fs
    expect = 10 * np.log10(0.25 / (2 * sigma ** 2 / 8000))
    assert abs(CNo - expect) < 3.0, (CNo, expect)
    assert t >= 0.5     # chirp starts at 1 s


def test_eoo_ber_tool(tmp_path, capsys):
    from radae_tpu.tools.chirp import eoo_ber_main
    rng = np.random.default_rng(0)
    bits = np.sign(rng.random(180) - 0.5).astype(np.float32)
    txf, rxf = str(tmp_path / "tx.f32"), str(tmp_path / "rx.f32")
    bits.tofile(txf)
    noisy = bits + 0.3 * rng.standard_normal(180).astype(np.float32)
    noisy.astype(np.float32).tofile(rxf)
    rc = eoo_ber_main([txf, rxf])
    assert rc == 0
    assert "PASS" in capsys.readouterr().out
