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


def test_train_cli_scan_steps(tmp_path):
    """--scan-steps groups minibatches into one dispatch; the epoch must
    still produce a checkpoint with the full step count applied."""
    fin = str(tmp_path / "f.f32")
    make_feature_file(fin, nframes=48 * 16)
    out = str(tmp_path / "run_scan")
    run_tool("train", [fin, out, "--epochs", "1", "--batch-size", "4",
                       "--sequence-length", "48", "--EbNodB", "10",
                       "--scan-steps", "2"])
    ckpt = os.path.join(out, "checkpoints", "checkpoint_epoch_1.npz")
    assert os.path.exists(ckpt)
    from radae_tpu.convert import load_checkpoint
    params, meta = load_checkpoint(ckpt)
    assert np.isfinite(meta["loss"])


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


def test_chirp_CNo():
    """AWGN closed form: estimator within 1 dB (reference gate ±1 dB,
    test/chirp_mpp.sh:44-56) and chirp start within 0.5 s."""
    from radae_tpu.tools.chirp import gen_chirp, est_CNo
    chirp = gen_chirp(T=2.0, amp=0.5)
    C = 0.25                                    # amp^2
    for CNo_dB, seed in ((35.0, 0), (45.0, 1), (60.0, 2)):
        rng = np.random.default_rng(seed)
        sigma2 = C / 10 ** (CNo_dB / 10) * 8000  # No * Fs
        noisy = np.concatenate([
            np.zeros(8000, np.complex64), chirp, np.zeros(8000, np.complex64)])
        noisy = noisy + np.sqrt(sigma2 / 2) * (
            rng.standard_normal(len(noisy))
            + 1j * rng.standard_normal(len(noisy)))
        CNo, t = est_CNo(noisy.astype(np.complex64), chirp_secs=2.0)
        assert abs(CNo - CNo_dB) < 1.0, (CNo_dB, CNo)
        assert abs(t - 1.0) < 0.5, t            # chirp starts at 1 s


def test_chirp_CNo_mpp_vs_independent_ch():
    """Cross-validate the spectral C/No estimator against the independent
    time-domain `ch` channel tool through MPP fading — the reference's
    chirp_mpp.sh contract (±1 dB, start time ±0.5 s; ch's C reads low by
    the silence duty cycle, corrected exactly as chirp_mpp.sh:52-55)."""
    from radae_tpu.tools.chirp import gen_chirp, est_CNo
    from radae_tpu.tools.ch import apply_ch
    chirp_secs, silence_secs = 4.0, 2.0
    chirp = gen_chirp(T=chirp_secs, amp=0.5)
    pad = np.zeros(int(8000 * silence_secs), np.complex64)
    tx = np.concatenate([pad, chirp, pad])
    No_dB = 10 * np.log10(0.25) - 40.0          # ~40 dBHz before fading
    errs = []
    for seed in range(3):
        rng = np.random.default_rng(seed)
        rx, CNo_ch = apply_ch(tx, No_dB, fading="mpp", rng=rng)
        # ch averages C over the whole file incl. silence
        CNo_ch += 10 * np.log10((2 * silence_secs + chirp_secs) / chirp_secs)
        CNo_est, t = est_CNo(rx, chirp_secs=chirp_secs)
        errs.append(CNo_est - CNo_ch)
        assert abs(t - silence_secs) < 0.5, t
    assert np.max(np.abs(errs)) < 1.0, errs


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
