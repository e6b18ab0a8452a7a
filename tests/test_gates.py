"""Headline waveform-spec gates from the reference's published numbers
(reference README.md:433-452 and ctest categories 5/6): PAPR < 1 dB,
RF bandwidth ~1500 Hz, acquisition at 0 dB SNR within 1.5 s, never on
noise, 200 ppm clock-offset tolerance via nin timing slips."""

import numpy as np
import pytest

from radae_tpu.config import flagship_config
from radae_tpu.models.radae import RADAE
from radae_tpu.apps.txe import RadaeTx
from radae_tpu.apps.rxe import RadaeRx
from radae_tpu.dsp.acquisition import Acquisition
from radae_tpu.dsp.rrc import sample_clock_offset
from radae_tpu.ops import cplx


@pytest.fixture(scope="module")
def tx_stream():
    """~6 s of flagship-waveform modem samples from random-weight tx."""
    cfg = flagship_config(feature_dim=20)
    model = RADAE(cfg)
    params = model.init(0)
    tx = RadaeTx(params=params, auxdata=False)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(50):
        f36 = np.zeros((12, 36), np.float32)
        f36[:, :20] = rng.standard_normal((12, 20)) * 0.3
        frames.append(tx.do_radae_tx(f36.flatten()))
    return cfg, model, params, np.concatenate(frames)


def test_papr_spec(tx_stream):
    """Tx PAPR < 1 dB for the bottleneck-3 waveform (README.md:434).
    A trained bottleneck-3 model drives |z| >> 1 so the time-domain signal
    saturates the tanh PA; emulate with large +-g latents."""
    cfg, model, params, _ = tx_stream
    rng = np.random.default_rng(0)
    n_rs = cfg.num_timesteps_at_rate_Rs(480)
    z = 100.0 * np.sign(rng.standard_normal((1, 120, 80))).astype(np.float32)
    tx = cplx.to_c64(model.transmitter(z, n_rs))
    S = (np.abs(tx) ** 2).mean()
    papr = 20 * np.log10(np.abs(tx).max() / np.sqrt(S))
    assert papr < 1.0, papr


def test_rf_bandwidth(tx_stream):
    """-6 dB RF bandwidth ~1500 Hz centred near 1500 Hz (README.md:433)."""
    cfg, model, params, stream = tx_stream
    n = min(len(stream), 40000) // 2 * 2
    spec = np.abs(np.fft.fft(stream[:n] * np.hanning(n))) ** 2
    freqs = np.fft.fftfreq(n, 1 / cfg.Fs)
    # smooth
    k = np.ones(100) / 100
    pos = np.convolve(spec[: n // 2], k, mode="same")
    peak = pos.max()
    above = freqs[: n // 2][pos > peak / 4]   # -6 dB
    bw = above.max() - above.min()
    centre = (above.max() + above.min()) / 2
    assert 1300 < bw < 1800, bw
    assert 1300 < centre < 1700, centre


def _add_noise_at_snr(stream, snrdB, rng, Fs=8000, B=3000):
    """Noise calibrated so SNR in a 3 kHz bandwidth equals snrdB."""
    S = (np.abs(stream) ** 2).mean()
    snr = 10 ** (snrdB / 10)
    # N_3k = S/snr; noise in Fs has power N_3k * Fs/B
    sigma2 = S / snr * Fs / B
    n = (np.sqrt(sigma2 / 2)
         * (rng.standard_normal(len(stream))
            + 1j * rng.standard_normal(len(stream))))
    return (stream + n).astype(np.complex64)


def test_acquisition_0dB_snr(tx_stream):
    """Acquire within 1.5 s at 0 dB SNR (3 kHz bandwidth), the README
    headline gate (README.md:447, ctest acq_* category)."""
    cfg, model, params, stream = tx_stream
    rng = np.random.default_rng(1)
    acq = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf,
                      cfg.p, cfg.pend)
    noisy = _add_noise_at_snr(stream, 0.0, rng)
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    n_ok = 0
    trials = 6
    for trial in range(trials):
        start = trial * 3 * cfg.Nmf
        acquired_at = None
        for mf in range(12):     # 12 frames = 1.44 s
            buf = noisy[start + mf * cfg.Nmf: start + mf * cfg.Nmf + buflen]
            cand, tmax, fmax = acq.detect_pilots(buf)
            if cand and abs(fmax) <= 2.5:
                acquired_at = mf
                break
        if acquired_at is not None:
            n_ok += 1
    # P(fail) < 0.2 over trials (ctest gate: <0.2)
    assert n_ok >= trials - 1, n_ok


def test_no_acquire_on_noise_long(tx_stream):
    cfg, model, params, stream = tx_stream
    rng = np.random.default_rng(2)
    acq = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf,
                      cfg.p, cfg.pend)
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    hits = 0
    for trial in range(10):
        noise = ((rng.standard_normal(buflen)
                  + 1j * rng.standard_normal(buflen)) / np.sqrt(2)
                 ).astype(np.complex64)
        cand, _, _ = acq.detect_pilots(noise)
        hits += int(cand)
    assert hits == 0


@pytest.mark.parametrize("ppm", [200, -200, 5000])
def test_clock_offset_tolerance(tx_stream, ppm):
    """+-200 ppm sample-clock offset: the receiver must stay in sync
    (README.md:452).  200 ppm over this 6 s stream drifts < M samples, so
    the slip mechanism itself is exercised with an exaggerated 5000 ppm
    (40 samples/s, guaranteeing an nin slip within the stream)."""
    cfg, model, params, stream = tx_stream
    rx = RadaeRx(params=params, auxdata=False, v=0)
    resampled = sample_clock_offset(stream.astype(np.complex64), ppm)
    floats_out = np.zeros(rx.get_n_floats_out(), np.float32)
    ptr = 0
    n_valid = 0
    slips = 0
    nframes = 0
    while ptr + rx.get_nin() <= len(resampled) - cfg.M:
        nin = rx.get_nin()
        if nin != cfg.Nmf:
            slips += 1
        ret = rx.do_radae_rx(resampled[ptr:ptr + nin], floats_out)
        ptr += nin
        n_valid += ret & 1
        nframes += 1
    # 50 frames tx'd; must stay in sync for the vast majority
    assert n_valid >= nframes - 10, (n_valid, nframes)
    if abs(ppm) >= 5000:
        assert slips >= 1, slips   # nin slip mechanism engaged


def test_acquisition_0dB_snr_mpp(tx_stream):
    """Acquire at 0 dB SNR on the MPP (1 Hz Doppler, 2 ms delay) channel —
    the README headline condition (README.md:437,447): mean acq < 1.5 s,
    P(fail) < 0.2."""
    from radae_tpu.channel.doppler import multipath_samples
    cfg, model, params, stream = tx_stream
    rng = np.random.default_rng(7)
    _, G, hf_gain = multipath_samples("mpp", cfg.Fs, cfg.Rs_dash, cfg.Nc,
                                      len(stream) / cfg.Fs + 1, rng=rng)
    G = hf_gain * G[: len(stream)]
    d = cfg.d_samples
    faded = stream * G[:, 0]
    faded[d:] += stream[:-d] * G[:-d, 1]
    # renormalise power then add noise at 0 dB SNR (3 kHz)
    faded *= np.sqrt((np.abs(stream) ** 2).mean()
                     / (np.abs(faded) ** 2).mean())
    noisy = _add_noise_at_snr(faded.astype(np.complex64), 0.0, rng)

    acq = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf,
                      cfg.p, cfg.pend)
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    trials, n_ok = 5, 0
    for trial in range(trials):
        start = trial * 4 * cfg.Nmf
        for mf in range(12):          # 1.44 s budget
            buf = noisy[start + mf * cfg.Nmf: start + mf * cfg.Nmf + buflen]
            cand, tmax, fmax = acq.detect_pilots(buf)
            if cand and abs(fmax) <= 2.5:
                n_ok += 1
                break
    assert n_ok >= trials - 1, n_ok


def test_acquisition_with_sine_interferer(tx_stream):
    """Acquire with a -3 dBc co-channel sine interferer within 2 s
    (README.md:449, ctest 244-252)."""
    cfg, model, params, stream = tx_stream
    rng = np.random.default_rng(8)
    S = (np.abs(stream) ** 2).mean()
    sine_amp = np.sqrt(S * 10 ** (-3 / 10))
    sine = sine_amp * np.exp(1j * 2 * np.pi * 1000
                             * np.arange(len(stream)) / cfg.Fs)
    noisy = _add_noise_at_snr((stream + sine).astype(np.complex64), 3.0, rng)

    acq = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf,
                      cfg.p, cfg.pend)
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    trials, n_ok = 5, 0
    for trial in range(trials):
        start = trial * 4 * cfg.Nmf
        for mf in range(16):          # < 2 s budget
            buf = noisy[start + mf * cfg.Nmf: start + mf * cfg.Nmf + buflen]
            cand, tmax, fmax = acq.detect_pilots(buf)
            if cand and abs(fmax) <= 2.5:
                n_ok += 1
                break
    assert n_ok >= trials - 1, n_ok


def _fade(stream, ch, rng, cfg):
    """Apply a two-path fading channel preset, power-renormalised (the
    preset's own path delay — e.g. MPD is 4 ms, not the waveform's 2 ms
    design value)."""
    from radae_tpu.channel.doppler import fade_two_path
    return fade_two_path(stream, ch, cfg.Fs, rng=rng)


@pytest.mark.parametrize("ch,snr,foff,budget_mf", [
    ("mpp", 0.0, 42.0, 12), ("mpp", 0.0, -42.0, 12),
    ("mpg", 0.0, 42.0, 12), ("mpg", 0.0, -42.0, 12),
    ("mpd", 3.0, 42.0, 16), ("mpd", 3.0, -42.0, 16),
])
def test_acquisition_gate_matrix(tx_stream, ch, snr, foff, budget_mf):
    """Acquisition at the edges of the +-50 Hz search grid across the
    fading channel classes at their README operating SNRs: P(fail) < 0.2,
    frequency estimate within one grid step (reference ctest acq sweep,
    CMakeLists.txt:211-241: +-42 Hz on MPP/MPG at 0 dB, MPD at 3 dB)."""
    cfg, model, params, stream = tx_stream
    rng = np.random.default_rng(abs(hash((ch, foff))) % 2**31)
    faded = _fade(stream, ch, rng, cfg)
    shifted = faded * np.exp(1j * 2 * np.pi * foff
                             * np.arange(len(faded)) / cfg.Fs)
    noisy = _add_noise_at_snr(shifted.astype(np.complex64), snr, rng)

    acq = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf,
                      cfg.p, cfg.pend)
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    trials, n_ok = 5, 0
    for trial in range(trials):
        start = trial * 4 * cfg.Nmf
        for mf in range(budget_mf):
            buf = noisy[start + mf * cfg.Nmf: start + mf * cfg.Nmf + buflen]
            cand, tmax, fmax = acq.detect_pilots(buf)
            if cand and abs(fmax - foff) <= 2.5:
                n_ok += 1
                break
    assert n_ok >= trials - 1, (ch, snr, foff, n_ok)
