"""DSP layer tests: BPF, acquisition, streaming tx->rx loopback, RRC,
single-carrier modem (mirrors reference ctest categories 5, 11, 12)."""

import numpy as np
import pytest

from radae_tpu.config import flagship_config
from radae_tpu.dsp.bpf import ComplexBPF, bpf_self_test
from radae_tpu.dsp.acquisition import Acquisition
from radae_tpu.dsp.streaming import TransmitterOne, ReceiverOne
from radae_tpu.dsp.rrc import gen_rn_coeffs, sample_clock_offset
from radae_tpu.dsp.single_carrier import SingleCarrier


@pytest.fixture(scope="module")
def cfg():
    return flagship_config()


@pytest.fixture(scope="module")
def acq(cfg):
    return Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf,
                       cfg.p, cfg.pend)


def test_complex_bpf():
    """-40 dB image rejection + chunked == whole-file (ctest complex_bpf_test,
    reference dsp.py:104-149)."""
    assert bpf_self_test()


def make_pilot_stream(cfg, offset, freq_hz=0.0, snr_gain=1.0, rng=None):
    """Synthetic stream of repeated pilot-led modem frames."""
    if rng is None:
        rng = np.random.default_rng(0)
    n = 3 * cfg.Nmf + cfg.M + cfg.Ncp
    sig = np.zeros(n + offset, np.complex64)
    frame = np.zeros(cfg.Nmf, np.complex64)
    frame[: cfg.M + cfg.Ncp] = cfg.p_cp * cfg.pilot_gain
    # random data symbols in the rest of the frame
    nds = cfg.Ns * (cfg.M + cfg.Ncp)
    frame[cfg.M + cfg.Ncp:] = (0.5 * (rng.standard_normal(nds)
                                      + 1j * rng.standard_normal(nds)))
    for i in range(4):
        st = offset + i * cfg.Nmf
        en = min(st + cfg.Nmf, n + offset)
        if st < len(sig):
            sig[st:en] = frame[: en - st]
    sig = sig[: n]
    if freq_hz:
        sig = sig * np.exp(1j * 2 * np.pi * freq_hz
                           * np.arange(n) / cfg.Fs).astype(np.complex64)
    return snr_gain * sig


def test_acquisition_detects_pilots(cfg, acq):
    offset = 333
    rx = make_pilot_stream(cfg, offset)
    buf = rx[: 2 * cfg.Nmf + cfg.M + cfg.Ncp]
    candidate, tmax, fmax = acq.detect_pilots(buf)
    assert candidate
    # tmax points at the M samples after the CP
    assert abs(tmax - (offset + cfg.Ncp)) <= 2
    assert abs(fmax) <= 2.5


def test_acquisition_freq_offset(cfg, acq):
    offset, foff = 100, 30.0
    rx = make_pilot_stream(cfg, offset, freq_hz=foff)
    candidate, tmax, fmax = acq.detect_pilots(rx[: 2 * cfg.Nmf + cfg.M + cfg.Ncp])
    assert candidate
    assert abs(fmax - foff) <= 2.5


def test_acquisition_rejects_noise(cfg, acq):
    """Must NOT acquire on noise (ctest acq_noise, CMakeLists.txt:191-199)."""
    rng = np.random.default_rng(5)
    n = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    hits = 0
    for trial in range(5):
        noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        candidate, _, _ = acq.detect_pilots(noise)
        hits += int(candidate)
    assert hits == 0


def test_acquisition_rejects_sine(cfg, acq):
    """Must NOT acquire on a sine-only input (ctest acq_sine)."""
    n = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    sine = np.exp(1j * 2 * np.pi * 1000 * np.arange(n) / cfg.Fs).astype(np.complex64)
    candidate, _, _ = acq.detect_pilots(sine)
    assert not candidate


def test_acquisition_refine(cfg, acq):
    offset, foff = 200, 10.3
    rx = make_pilot_stream(cfg, offset, freq_hz=foff)
    buf = rx[: 2 * cfg.Nmf + cfg.M + cfg.Ncp]
    _, tmax, fmax = acq.detect_pilots(buf)
    tmax, fmax = acq.refine(buf, tmax, fmax,
                            np.arange(max(0, tmax - 8), tmax + 8),
                            np.arange(fmax - 10, fmax + 10, 0.25))
    assert abs(tmax - (offset + cfg.Ncp)) <= 1
    assert abs(fmax - foff) <= 0.3


def test_streaming_tx_rx_loopback(cfg):
    """transmitter_one -> receiver_one loopback recovers z (within the EQ +
    PA-saturation tolerance of the coarse-mag path)."""
    rng = np.random.default_rng(1)
    tx1 = TransmitterOne(cfg)
    rx1 = ReceiverOne(cfg)
    nz = cfg.Nzmf
    # large z so bottleneck-3 signal drives the PA like a trained model
    zs = [np.sign(rng.standard_normal((1, nz, cfg.latent_dim))).astype(np.float32)
          for _ in range(3)]
    stream = np.concatenate([tx1.transmit(z) for z in zs])
    # decode frame 0 and 1 (each needs the next frame's pilot)
    for i in range(2):
        seg = stream[i * cfg.Nmf: i * cfg.Nmf + cfg.Nmf + cfg.M + cfg.Ncp]
        z_hat = rx1.receive(seg)
        err = np.sign(z_hat) != zs[i]
        assert err.mean() < 0.01, f"frame {i}: sign error rate {err.mean()}"


def test_receiver_one_snr_estimator(cfg):
    """SNR estimate responds in the right direction to added noise."""
    rng = np.random.default_rng(2)
    tx1 = TransmitterOne(cfg)
    z = np.sign(rng.standard_normal((1, cfg.Nzmf, cfg.latent_dim))).astype(np.float32)
    stream = np.concatenate([tx1.transmit(z) for _ in range(8)])

    def run(snr_sigma):
        r = ReceiverOne(cfg)
        noisy = stream + snr_sigma * (rng.standard_normal(len(stream))
                                      + 1j * rng.standard_normal(len(stream)))
        for i in range(6):
            seg = noisy[i * cfg.Nmf: i * cfg.Nmf + cfg.Nmf + cfg.M + cfg.Ncp]
            r.receive(seg.astype(np.complex64))
        return r.snrdB_3k_est

    assert run(0.01) > run(0.3)


def test_rrc_filter():
    rrc = gen_rn_coeffs(0.25, 1 / 9600, 2400, 6, 4)
    assert len(rrc) == 24
    # cascaded RRC ~ raised cosine: zero ISI at symbol spacing of the
    # combined response
    rc = np.convolve(rrc, rrc)
    centre = np.argmax(np.abs(rc))
    side = [rc[centre + 4 * k] for k in (-2, -1, 1, 2)]
    assert np.max(np.abs(side)) < 0.05 * np.abs(rc[centre])


def test_sample_clock_offset():
    n = 8000
    tx = np.exp(1j * 2 * np.pi * 100 * np.arange(n) / 8000).astype(np.complex64)
    rx = sample_clock_offset(tx, 100)
    # 100 ppm over 8000 samples shifts by 0.8 samples; signal preserved
    assert len(rx) == n
    err = np.abs(rx[:4000] - tx[:4000]).mean()
    assert err < 0.1


def test_single_carrier_baseline():
    """Clean-channel BER 0 (first case of single_carrier_tests,
    reference dsp.py:937)."""
    assert SingleCarrier().run_test(Nframes=10)


def test_single_carrier_clock_offset():
    assert SingleCarrier().run_test(Nframes=30, sample_clock_offset_ppm=100)
    assert SingleCarrier().run_test(Nframes=30, sample_clock_offset_ppm=-100)


def test_batched_acquisition_op_matches_numpy(cfg, acq):
    """The jitted batched acquisition op must agree with the host
    Acquisition class on candidate/tmax/fmax."""
    from radae_tpu.ops.acquisition_op import make_detect_pilots
    from radae_tpu.ops import cplx
    rng = np.random.default_rng(7)
    B = 3
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    streams = []
    truths = []
    for b, (offset, foff) in enumerate([(150, 0.0), (700, 20.0), (0, 0.0)]):
        if b < 2:
            s = make_pilot_stream(cfg, offset, freq_hz=foff,
                                  rng=np.random.default_rng(b))[:buflen]
            truths.append(acq.detect_pilots(s))
        else:
            s = ((rng.standard_normal(buflen)
                  + 1j * rng.standard_normal(buflen)) / np.sqrt(2)
                 ).astype(np.complex64)
            truths.append(acq.detect_pilots(s))
        streams.append(s)
    batchd = cplx.pack_np(np.stack(streams))
    detect = make_detect_pilots(cfg, B)
    cand, tmax, fmax, Dth, Dm = detect(batchd)
    for b in range(B):
        ref_c, ref_t, ref_f = truths[b]
        assert bool(cand[b]) == ref_c, b
        if ref_c:
            assert int(tmax[b]) == ref_t, (b, int(tmax[b]), ref_t)
            assert abs(float(fmax[b]) - ref_f) < 1e-4, b


def test_batched_acquisition_shard_count_invariance(cfg):
    """The batched acquisition op's per-stream results must not depend on
    how the batch is sharded over the mesh (1 device vs all 8): each row
    is an independent stream, so sharding is pure data parallelism."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from radae_tpu.ops.acquisition_op import make_detect_pilots
    from radae_tpu.ops import cplx
    from radae_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    B = 8
    buflen = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    streams = []
    for b in range(B):
        if b % 2 == 0:
            streams.append(make_pilot_stream(
                cfg, 100 + 97 * b, freq_hz=5.0 * b - 15,
                rng=np.random.default_rng(b))[:buflen])
        else:
            streams.append(((rng.standard_normal(buflen)
                             + 1j * rng.standard_normal(buflen))
                            / np.sqrt(2)).astype(np.complex64))
    batchd = cplx.pack_np(np.stack(streams))
    detect = make_detect_pilots(cfg, B)

    out_1dev = detect(batchd)
    mesh = make_mesh(8)
    with mesh:
        sharded = jax.device_put(batchd, NamedSharding(mesh, P("dp")))
        out_8dev = detect(sharded)
    names = ("candidate", "tmax", "fmax", "Dthresh", "Dtmax")
    for name, a, b in zip(names, out_1dev, out_8dev):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_receiver_snr_estimator_calibration(cfg):
    """snrdB_3k_est tracks true SNR within 1 dB over the operating range
    (the reference's m/c straight-line corrected estimator, dsp.py:437-456)."""
    rng = np.random.default_rng(0)
    tx1 = TransmitterOne(cfg)
    z = 100 * np.sign(rng.standard_normal(
        (1, cfg.Nzmf, cfg.latent_dim))).astype(np.float32)
    stream = np.concatenate([tx1.transmit(np.roll(z, i)) for i in range(48)])
    S = (np.abs(stream) ** 2).mean()
    for snrdB in (0.0, 6.0, 10.0):
        finals = []
        for rep in range(3):            # mean over noise realisations
            r = ReceiverOne(cfg)
            sigma2 = S / 10 ** (snrdB / 10) * 8000 / 3000
            noisy = stream + np.sqrt(sigma2 / 2) * (
                rng.standard_normal(len(stream))
                + 1j * rng.standard_normal(len(stream)))
            # 46 frames: the ~1 s IIR smoother converges (0.9^46 ~ 0.8%)
            for i in range(46):
                seg = noisy[i * cfg.Nmf:
                            i * cfg.Nmf + cfg.Nmf + cfg.M + cfg.Ncp]
                r.receive(seg.astype(np.complex64))
            finals.append(r.snrdB_3k_est)
        assert abs(np.mean(finals) - snrdB) < 1.0, (snrdB, finals)


def test_est_cp_corr_low_tmax_no_crash(cfg, acq):
    """tmax < Ncp - d_skip must not produce a negative slice start (an
    empty a-slice vs non-empty b-slice crashes np.vdot): the estimator
    skips to the first whole symbol instead."""
    rng = np.random.default_rng(0)
    n = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    rx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    for tmax in (0, 1, cfg.Ncp // 2 - 1, cfg.Ncp, cfg.Nmf - 1):
        c = acq.est_cp_corr(rx, tmax, 0.0)
        assert np.isfinite(c.real) and np.isfinite(c.imag), tmax
        f = acq.est_cp_foff(rx, tmax, 0.0)
        assert np.isfinite(f), tmax


def test_check_pilots_stats_refresh_matches_loop(cfg):
    """The vectorised 5% stats-grid refresh in check_pilots must produce
    the grid a per-row loop would (same RNG stream) up to BLAS
    accumulation-order float noise, so the Dthresh statistics are
    unchanged by the redesign."""
    rng = np.random.default_rng(7)
    n = 2 * cfg.Nmf + cfg.M + cfg.Ncp
    rx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)

    a = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf, cfg.p, cfg.pend)
    b = Acquisition(cfg.Fs, cfg.Rs, cfg.M, cfg.Ncp, cfg.Nmf, cfg.p, cfg.pend)
    a.detect_pilots(rx)
    b.detect_pilots(rx)

    rx2 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    va, ea = a.check_pilots(rx2, tmax=40, fmax=1.0)

    # loop reimplementation with the same RNG consumption on b
    rxc = np.conj(rx2)
    Nupdate = int(0.05 * b.Dt1.shape[0])
    ts = b._rng.integers(0, cfg.Nmf, Nupdate)
    for t in ts:
        b.Dt1[t, :] = rxc[t:t + cfg.M] @ b.p_w
        b.Dt2[t, :] = rxc[t + cfg.Nmf:t + cfg.Nmf + cfg.M] @ b.p_w

    np.testing.assert_allclose(a.Dt1, b.Dt1, atol=1e-4)
    np.testing.assert_allclose(a.Dt2, b.Dt2, atol=1e-4)
