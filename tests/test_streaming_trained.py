"""Streaming robustness with the trained flagship (rate-Fs) checkpoint:
the reference's most product-like ctest category (CMakeLists.txt:313-417):
decode through AWGN/MPP at operating SNR with loss gates, frequency drift,
false-sync detection via the auxdata unique word, EOO handling."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
CKPT = os.path.join(FIX, "model_fs_flagship.npz")
FEATS = os.path.join(FIX, "speech_feats.f32")


@pytest.fixture(scope="module")
def flagship():
    if not (os.path.exists(CKPT) and os.path.exists(FEATS)):
        pytest.skip("flagship fixture not present")
    from radae_tpu.convert import load_checkpoint
    params, meta = load_checkpoint(CKPT)
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)
    return params, feats, meta


def _tx_stream(params, feats, nframes=40):
    from radae_tpu.apps.txe import RadaeTx
    tx = RadaeTx(params=params, auxdata=True)
    frames = []
    for i in range(nframes):
        frames.append(tx.do_radae_tx(
            feats[i * 12:(i + 1) * 12].flatten()))
    return np.concatenate(frames + [tx.do_eoo(),
                                    np.zeros(3000, np.complex64)])


def _rx_run(params, stream, **kw):
    from radae_tpu.apps.rxe import RadaeRx
    rx = RadaeRx(params=params, auxdata=True, v=0, **kw)
    floats_out = np.zeros(rx.get_n_floats_out(), np.float32)
    chunks = []
    events = {"eoo": 0, "unsync": 0, "fmax_in_sync": None}
    prev_state = "search"
    ptr = 0
    while ptr + rx.get_nin() <= len(stream):
        nin = rx.get_nin()
        ret = rx.do_radae_rx(stream[ptr:ptr + nin], floats_out)
        ptr += nin
        if ret & 1:
            chunks.append(floats_out.reshape(-1, 36).copy())
            events["fmax_in_sync"] = rx.fmax
        if ret & 2:
            events["eoo"] += 1
        if prev_state == "sync" and rx.state == "search":
            events["unsync"] += 1
        prev_state = rx.state
    out = np.concatenate(chunks) if chunks else np.zeros((0, 36))
    return out, events, rx


def _loss(feats_ref, feats_hat):
    from radae_tpu.models.core import distortion_loss
    n = min(len(feats_ref), len(feats_hat))
    # align: decoded stream lags by the acquisition delay; scan small range
    best = np.inf
    for s in range(0, len(feats_ref) - n + 1):
        l = float(np.asarray(distortion_loss(
            feats_ref[None, s:s + n, :20], feats_hat[None, :n, :20]))[0])
        best = min(best, l)
    return best


def _add_noise_at_snr(stream, snrdB, rng, Fs=8000, B=3000):
    sig = stream[np.abs(stream) > 0]
    S = (np.abs(sig) ** 2).mean()
    sigma2 = S / 10 ** (snrdB / 10) * Fs / B
    n = (np.sqrt(sigma2 / 2) * (rng.standard_normal(len(stream))
                                + 1j * rng.standard_normal(len(stream))))
    return (stream + n).astype(np.complex64)


def test_streaming_clean(flagship):
    """Clean-channel streaming loopback: loss gate ~ the ctest 'clean'
    gate scaled for this small-data model."""
    params, feats, meta = flagship
    stream = _tx_stream(params, feats)
    out, events, rx = _rx_run(params, stream)
    assert out.shape[0] >= 34 * 12          # acq within ~0.7 s
    loss = _loss(feats[:, :], out)
    train_loss = float(meta.get("loss", 0.35))
    assert loss < train_loss + 0.15, (loss, train_loss)
    assert events["eoo"] >= 1


def test_streaming_awgn_snr(flagship):
    """AWGN at ~3 dB SNR (3 kHz): must stay in sync and decode with
    bounded extra loss."""
    params, feats, meta = flagship
    rng = np.random.default_rng(0)
    stream = _add_noise_at_snr(_tx_stream(params, feats), 3.0, rng)
    out, events, rx = _rx_run(params, stream)
    assert out.shape[0] >= 30 * 12, out.shape
    loss = _loss(feats, out)
    train_loss = float(meta.get("loss", 0.35))
    assert loss < train_loss + 0.3, (loss, train_loss)


def test_streaming_freq_drift(flagship):
    """Frequency drift 0.1 Hz/s with a 2 Hz initial offset must be tracked
    (ctest radae_rx_drift, CMakeLists.txt:363-371 analog)."""
    params, feats, meta = flagship
    stream = _tx_stream(params, feats)
    n = len(stream)
    t = np.arange(n) / 8000.0
    freq = 2.0 + 0.1 * t
    phase = 2 * np.pi * np.cumsum(freq) / 8000.0
    stream = (stream * np.exp(1j * phase)).astype(np.complex64)
    out, events, rx = _rx_run(params, stream)
    assert out.shape[0] >= 30 * 12
    # tracked frequency (while in sync) should be near the drifted offset
    assert 1.0 < events["fmax_in_sync"] < 4.0, events


def test_false_sync_unsync_via_uw(flagship):
    """Injected frequency error after sync (--foff_err) corrupts the
    demod; the auxdata unique word must force unsync within ~2 s
    (ctest false-sync category, CMakeLists.txt:462-471)."""
    params, feats, meta = flagship
    stream = _tx_stream(params, feats)
    out, events, rx = _rx_run(params, stream, foff_err=25.0)
    # the false sync must be detected and dropped...
    assert events["unsync"] >= 1, events
    # ...and the receiver then re-acquires at the true frequency and
    # decodes the remainder (the one-shot foff_err is consumed)
    assert out.shape[0] >= 15 * 12, out.shape


def test_eoo_data_channel(flagship):
    """Experimental EOO data channel: bits embedded in the EOO frame are
    recovered with BER < 5% (ctest EOO data category, CMakeLists.txt:
    576-606, eoo_ber.py gate)."""
    from radae_tpu.apps.txe import RadaeTx
    params, feats, meta = flagship
    tx = RadaeTx(params=params, auxdata=True)
    rng = np.random.default_rng(65647)
    tx_bits = np.sign(rng.random(tx.get_Neoo_bits()) - 0.5).astype(np.float32)
    tx.set_eoo_bits(tx_bits)
    stream = _tx_stream_with_tx(tx, feats, nframes=10)
    out, events, rx, eoo_soft = _rx_run_eoo(params, stream)
    assert events["eoo"] >= 1
    n_bits = len(tx_bits)
    ber = float((eoo_soft[:n_bits] * tx_bits < 0).mean())
    assert ber < 0.05, ber


def _tx_stream_with_tx(tx, feats, nframes=10):
    frames = [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
              for i in range(nframes)]
    return np.concatenate(frames + [tx.do_eoo(),
                                    np.zeros(3000, np.complex64)])


def _rx_run_eoo(params, stream):
    from radae_tpu.apps.rxe import RadaeRx
    rx = RadaeRx(params=params, auxdata=True, v=0)
    floats_out = np.zeros(rx.get_n_floats_out(), np.float32)
    chunks = []
    events = {"eoo": 0, "unsync": 0, "fmax_in_sync": None}
    eoo_soft = None
    ptr = 0
    while ptr + rx.get_nin() <= len(stream):
        nin = rx.get_nin()
        ret = rx.do_radae_rx(stream[ptr:ptr + nin], floats_out)
        ptr += nin
        if ret & 1:
            chunks.append(floats_out.reshape(-1, 36).copy())
        if ret & 2:
            events["eoo"] += 1
            eoo_soft = floats_out.copy()
    out = np.concatenate(chunks) if chunks else np.zeros((0, 36))
    return out, events, rx, eoo_soft


def test_c_api_with_trained_weights(flagship, tmp_path):
    """Full native C receiver on a Python-transmitted trained-model stream:
    decode quality within loss delta of the Python receiver."""
    import subprocess
    from radae_tpu.export import write_blob
    from radae_tpu.models.core import distortion_loss
    params, feats, meta = flagship
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    blob = str(tmp_path / "w.bin")
    write_blob(blob, params)

    stream = _tx_stream(params, feats, nframes=40)
    rxf = str(tmp_path / "rx.f32")
    stream.astype(np.complex64).tofile(rxf)
    rc = subprocess.run([os.path.join(REPO, "native", "build", "radae_rx"),
                         blob], stdin=open(rxf, "rb"),
                        capture_output=True, cwd=str(tmp_path))
    c_out = np.frombuffer(rc.stdout, np.float32).reshape(-1, 36)
    assert c_out.shape[0] >= 34 * 12, (c_out.shape, rc.stderr.decode())
    loss = _loss(feats, c_out)
    train_loss = float(meta.get("loss", 0.35))
    assert loss < train_loss + 0.15, (loss, train_loss)
    assert "EOO detected" in rc.stderr.decode()

    # C receiver must match the Python streaming receiver exactly
    py_out, _, _ = _rx_run(params, stream)
    n = min(len(py_out), len(c_out))
    delta = _loss(py_out[:n], c_out[:n])
    assert delta < 0.01, delta


def _build_native():
    import subprocess
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return os.path.join(REPO, "native", "build")


def test_c_foff_false_sync(flagship, tmp_path):
    """C receiver false-sync path: RADE_FOFF_TEST injects +10 Hz at sync;
    the auxdata unique word must detect it, unsync, and the receiver then
    re-acquires (reference: ctest radae_rx_foff, CMakeLists.txt:462-471;
    src/rade_api.c:263-264)."""
    import subprocess
    from radae_tpu.export import write_blob
    params, feats, meta = flagship
    build = _build_native()
    blob = str(tmp_path / "w.bin")
    write_blob(blob, params)

    stream = _tx_stream(params, feats, nframes=40)
    rxf = str(tmp_path / "rx.f32")
    stream.astype(np.complex64).tofile(rxf)
    rc = subprocess.run([os.path.join(build, "radae_rx"), blob, "1"],
                        stdin=open(rxf, "rb"), capture_output=True,
                        cwd=str(tmp_path))
    err = rc.stderr.decode()
    assert "unsync" in err.splitlines(), err          # false sync dropped
    assert err.split().count("sync") >= 2, err                # ...and re-acquired
    out = np.frombuffer(rc.stdout, np.float32).reshape(-1, 36)
    assert out.shape[0] >= 20 * 12, (out.shape, err)  # decodes remainder


def test_c_tx_python_tx_sample_parity(flagship, tmp_path):
    """Native C transmitter vs the Python streaming transmitter on the same
    features: sample-level IQ parity including the EOO frame (reference:
    ctest radae_tx_basic comparison, CMakeLists.txt:462-513)."""
    import subprocess
    from radae_tpu.export import write_blob
    params, feats, meta = flagship
    build = _build_native()
    blob = str(tmp_path / "w.bin")
    write_blob(blob, params)

    nframes = 8
    py_stream = _tx_stream(params, feats, nframes=nframes)

    fin = str(tmp_path / "f.f32")
    feats[: nframes * 12].astype(np.float32).flatten().tofile(fin)
    tx = subprocess.run([os.path.join(build, "radae_tx"), blob],
                        stdin=open(fin, "rb"), capture_output=True,
                        cwd=str(tmp_path))
    assert tx.returncode == 0, tx.stderr.decode()
    c_stream = np.frombuffer(tx.stdout, np.complex64)

    n = min(len(c_stream), len(py_stream))
    assert n > nframes * 960
    py = py_stream[:n].astype(np.complex64)
    # The C encoder is float32 math in a different evaluation order than
    # XLA, so individual samples differ at the 1e-3 level; gate on error
    # ENERGY, which catches any structural error (ordering, scaling,
    # pilots, CP, EOO bits) while tolerating float-path noise.
    err = np.abs(c_stream[:n] - py) ** 2
    sig = np.abs(py) ** 2
    err_db = 10 * np.log10(err.sum() / sig.sum())
    assert err_db < -35.0, err_db
    # and per modem frame: no localized divergence hiding in the average
    nmf_samp = 960
    for k in range(n // nmf_samp):
        s = slice(k * nmf_samp, (k + 1) * nmf_samp)
        if sig[s].sum() < 1e-6:
            continue                       # trailing silence
        fdb = 10 * np.log10(err[s].sum() / sig[s].sum())
        assert fdb < -30.0, (k, fdb)


def test_c_multictx_parity(flagship, tmp_path):
    """Two interleaved C receiver contexts in one process: the context
    decoding the real stream must produce byte-identical output to a solo
    receiver (no shared mutable state in the native runtime)."""
    import subprocess
    from radae_tpu.export import write_blob
    params, feats, meta = flagship
    build = _build_native()
    blob = str(tmp_path / "w.bin")
    write_blob(blob, params)

    stream = _tx_stream(params, feats, nframes=12)
    rxf = str(tmp_path / "rx.f32")
    stream.astype(np.complex64).tofile(rxf)

    solo = subprocess.run([os.path.join(build, "radae_rx"), blob],
                          stdin=open(rxf, "rb"), capture_output=True,
                          cwd=str(tmp_path))
    outf = str(tmp_path / "multi.f32")
    multi = subprocess.run([os.path.join(build, "test_multictx"), blob,
                            rxf, outf], capture_output=True,
                           cwd=str(tmp_path))
    assert multi.returncode == 0, multi.stderr.decode()
    a = np.frombuffer(solo.stdout, np.float32)
    b = np.fromfile(outf, np.float32)
    assert a.size > 0 and a.size == b.size, (a.size, b.size)
    np.testing.assert_array_equal(a, b)
