"""Whole-over batched receiver: acquisition-op + align + scan decode as
one XLA program (runtime.make_batched_receiver), checked against the
product streaming receiver on real transmissions."""

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
    params, _ = load_checkpoint(CKPT)
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)
    return params, feats


def test_batched_receiver_acquires_and_decodes(flagship):
    """B streams, each with a different start pad and frequency offset:
    the one-program receiver must find each stream's (tmax, fmax) via the
    MXU acquisition grid, derotate/align per row, and decode features
    matching the host streaming receiver's quality."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.config import flagship_config
    from radae_tpu.models.core import CoreDecoder, distortion_loss
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    n_frames = 8
    rows = 12
    tx = RadaeTx(params=params, auxdata=True)
    frames = [tx.do_radae_tx(feats[i * rows:(i + 1) * rows].flatten())
              for i in range(n_frames + 1)]     # +1 so the last rx window
    over = np.concatenate(frames)               # has its closing pilot
    ref = feats[: n_frames * rows, :20]

    cfg = tx.cfg
    B = 4
    pads = [0, 257, 600, 911]
    foffs = [0.0, -31.0, 12.5, 40.0]
    T = max(pads) + len(over) + cfg.Nmf
    rng = np.random.default_rng(0)
    streams = np.zeros((B, T), np.complex64)
    for b in range(B):
        n = np.arange(len(over))
        shifted = over * np.exp(1j * 2 * np.pi * foffs[b] * n / cfg.Fs)
        streams[b, pads[b]: pads[b] + len(over)] = shifted
    # mild noise (10 dB SNR-3k) so acquisition is non-trivial
    S = (np.abs(over) ** 2).mean()
    sigma2 = S / 10 ** (10 / 10) * cfg.Fs / 3000
    streams += np.sqrt(sigma2 / 2) * (
        rng.standard_normal(streams.shape)
        + 1j * rng.standard_normal(streams.shape))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    rx = make_batched_receiver(cfg, decoder, B, n_frames)
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    feats_hat, cand, tmax, fmax = rx(dec_params, jnp.asarray(packed))
    feats_hat = np.asarray(feats_hat)

    assert np.asarray(cand).all(), (tmax, fmax)
    for b in range(B):
        # tmax points at the pilot proper, Ncp samples after frame start
        assert abs(int(tmax[b]) - (pads[b] + cfg.Ncp)) <= 2, \
            (b, int(tmax[b]), pads[b])
        assert abs(float(fmax[b]) - foffs[b]) <= 2.0, (b, float(fmax[b]))

    # decoded quality: every stream within 0.25 of the clean decode loss
    losses = [float(np.asarray(distortion_loss(
        ref[None], feats_hat[b].reshape(-1, cfg.feature_dim)[None, :, :20]
    ))[0]) for b in range(B)]
    clean = losses[0]
    assert clean < 0.6, losses
    for b in range(1, B):
        assert losses[b] < clean + 0.25, losses


def test_batched_receiver_sharded_over_mesh(flagship):
    """Serving at scale (SURVEY §2.7): the whole-over receiver program runs
    with its stream axis sharded over the 8-device mesh and produces the
    same decode as the single-device run — acquisition, per-row
    derotation/alignment and the scan decode all shard along batch."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.parallel.mesh import make_mesh
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    n_frames, rows = 4, 12
    tx = RadaeTx(params=params, auxdata=True)
    frames = [tx.do_radae_tx(feats[i * rows:(i + 1) * rows].flatten())
              for i in range(n_frames + 1)]
    over = np.concatenate(frames)
    cfg = tx.cfg
    B = 8
    rng = np.random.default_rng(1)
    pads = rng.integers(0, cfg.Nmf, B)
    foffs = rng.uniform(-40, 40, B)
    T = int(pads.max()) + len(over) + cfg.Nmf
    streams = np.zeros((B, T), np.complex64)
    n = np.arange(len(over))
    for b in range(B):
        streams[b, pads[b]:pads[b] + len(over)] = \
            over * np.exp(1j * 2 * np.pi * foffs[b] * n / cfg.Fs)
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    rx = make_batched_receiver(cfg, decoder, B, n_frames)

    f1, c1, t1, _ = rx(dec_params, jnp.asarray(packed))

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("dp"))
    with mesh:
        f8, c8, t8, _ = rx(dec_params, jax.device_put(packed, sh))
    assert np.asarray(c8).all()
    np.testing.assert_array_equal(np.asarray(t8), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f1),
                               rtol=1e-4, atol=1e-5)

    # product-grade program (windowed retry + refine + CP + EOO + SNR)
    # shards identically: same acquisition and decode under the mesh
    T2 = max(3 * cfg.Nmf + cfg.M + cfg.Ncp,
             2 * cfg.Nmf + (n_frames + 1) * cfg.Nmf + cfg.Ncp + cfg.M)
    pad2 = np.zeros((B, max(0, T2 - T), 2), np.float32)
    packed2 = np.concatenate([packed, pad2], axis=1)
    rxp = make_batched_receiver(cfg, decoder, B, n_frames,
                                n_windows=2, refine=True, eoo=True)
    o1 = rxp(dec_params, jnp.asarray(packed2))
    with mesh:
        o8 = rxp(dec_params, jax.device_put(packed2, sh))
    assert np.asarray(o8["candidate"]).all()
    np.testing.assert_array_equal(np.asarray(o8["tmax"]),
                                  np.asarray(o1["tmax"]))
    np.testing.assert_allclose(np.asarray(o8["features"]),
                               np.asarray(o1["features"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o8["snrdB_3k"]),
                               np.asarray(o1["snrdB_3k"]),
                               rtol=1e-4, atol=1e-4)


def test_batched_receiver_fused_int8_matches_unfused(flagship):
    """The whole-over receiver with the Pallas int8 decoder in its scan
    (serving-at-scale config) must not degrade decode QUALITY: the gate is
    the end-to-end feature-loss delta vs the transmitted features (<0.01,
    the reference's PASS/FAIL loss-delta form; measured -0.001 — int8 is
    quality-neutral).  Raw float-vs-int8 output distance is additionally
    bounded loosely: the net is trained with +-1/254-per-layer activation
    quantization noise, so quantized outputs wander within that dither
    ball (~0.015 here) without quality change."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder, distortion_loss
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree
    from radae_tpu.ops import fused_core

    params, feats = flagship
    n_frames = 4
    rows = 12
    tx = RadaeTx(params=params, auxdata=True)
    frames = [tx.do_radae_tx(feats[i * rows:(i + 1) * rows].flatten())
              for i in range(n_frames + 1)]
    over = np.concatenate(frames)
    ref = feats[: n_frames * rows, :20]
    cfg = tx.cfg
    B = 4
    T = len(over) + cfg.Nmf
    streams = np.zeros((B, T), np.complex64)
    streams[:, :len(over)] = over
    packed = jnp.asarray(np.stack([streams.real, streams.imag], -1)
                         .astype(np.float32))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    rx_x = make_batched_receiver(cfg, decoder, B, n_frames)
    f_x, cand, _, _ = rx_x(device_put_tree(params["decoder"]),
                           packed)
    assert np.asarray(cand).all()

    orig = fused_core.make_fused_decoder_step
    fused_core.make_fused_decoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        rx_q = make_batched_receiver(cfg, decoder, B, n_frames,
                                     fused=True, fused_tile=4,
                                     fused_quant="int8")
        w = tuple(fused_core.decoder_weights(params["decoder"],
                                             quant="int8"))
        f_q, cand_q, _, _ = rx_q(w, packed)
    finally:
        fused_core.make_fused_decoder_step = orig
    assert np.asarray(cand_q).all()

    def e2e_loss(f):
        f = np.asarray(f).reshape(B, -1, cfg.feature_dim)[..., :20]
        return float(np.asarray(distortion_loss(
            np.repeat(ref[None], B, 0), f)).mean())

    assert abs(e2e_loss(f_q) - e2e_loss(f_x)) < 0.01, \
        (e2e_loss(f_q), e2e_loss(f_x))
    dist = float(np.asarray(distortion_loss(
        np.asarray(f_x).reshape(B, -1, cfg.feature_dim)[..., :20],
        np.asarray(f_q).reshape(B, -1, cfg.feature_dim)[..., :20])).mean())
    assert dist < 0.03, dist       # dither-ball bound, not a quality gate


def _mpp_fade(stream, cfg, rng):
    """Two-path MPP Watterson fade, power-renormalised (the channel the
    reference's acquisition gates run at, CMakeLists.txt:211-241)."""
    from radae_tpu.channel.doppler import multipath_samples
    _, G, hf_gain = multipath_samples("mpp", cfg.Fs, cfg.Rs_dash, cfg.Nc,
                                      len(stream) / cfg.Fs + 1, rng=rng)
    G = hf_gain * G[: len(stream)]
    d = cfg.d_samples
    faded = stream * G[:, 0]
    faded[d:] += stream[:-d] * G[:-d, 1]
    faded *= np.sqrt((np.abs(stream) ** 2).mean()
                     / (np.abs(faded) ** 2).mean())
    return faded.astype(np.complex64)


def _noise_at_snr(x, snrdB, rng, Fs=8000, BW=3000):
    sig = x[np.abs(x) > 0]
    S = (np.abs(sig) ** 2).mean()
    sigma2 = S / 10 ** (snrdB / 10) * Fs / BW
    return (x + np.sqrt(sigma2 / 2)
            * (rng.standard_normal(len(x))
               + 1j * rng.standard_normal(len(x)))).astype(np.complex64)


def test_windowed_acquisition_0dB_mpp_within_budget(flagship):
    """Product-grade acquisition in the one-program receiver: with
    windowed retry (12 windows = the reference's 1.5 s budget,
    README.md:447) + fine refine, P(acquire AND correct t/f within the
    budget) at 0 dB SNR MPP must be >= 0.8 — the same gate the product
    streaming receiver passes (tests/test_gates.py), closing the
    single-shot 57%-at-0dB gap of the round-4 design."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    n_tx = 15
    over = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(n_tx)])
    cfg = tx.cfg
    B, K = 10, 12
    rng = np.random.default_rng(3)
    pads = rng.integers(0, cfg.Nmf, B)
    foffs = rng.uniform(-42, 42, B)
    T = (K + 2) * cfg.Nmf + cfg.M + cfg.Ncp
    streams = np.zeros((B, T), np.complex64)
    n = np.arange(len(over))
    for b in range(B):
        faded = _mpp_fade(over, cfg, np.random.default_rng(100 + b))
        sig = faded * np.exp(1j * 2 * np.pi * foffs[b] * n / cfg.Fs)
        m = min(len(sig), T - pads[b])
        streams[b, pads[b]: pads[b] + m] = sig[:m]
        streams[b] = _noise_at_snr(streams[b], 0.0,
                                   np.random.default_rng(200 + b))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    nf = 4
    rx = make_batched_receiver(cfg, decoder, B, n_frames=nf,
                               n_windows=K, refine=True)
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    out = rx(dec_params, jnp.asarray(packed))
    cand = np.asarray(out["candidate"])
    tmax = np.asarray(out["tmax"])
    fmax = np.asarray(out["fmax"])
    win = np.asarray(out["win"])

    ok = 0
    t_tol = cfg.d_samples + 4    # a lock on the second MPP path (16
    for b in range(B):           # samples late) sits inside the CP: valid
        t_true = pads[b] + cfg.Ncp
        # signal starts inside window 0 or 1; any later hit window must
        # land on a true pilot (Nmf-periodic from t_true)
        t_err = (int(tmax[b]) - t_true) % cfg.Nmf
        t_err = min(t_err, cfg.Nmf - t_err)
        if (cand[b] and t_err <= t_tol
                and abs(float(fmax[b]) - foffs[b]) <= 3.0
                and win[b] < K):
            ok += 1
    assert ok >= 8, (ok, list(zip(cand, tmax - pads - cfg.Ncp,
                                  fmax - foffs, win)))


def test_refine_tightens_coarse_frequency(flagship):
    """The in-program fine search must cut the coarse grid's +-1.25 Hz
    residual to the fine-step scale (product analog: rx.py:201-205 runs
    acq.refine before decoding)."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    over = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(5)])
    cfg = tx.cfg
    B = 4
    foff = 13.7                    # 1.2 Hz off the 2.5 Hz coarse grid
    pads = [0, 313, 640, 900]
    T = 4 * cfg.Nmf + cfg.M + cfg.Ncp + len(over)
    rng = np.random.default_rng(0)
    streams = np.zeros((B, T), np.complex64)
    n = np.arange(len(over))
    for b in range(B):
        streams[b, pads[b]: pads[b] + len(over)] = \
            over * np.exp(1j * 2 * np.pi * foff * n / cfg.Fs)
        streams[b] = _noise_at_snr(streams[b], 10.0, rng)

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)

    rx_c = make_batched_receiver(cfg, decoder, B, n_frames=2, n_windows=2)
    rx_r = make_batched_receiver(cfg, decoder, B, n_frames=2, n_windows=2,
                                 refine=True)
    out_c = rx_c(dec_params, jnp.asarray(packed))
    out_r = rx_r(dec_params, jnp.asarray(packed))
    assert np.asarray(out_c["candidate"]).all()
    assert np.asarray(out_r["candidate"]).all()
    err_c = np.abs(np.asarray(out_c["fmax"]) - foff)
    err_r = np.abs(np.asarray(out_r["fmax"]) - foff)
    assert err_c.max() <= 1.35, err_c       # coarse: grid-limited (+-1.25)
    assert err_r.max() <= 0.4, err_r        # refined: fine-step scale
    for b in range(B):
        # acquisition confirms over consecutive windows, so tmax points
        # at the pilot of the acquiring window — compare modulo Nmf
        t_err = (int(np.asarray(out_r["tmax"])[b])
                 - (pads[b] + cfg.Ncp)) % cfg.Nmf
        assert min(t_err, cfg.Nmf - t_err) <= 2, (b, t_err)


def test_batched_receiver_threshold_snr_parity_with_streaming(flagship):
    """VERDICT r4 gate: at threshold SNR (0 dB MPP), the one-program
    receiver with product-grade acquisition must decode with feature loss
    matching the product streaming receiver on the SAME stream (not just
    at 10 dB)."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.apps.rxe import RadaeRx
    from radae_tpu.models.core import CoreDecoder, distortion_loss
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    n_tx = 20
    over = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(n_tx)])
    cfg = tx.cfg
    faded = _mpp_fade(over, cfg, np.random.default_rng(11))
    K = 12
    T = len(over) + (K + 2) * cfg.Nmf + cfg.M + cfg.Ncp
    base = np.zeros(T, np.complex64)
    base[: len(faded)] = faded
    stream = _noise_at_snr(base, 0.0, np.random.default_rng(12))

    # product streaming receiver on the same stream
    rxe = RadaeRx(params=params, auxdata=True, v=0)
    floats_out = np.zeros(rxe.get_n_floats_out(), np.float32)
    chunks, ptr = [], 0
    while ptr + rxe.get_nin() <= len(stream):
        nin = rxe.get_nin()
        ret = rxe.do_radae_rx(stream[ptr:ptr + nin], floats_out)
        ptr += nin
        if ret & 1:
            chunks.append(floats_out.reshape(-1, 36).copy())
    assert chunks, "streaming receiver never synced"
    out_s = np.concatenate(chunks)

    def best_loss(hat):
        ref = feats[: n_tx * 12, :20]
        n = min(len(ref), len(hat))
        best = np.inf
        for s in range(0, 6 * 12 + 1, 12):
            if s + n > len(ref):
                break
            best = min(best, float(np.asarray(distortion_loss(
                ref[None, s:s + n], hat[None, :n, :20]))[0]))
        return best

    loss_stream = best_loss(out_s)

    B = 2
    streams = np.stack([stream, stream])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    rx = make_batched_receiver(cfg, decoder, B, n_frames=n_tx,
                               n_windows=K, refine=True)
    out = rx(dec_params, jnp.asarray(packed))
    assert np.asarray(out["candidate"]).all()
    fh = np.asarray(out["features"]).reshape(B, -1, cfg.feature_dim)
    # drop frames before the acquisition window (decode starts there)
    w0 = int(np.asarray(out["win"])[0])
    hat = fh[0][:, :20]
    ref = feats[w0 * 12: n_tx * 12, :20]
    n = min(len(ref), len(hat))
    loss_b = float(np.asarray(distortion_loss(
        ref[None, :n], hat[None, :n]))[0])
    # parity gate: within 0.1 of the product receiver (reference's
    # loss-delta PASS/FAIL form, loss.py:109-112, relaxed for the
    # one-shot-EQ vs per-frame-refine difference at threshold SNR)
    assert loss_b < loss_stream + 0.1, (loss_b, loss_stream)


def test_batched_receiver_eoo_detection_and_bits(flagship):
    """End-of-over through the serving path (VERDICT r4 item 5): the
    one-program receiver must flag the EOO frame at its position and
    demodulate the embedded EOO data bits (BER < 5%, the reference's
    eoo_ber.py gate) — and must NOT flag EOO on a data-only over."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    rng = np.random.default_rng(5)
    tx_bits = np.sign(rng.random(tx.get_Neoo_bits()) - 0.5).astype(np.float32)
    tx.set_eoo_bits(tx_bits)
    n_data = 6
    data = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(n_data)])
    over_eoo = np.concatenate([data, tx.do_eoo()])
    cfg = tx.cfg

    B = 4
    pads = [0, 400, 777, 0]
    foffs = [0.0, -20.0, 8.0, 0.0]
    T = 2 * cfg.Nmf + len(over_eoo) + 2 * cfg.Nmf + cfg.M + cfg.Ncp
    streams = np.zeros((B, T), np.complex64)
    for b in range(B):
        sig = over_eoo if b < 3 else data      # row 3: no EOO appended
        n = np.arange(len(sig))
        streams[b, pads[b]: pads[b] + len(sig)] = \
            sig * np.exp(1j * 2 * np.pi * foffs[b] * n / cfg.Fs)
        streams[b] = _noise_at_snr(streams[b], 6.0,
                                   np.random.default_rng(50 + b))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    rx = make_batched_receiver(cfg, decoder, B, n_frames=n_data,
                               n_windows=2, refine=True, eoo=True)
    out = rx(dec_params, jnp.asarray(packed))
    assert np.asarray(out["candidate"]).all()
    det = np.asarray(out["eoo_detected"])
    ef = np.asarray(out["eoo_frame"])
    win = np.asarray(out["win"])
    bits = np.asarray(out["eoo_bits"])
    assert det[:3].all(), (det, ef)
    assert not det[3], (det, ef)
    nb = len(tx_bits)
    for b in range(3):
        # decode starts at the acquiring window, so the EOO frame index
        # is relative to it
        assert ef[b] == n_data - win[b], (b, ef, win)
        ber = float((bits[b][:nb] * tx_bits < 0).mean())
        assert ber < 0.05, (b, ber)


def test_rx_batch_cli(flagship, tmp_path):
    """The rx_batch serving CLI: many IQ files decoded in one program,
    per-stream feature files truncated at the detected EOO."""
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.tools import rx_batch

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    n_data = 4
    data = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(n_data)])
    over = np.concatenate([data, tx.do_eoo()])
    cfg = tx.cfg
    rng = np.random.default_rng(2)
    files = []
    for k, (pad, foff) in enumerate([(0, 0.0), (500, -15.0)]):
        n = np.arange(len(over))
        s = np.zeros(pad + len(over) + cfg.Nmf, np.complex64)
        s[pad: pad + len(over)] = over * np.exp(
            1j * 2 * np.pi * foff * n / cfg.Fs)
        s += 0.02 * (rng.standard_normal(len(s))
                     + 1j * rng.standard_normal(len(s)))
        fn = tmp_path / f"s{k}.f32"
        s.astype(np.complex64).tofile(fn)
        files.append(str(fn))

    ckpt = os.path.join(FIX, "model_fs_flagship.npz")
    rc = rx_batch.main([ckpt, str(tmp_path / "out")] + files
                       + ["--n-windows", "2"])
    assert rc == 0
    for k in range(2):
        out = tmp_path / "out" / f"s{k}_feat.f32"
        assert out.exists(), out
        fh = np.fromfile(out, np.float32).reshape(-1, 36)
        # decoded up to the EOO: at least 2 of the 4 data frames' rows
        # survive after the acquisition window offset
        assert len(fh) >= 2 * 12, len(fh)
        assert np.isfinite(fh).all()


def test_eoo_threshold_robust_to_zero_padding(flagship):
    """Regression (r5 review finding): a short over zero-padded out to
    the 12-window acquisition length must NOT trigger false end-of-over
    detections — empty (exact-zero) windows are excluded from the sigma
    average, otherwise they deflate the EOO threshold by ~2x and data
    frames cross it."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    n_data = 4
    data = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(n_data)])
    over = np.concatenate([data, tx.do_eoo()])
    cfg = tx.cfg
    K = 12
    B = 2
    T = max((K + 1) * cfg.Nmf + cfg.M + cfg.Ncp,
            K * cfg.Nmf + (n_data + 1) * cfg.Nmf + cfg.Ncp + cfg.M)
    streams = np.zeros((B, T), np.complex64)
    rng = np.random.default_rng(9)
    streams[0, : len(over)] = over           # EOO present
    streams[1, : len(data)] = data           # data only, no EOO
    # light noise ONLY over the signal extent; the tail stays EXACT zero
    # (the deflation scenario: >half the acquisition windows are empty)
    n_sig = len(over)
    streams[:, :n_sig] += 0.02 * (
        rng.standard_normal((B, n_sig))
        + 1j * rng.standard_normal((B, n_sig)))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    rx = make_batched_receiver(cfg, decoder, B, n_frames=n_data,
                               n_windows=K, refine=True, eoo=True)
    out = rx(dec_params, jnp.asarray(packed))
    assert np.asarray(out["candidate"]).all()
    det = np.asarray(out["eoo_detected"])
    ef = np.asarray(out["eoo_frame"])
    win = np.asarray(out["win"])
    assert det[0], (det, ef)
    assert ef[0] == n_data - win[0], (ef, win)   # at the true position
    assert not det[1], (det, ef)                 # no false EOO on row 1


def test_rx_batch_cli_legacy_single_window(flagship, tmp_path):
    """Regression (r5 review finding): the documented one-shot flags
    (--n-windows 1 --no-refine --no-eoo) exercise the legacy tuple
    return and must not crash."""
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.tools import rx_batch

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    over = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(3)])
    s = np.concatenate([over, np.zeros(2 * tx.cfg.Nmf, np.complex64)])
    fn = tmp_path / "one.f32"
    s.astype(np.complex64).tofile(fn)
    ckpt = os.path.join(FIX, "model_fs_flagship.npz")
    rc = rx_batch.main([ckpt, str(tmp_path / "out"), str(fn),
                        "--n-windows", "1", "--no-refine", "--no-eoo"])
    assert rc == 0
    assert (tmp_path / "out" / "one_feat.f32").exists()


def test_cp_discriminator_corrects_alias_lock(flagship):
    """The in-program CP frequency discriminator (streaming CP guard's
    est_cp_foff, a capability the reference lacks): when acquisition
    locks onto the 8.33 Hz pilot-metric alias (simulated by biasing the
    refine stage), the CP correlation must measure the residual and the
    receiver must report fmax near truth and decode cleanly."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder, distortion_loss
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.ops import acquisition_op
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    n_data = 6
    over = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(n_data + 1)])
    ref = feats[: n_data * 12, :20]
    cfg = tx.cfg
    B = 2
    foff = 10.0
    alias = 1.0 / cfg.Tmf                    # 8.33 Hz
    rng = np.random.default_rng(4)
    T = 2 * cfg.Nmf + len(over) + 2 * cfg.Nmf + cfg.M + cfg.Ncp
    streams = np.zeros((B, T), np.complex64)
    n = np.arange(len(over))
    streams[:, : len(over)] = over * np.exp(
        1j * 2 * np.pi * foff * n / cfg.Fs)
    streams += 0.05 * (rng.standard_normal(streams.shape)
                       + 1j * rng.standard_normal(streams.shape))

    # bias refine by exactly one alias step to simulate the false lock
    orig = acquisition_op.make_refine

    def biased_refine(cfg_, batch, **kw):
        fn = orig(cfg_, batch, **kw)

        def wrapped(xr, xi, tmax, fmax):
            t2, f2 = fn(xr, xi, tmax, fmax)
            return t2, f2 + alias
        return wrapped

    acquisition_op.make_refine = biased_refine
    try:
        decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
        dec_params = device_put_tree(params["decoder"])
        packed = np.stack([streams.real, streams.imag],
                          -1).astype(np.float32)
        rx_on = make_batched_receiver(cfg, decoder, B, n_frames=n_data,
                                      n_windows=2, refine=True,
                                      cp_correct=True)
        rx_off = make_batched_receiver(cfg, decoder, B, n_frames=n_data,
                                       n_windows=2, refine=True,
                                       cp_correct=False)
        out_on = rx_on(dec_params, jnp.asarray(packed))
        out_off = rx_off(dec_params, jnp.asarray(packed))
    finally:
        acquisition_op.make_refine = orig

    assert np.asarray(out_on["candidate"]).all()
    # without correction the receiver reports the alias frequency
    assert abs(float(np.asarray(out_off["fmax"])[0]) - (foff + alias)) < 1.0
    # with the CP discriminator the alias is measured and removed
    f_on = np.asarray(out_on["fmax"])
    assert np.abs(f_on - foff).max() < 1.0, f_on

    def loss_of(out):
        w0 = int(np.asarray(out["win"])[0])
        hat = np.asarray(out["features"]).reshape(
            B, -1, cfg.feature_dim)[0][:, :20]
        r = ref[w0 * 12:]
        m = min(len(r), len(hat))
        return float(np.asarray(distortion_loss(
            r[None, :m], hat[None, :m]))[0])

    # and the decode through the corrected buffer is materially better
    assert loss_of(out_on) < loss_of(out_off) - 0.1, \
        (loss_of(out_on), loss_of(out_off))


def test_batched_receiver_snr_estimate(flagship):
    """Per-stream serving telemetry: the batched receiver's pilot-based
    SNR estimate must track the injected AWGN SNR within the streaming
    estimator's calibration budget (<=2 dB over the 0-10 dB range,
    tools/est_snr.py refit; reference est_snr.py is AWGN-only too)."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    n_data = 16
    over = np.concatenate(
        [tx.do_radae_tx(feats[(i * 12) % 480:(i * 12) % 480 + 12]
                        .flatten())
         for i in range(n_data + 1)])
    cfg = tx.cfg
    snrs = [0.0, 3.0, 6.0, 10.0]
    # two independent noise realisations per SNR, estimates averaged —
    # a single short over's frame-mean jitters ~1 dB
    B = 2 * len(snrs)
    T = 2 * cfg.Nmf + len(over) + 2 * cfg.Nmf + cfg.M + cfg.Ncp
    streams = np.zeros((B, T), np.complex64)
    for b in range(B):
        s = np.zeros(T, np.complex64)
        s[: len(over)] = over
        streams[b] = _noise_at_snr(s, snrs[b % len(snrs)],
                                   np.random.default_rng(70 + b))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    rx = make_batched_receiver(cfg, decoder, B, n_frames=n_data,
                               n_windows=2, refine=True)
    out = rx(dec_params, jnp.asarray(packed))
    assert np.asarray(out["candidate"]).all()
    raw = np.asarray(out["snrdB_3k"])
    est = 0.5 * (raw[: len(snrs)] + raw[len(snrs):])
    for b, snr in enumerate(snrs):
        assert abs(est[b] - snr) <= 2.0, (snrs, raw, est)
    # and it is monotone over the range
    assert (np.diff(est) > 0).all(), est


def test_windowed_receiver_never_acquires_on_noise_or_sine(flagship):
    """Negative acquisition gates for the batched path (reference ctest
    category 5, CMakeLists.txt:191-208: pass = 'Acquisition failed'):
    noise-only and sine-only streams must never clear the consecutive-
    match candidate machine across the full 12-window budget."""
    import jax.numpy as jnp
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, _ = flagship
    from radae_tpu.config import flagship_config
    cfg = flagship_config()
    K = 12
    B = 8
    T = (K + 2) * cfg.Nmf + cfg.M + cfg.Ncp
    rng = np.random.default_rng(31)
    streams = np.zeros((B, T), np.complex64)
    # rows 0-3: AWGN only; rows 4-7: strong in-band sine (+ light noise
    # so the correlator statistics are realistic)
    streams[:4] = (rng.standard_normal((4, T))
                   + 1j * rng.standard_normal((4, T)))
    t = np.arange(T)
    for b, f0 in enumerate([1000.0, 1400.0, 1500.0, 1850.0]):
        streams[4 + b] = (3.0 * np.exp(1j * 2 * np.pi * f0 * t / cfg.Fs)
                          + 0.1 * (rng.standard_normal(T)
                                   + 1j * rng.standard_normal(T)))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    rx = make_batched_receiver(cfg, decoder, B, n_frames=2,
                               n_windows=K, refine=True)
    out = rx(dec_params, jnp.asarray(packed))
    cand = np.asarray(out["candidate"])
    assert not cand.any(), (cand, np.asarray(out["fmax"]),
                            np.asarray(out["win"]))


def test_windowed_acquisition_with_sine_interferer(flagship):
    """Co-channel interference gate for the batched path (reference
    README.md:449: acquire with a -3 dBc sine within 2 s): a 16-window
    budget (1.92 s) with the interferer at carrier-band frequencies."""
    import jax.numpy as jnp
    from radae_tpu.apps.txe import RadaeTx
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.utils.hostio import device_put_tree

    params, feats = flagship
    tx = RadaeTx(params=params, auxdata=True)
    over = np.concatenate(
        [tx.do_radae_tx(feats[i * 12:(i + 1) * 12].flatten())
         for i in range(19)])
    cfg = tx.cfg
    K = 16
    B = 4
    rng = np.random.default_rng(12)
    pads = rng.integers(0, cfg.Nmf, B)
    foffs = rng.uniform(-30, 30, B)
    sine_f = [1100.0, 1450.0, 1600.0, 1900.0]
    T = (K + 2) * cfg.Nmf + cfg.M + cfg.Ncp
    S = np.sqrt((np.abs(over) ** 2).mean())
    streams = np.zeros((B, T), np.complex64)
    t = np.arange(T)
    n = np.arange(len(over))
    for b in range(B):
        sig = over * np.exp(1j * 2 * np.pi * foffs[b] * n / cfg.Fs)
        m = min(len(sig), T - pads[b])
        streams[b, pads[b]: pads[b] + m] = sig[:m]
        # -3 dBc sine interferer + 10 dB SNR noise
        streams[b] += (S * 10 ** (-3 / 20)
                       * np.exp(1j * 2 * np.pi * sine_f[b] * t / cfg.Fs))
        streams[b] = _noise_at_snr(streams[b], 10.0,
                                   np.random.default_rng(90 + b))

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dec_params = device_put_tree(params["decoder"])
    packed = np.stack([streams.real, streams.imag], -1).astype(np.float32)
    rx = make_batched_receiver(cfg, decoder, B, n_frames=2,
                               n_windows=K, refine=True)
    out = rx(dec_params, jnp.asarray(packed))
    cand = np.asarray(out["candidate"])
    tmax = np.asarray(out["tmax"])
    fmax = np.asarray(out["fmax"])
    ok = 0
    for b in range(B):
        t_err = (int(tmax[b]) - (pads[b] + cfg.Ncp)) % cfg.Nmf
        t_err = min(t_err, cfg.Nmf - t_err)
        if cand[b] and t_err <= 4 and abs(float(fmax[b]) - foffs[b]) <= 3:
            ok += 1
    assert ok >= B - 1, (ok, cand, tmax - pads - cfg.Ncp, fmax - foffs)


def test_tx_batch_rx_batch_roundtrip(flagship, tmp_path):
    """End-to-end serving CLI round trip: tx_batch encodes two feature
    files into IQ streams in one program (with EOO appended), rx_batch
    decodes them in one program — recovered features must match the
    originals within the trained model's clean decode budget."""
    from radae_tpu.models.core import distortion_loss
    from radae_tpu.tools import rx_batch, tx_batch

    params, feats = flagship
    ckpt = os.path.join(FIX, "model_fs_flagship.npz")
    lens = [8 * 12, 6 * 12]
    ffiles = []
    for k, n in enumerate(lens):
        f36 = np.zeros((n, 36), np.float32)
        f36[:, :20] = feats[k * 96:(k * 96) + n, :20]
        fn = tmp_path / f"in{k}.f32"
        f36.astype(np.float32).tofile(fn)
        ffiles.append(str(fn))

    rc = tx_batch.main([ckpt, str(tmp_path / "iq")] + ffiles)
    assert rc == 0
    iq_files = [str(tmp_path / "iq" / f"in{k}_iq.f32") for k in range(2)]
    for k, n in enumerate(lens):
        assert os.path.exists(iq_files[k])
        iq = np.fromfile(iq_files[k], np.complex64)
        # n/12 frames * Nmf samples + the EOO marker
        assert len(iq) == (n // 12) * 960 + 1152, (k, len(iq))

    rc = rx_batch.main([ckpt, str(tmp_path / "out")] + iq_files
                       + ["--n-windows", "2"])
    assert rc == 0
    for k, n in enumerate(lens):
        out = np.fromfile(tmp_path / "out" / f"in{k}_iq_feat.f32",
                          np.float32).reshape(-1, 36)
        ref = np.fromfile(ffiles[k], np.float32).reshape(-1, 36)
        assert len(out) >= n - 2 * 12, (k, len(out), n)  # ramp-in only
        # decode starts at the acquisition window; the EOO truncation
        # keeps exactly the decoded data frames, so the tail rows of ref
        # line up with out
        off = n - len(out)
        assert 0 <= off <= 2 * 12, (k, off)
        loss = float(np.asarray(distortion_loss(
            ref[None, off:off + len(out), :20],
            out[None, :, :20]))[0])
        assert loss < 0.6, (k, loss)


def test_tx_batch_fused_int8_matches_plain(flagship, tmp_path):
    """tx_batch --fused (the shipped int8 tile=512 serving config) must
    produce modem samples equivalent to the plain path within the int8
    dither ball (interpret-mode kernel on CPU)."""
    from radae_tpu.ops import fused_core
    from radae_tpu.tools import tx_batch

    params, feats = flagship
    ckpt = os.path.join(FIX, "model_fs_flagship.npz")
    f36 = np.zeros((4 * 12, 36), np.float32)
    f36[:, :20] = feats[: 4 * 12, :20]
    fn = tmp_path / "in.f32"
    f36.astype(np.float32).tofile(fn)

    assert tx_batch.main([ckpt, str(tmp_path / "plain"), str(fn)]) == 0

    orig = fused_core.make_fused_encoder_step
    fused_core.make_fused_encoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        assert tx_batch.main([ckpt, str(tmp_path / "fused"), str(fn),
                              "--fused"]) == 0
    finally:
        fused_core.make_fused_encoder_step = orig

    a = np.fromfile(tmp_path / "plain" / "in_iq.f32", np.complex64)
    b = np.fromfile(tmp_path / "fused" / "in_iq.f32", np.complex64)
    assert len(a) == len(b)
    # int8 weights wander within the trained +-1/254 activation dither;
    # bottleneck-3 samples are bounded by 1, so absolute tolerance works
    assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()


def test_barrel_shift_alignment_matches_gather_semantics():
    """The receiver's gather-free alignment (log2(Nmf) conditional static
    shifts + derotate-after-align phasor tables) must reproduce the
    derotate-then-clamped-gather reference exactly (up to sin/cos
    argument regrouping) for random per-row (tmax, fmax), including
    tmax <= Ncp (zero shift) and near-maximal shifts."""
    import jax.numpy as jnp
    from radae_tpu.config import flagship_config
    from radae_tpu.models.core import CoreDecoder
    from radae_tpu.runtime import make_batched_receiver
    from radae_tpu.ops import acquisition_op
    from radae_tpu.utils.hostio import device_put_tree

    cfg = flagship_config()
    B, NF = 8, 2
    T = cfg.Nmf + (NF + 1) * cfg.Nmf + cfg.Ncp + 2 * cfg.Nmf + cfg.M
    rng = np.random.default_rng(7)
    rx = (rng.standard_normal((B, T, 2)) * 0.3).astype(np.float32)

    # pin detect() so both paths see identical (tmax, fmax), spanning the
    # edge cases: zero shift, max shift Nmf-1, and odd/even bit patterns
    tmax = np.array([0, 5, cfg.Ncp, cfg.Ncp + 1, 511, 512,
                     cfg.Nmf - 1, 777], np.int32)[:B]
    fmax = np.array([0.0, -47.5, 12.5, 40.0, -2.5, 25.0, 5.0, -30.0],
                    np.float32)[:B]

    def fake_detect_factory(cfg_, batch, **kw):
        def detect(rx_packed):
            return (jnp.ones((batch,), bool), jnp.asarray(tmax),
                    jnp.asarray(fmax), jnp.zeros((batch,)),
                    jnp.zeros((batch,)))
        return detect

    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = device_put_tree(decoder.init(0))

    orig = acquisition_op.make_detect_pilots
    acquisition_op.make_detect_pilots = fake_detect_factory
    try:
        rxf = make_batched_receiver(cfg, decoder, B, n_frames=NF)
        feats_new, _, _, _ = rxf(params, jnp.asarray(rx))
    finally:
        acquisition_op.make_detect_pilots = orig

    # reference: derotate whole buffer, clamped-index gather, decode with
    # the same streaming step (the receiver's pre-redesign data path)
    from radae_tpu.ops import cplx
    from radae_tpu.runtime import make_streaming_rx_step
    rxc = rx[..., 0] + 1j * rx[..., 1]
    t = np.arange(T)
    frame_len = (cfg.Ns + 2) * (cfg.M + cfg.Ncp)
    step = make_streaming_rx_step(cfg, decoder, B)
    n_keep = T - cfg.Nmf
    aligned = np.zeros((B, n_keep), np.complex64)
    for b in range(B):
        der = rxc[b] * np.exp(-2j * np.pi * fmax[b] * t / cfg.Fs)
        idx = np.minimum(max(int(tmax[b]) - cfg.Ncp, 0) + np.arange(n_keep),
                         T - 1)
        aligned[b] = der[idx]
    state = decoder.zero_state(B)
    outs = []
    for f in range(NF):
        win = aligned[:, f * cfg.Nmf: f * cfg.Nmf + frame_len]
        w = np.stack([win.real, win.imag], -1).astype(np.float32)
        feats, state = step(params, jnp.asarray(w), state)
        outs.append(np.asarray(feats))
    feats_ref = np.stack(outs, 1)

    np.testing.assert_allclose(np.asarray(feats_new), feats_ref,
                               rtol=2e-3, atol=2e-3)
