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
