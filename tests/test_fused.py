"""Pallas fused decoder kernel: exact parity with the layer-by-layer path
(interpret mode on CPU; the compiled path is exercised by bench.py on TPU)."""

import numpy as np

from radae_tpu.models.core import CoreDecoder
from radae_tpu.ops.fused_core import (
    make_fused_decoder_step, decoder_state_zero, decoder_weights)


def test_fused_decoder_parity_and_state():
    dec = CoreDecoder(80, 21)
    params = dec.init(0)
    B = 8
    step = make_fused_decoder_step(80, 21, B, tile=4, interpret=True)
    w = decoder_weights(params)
    state = decoder_state_zero(B)
    rng = np.random.default_rng(0)

    ref_state = None
    for i in range(3):      # multi-step: carried state must match too
        z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)
        f_fused, state = step(w, z, *state)
        f_ref, ref_state = dec(params, z, key=None, state=ref_state)
        np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)


def test_fused_runtime_rx_step_matches_unfused():
    import jax
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_rx_step

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = dec.init(0)
    B = 4
    rng = np.random.default_rng(1)
    rx = rng.standard_normal((B, cfg.Nmf + cfg.M + cfg.Ncp, 2)).astype(np.float32)

    step_x = make_streaming_rx_step(cfg, dec, B, fused=False)
    f_x, _ = step_x(params, rx, dec.zero_state(B))

    # interpret-mode fused path
    from radae_tpu.ops import fused_core
    orig = fused_core.make_fused_decoder_step
    fused_core.make_fused_decoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        step_f = make_streaming_rx_step(cfg, dec, B, fused=True, fused_tile=4)
        w = fused_core.decoder_weights(params)
        f_f, _ = step_f(tuple(w), rx, fused_core.decoder_state_zero(B))
    finally:
        fused_core.make_fused_decoder_step = orig
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_x),
                               rtol=1e-4, atol=1e-5)


def test_fused_rx_frame_step_matches_unfused():
    """The whole-frame kernel (demod + LS EQ + coarse mag + demap +
    decoder in ONE Pallas program) matches the op-by-op rx step, state
    carry included."""
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_rx_step
    from radae_tpu.ops.fused_core import (
        make_fused_rx_frame_step, fused_rx_weights, decoder_state_zero)

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = dec.init(0)
    B = 4
    rng = np.random.default_rng(2)

    step_x = make_streaming_rx_step(cfg, dec, B, fused=False)
    step_f = make_fused_rx_frame_step(cfg, B, tile=4, interpret=True)
    w = fused_rx_weights(params, cfg)
    st_x, st_f = None, decoder_state_zero(B)
    for _ in range(3):      # multi-frame: carried state must match too
        rx = rng.standard_normal(
            (B, cfg.Nmf + cfg.M + cfg.Ncp, 2)).astype(np.float32) * 0.5
        f_x, st_x = step_x(params, rx, st_x)
        f_f, st_f = step_f(w, rx, *st_f)
        np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_x),
                                   rtol=1e-4, atol=1e-5)


def test_fused_rx_frame_step_dma_matches_unfused():
    """The rx_dma variant (raw sample block in ANY/HBM, double-buffered
    per-row DMA into VMEM scratch) computes the same frame as the op-by-op
    step — multi-tile grid included, since each program DMAs its own row
    range."""
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_rx_step
    from radae_tpu.ops.fused_core import (
        make_fused_rx_frame_step, fused_rx_weights, decoder_state_zero)

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = dec.init(0)
    B = 8
    rng = np.random.default_rng(4)

    step_x = make_streaming_rx_step(cfg, dec, B, fused=False)
    step_d = make_fused_rx_frame_step(cfg, B, tile=4, interpret=True,
                                      rx_dma=True)
    w = fused_rx_weights(params, cfg)
    st_x, st_d = None, decoder_state_zero(B)
    for _ in range(2):
        rx = rng.standard_normal(
            (B, cfg.Nmf + cfg.M + cfg.Ncp, 2)).astype(np.float32) * 0.5
        f_x, st_x = step_x(params, rx, st_x)
        f_d, st_d = step_d(w, rx, *st_d)
        np.testing.assert_allclose(np.asarray(f_d), np.asarray(f_x),
                                   rtol=1e-4, atol=1e-5)


def test_fused_encoder_parity_and_state():
    from radae_tpu.models.core import CoreEncoder
    from radae_tpu.ops.fused_core import (
        make_fused_encoder_step, encoder_state_zero, encoder_weights)
    enc = CoreEncoder(21, 80, bottleneck=3)
    params = enc.init(0)
    B = 8
    step = make_fused_encoder_step(21, 80, B, tile=4, interpret=True)
    w = encoder_weights(params)
    state = encoder_state_zero(B)
    rng = np.random.default_rng(0)
    ref_state = None
    for i in range(3):
        feats = (rng.standard_normal((B, 12, 21)) * 0.3).astype(np.float32)
        z_f, state = step(w, feats, *state)
        z_r, ref_state = enc(params, feats, key=None, state=ref_state)
        np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_r),
                                   rtol=1e-4, atol=1e-5)


def test_fused_encoder_int8_parity():
    """int8 VMEM-resident encoder weights (per-output-column scales,
    output-side dequant — the decoder kernel's and the C runtime's
    contract): z output must stay inside the quantization dither ball
    the net is trained with (+-1/254 per layer activation), mirroring
    the decoder int8 parity bound."""
    from radae_tpu.models.core import CoreEncoder
    from radae_tpu.ops.fused_core import (
        make_fused_encoder_step, encoder_state_zero, encoder_weights)
    enc = CoreEncoder(21, 80, bottleneck=3)
    params = enc.init(0)
    B = 8
    step_f = make_fused_encoder_step(21, 80, B, tile=4, interpret=True)
    step_q = make_fused_encoder_step(21, 80, B, tile=4, quant="int8",
                                     interpret=True)
    w_f = encoder_weights(params)
    w_q = encoder_weights(params, quant="int8")
    st_f = encoder_state_zero(B)
    st_q = encoder_state_zero(B)
    rng = np.random.default_rng(3)
    worst = 0.0
    for i in range(3):
        feats = (rng.standard_normal((B, 12, 21)) * 0.3).astype(np.float32)
        z_f, st_f = step_f(w_f, feats, *st_f)
        z_q, st_q = step_q(w_q, feats, *st_q)
        worst = max(worst, float(np.abs(np.asarray(z_q)
                                        - np.asarray(z_f)).max()))
    assert worst < 0.05, worst     # dither-ball scale, not bit parity


def test_fused_runtime_tx_step_matches_unfused():
    import jax
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_tx_step
    from radae_tpu.models.core import CoreEncoder
    from radae_tpu.ops import fused_core

    cfg = flagship_config()
    enc = CoreEncoder(cfg.feature_dim, cfg.latent_dim, cfg.bottleneck)
    params = enc.init(0)
    B = 4
    rng = np.random.default_rng(2)
    feats = (rng.standard_normal((B, 12, cfg.feature_dim)) * 0.3).astype(np.float32)

    step_x = make_streaming_tx_step(cfg, enc, B, fused=False)
    tx_x, _ = step_x(params, feats, enc.zero_state(B))

    orig = fused_core.make_fused_encoder_step
    fused_core.make_fused_encoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        step_f = make_streaming_tx_step(cfg, enc, B, fused=True, fused_tile=4)
        w = fused_core.encoder_weights(params)
        tx_f, _ = step_f(tuple(w), feats, fused_core.encoder_state_zero(B))
    finally:
        fused_core.make_fused_encoder_step = orig
    np.testing.assert_allclose(np.asarray(tx_f), np.asarray(tx_x),
                               rtol=1e-4, atol=1e-5)


def test_fused_decoder_bf16_parity():
    """bf16 compute path (weights pre-cast, f32 accumulation): tracks the
    f32 reference within bf16 mantissa tolerance over carried state."""
    import jax.numpy as jnp
    dec = CoreDecoder(80, 21)
    params = dec.init(0)
    B = 8
    step = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                   compute_dtype=jnp.bfloat16)
    w = decoder_weights(params, dtype=jnp.bfloat16)
    state = decoder_state_zero(B)
    rng = np.random.default_rng(0)

    ref_state = None
    for i in range(3):
        z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)
        f_fused, state = step(w, z, *state)
        f_ref, ref_state = dec(params, z, key=None, state=ref_state)
        err = np.abs(np.asarray(f_fused) - np.asarray(f_ref))
        scale = np.abs(np.asarray(f_ref)).mean()
        assert err.max() < 0.12 * max(scale, 1.0), (i, err.max(), scale)
        assert err.mean() < 0.01 * max(scale, 1.0), (i, err.mean())


def test_fused_decoder_int8_parity():
    """int8 VMEM-resident decoder weights (per-output-column scales,
    VERDICT r3 next-step #3): the quantized kernel must track the float
    layer-by-layer decoder within the same <0.01 loss budget the C int8
    runtime is held to (tests/test_native.py::test_c_int8_decoder_parity);
    the net is trained with 8-bit activation quantization noise
    (reference: radae_base.py:80-81) precisely to tolerate this."""
    from radae_tpu.models.core import distortion_loss

    dec = CoreDecoder(80, 21)
    params = dec.init(0)
    B = 8
    step = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                   quant="int8")
    w = decoder_weights(params, quant="int8")
    assert any(np.asarray(a).dtype == np.int8 for a in w)
    state = decoder_state_zero(B)
    rng = np.random.default_rng(0)

    ref_state = None
    losses = []
    for i in range(3):
        z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)
        f_q, state = step(w, z, *state)
        f_ref, ref_state = dec(params, z, key=None, state=ref_state)
        losses.append(float(np.asarray(distortion_loss(
            np.asarray(f_ref)[..., :20], np.asarray(f_q)[..., :20])).mean()))
    assert max(losses) < 0.01, losses


def test_single_stream_step_well_under_realtime_budget():
    """The reference's real-time contract is ONE stream decoded in 120 ms
    per modem frame (reference README.md:439).  Gate the B=1 streaming rx
    step at a small fraction of that budget on the weakest target this CI
    can measure (one CPU device); the real-chip numbers live in RESULTS.md
    (0.01 ms/frame device time, ~26 ms including the relay tunnel RTT)."""
    import time
    import jax
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_rx_step

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = jax.device_put(dec.init(1))
    step = make_streaming_rx_step(cfg, dec, 1)
    rng = np.random.default_rng(0)
    rx = jax.device_put(rng.standard_normal(
        (1, cfg.Nmf + cfg.M + cfg.Ncp, 2)).astype(np.float32))
    st = dec.zero_state(1)
    f, st = step(params, rx, st)          # compile
    np.asarray(f)
    t0 = time.time()
    n = 20
    for _ in range(n):
        f, st = step(params, rx, st)
    np.asarray(f)
    per_frame = (time.time() - t0) / n
    assert per_frame < 0.060, per_frame   # half the 120 ms budget, on CPU


def test_fused_runtime_rx_step_int8_tracks_unfused():
    """The int8 composite rx step (the serving headline path:
    make_streaming_rx_step(fused=True, fused_quant='int8')) must track
    the float op-by-op receiver within the same <0.01 loss budget on the
    decoded features."""
    import jax
    from radae_tpu.config import flagship_config
    from radae_tpu.models.core import distortion_loss
    from radae_tpu.runtime import make_streaming_rx_step

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = dec.init(0)
    B = 4
    rng = np.random.default_rng(2)
    rx = rng.standard_normal((B, cfg.Nmf + cfg.M + cfg.Ncp, 2)).astype(
        np.float32)

    step_x = make_streaming_rx_step(cfg, dec, B, fused=False)
    f_x, _ = step_x(params, rx, dec.zero_state(B))

    from radae_tpu.ops import fused_core
    orig = fused_core.make_fused_decoder_step
    fused_core.make_fused_decoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        step_q = make_streaming_rx_step(cfg, dec, B, fused=True,
                                        fused_tile=4, fused_quant="int8")
        w = fused_core.decoder_weights(params, quant="int8")
        f_q, _ = step_q(tuple(w), rx, fused_core.decoder_state_zero(B))
    finally:
        fused_core.make_fused_decoder_step = orig
    loss = float(np.asarray(distortion_loss(
        np.asarray(f_x)[..., :20], np.asarray(f_q)[..., :20])).mean())
    assert loss < 0.01, loss


def test_fused_decoder_int8_quant_exclude():
    """quant_exclude keeps named matrices in full precision (unit scale
    rows keep the kernel's positional map intact): excluding EVERYTHING
    must reproduce the float kernel exactly, a partial exclusion must
    still pass the int8 parity budget, and an unmatched suffix raises."""
    import pytest

    dec = CoreDecoder(80, 21)
    params = dec.init(0)
    B = 8
    rng = np.random.default_rng(3)
    z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)

    step_q = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                     quant="int8")
    step_f = make_fused_decoder_step(80, 21, B, tile=4, interpret=True)

    all_mats = ("d1_w", "wih", "whh", "glu1_w", "glu2_w", "glu3_w",
                "glu4_w", "glu5_w", "w0", "w1", "out_w")
    w_all_excl = decoder_weights(params, quant="int8",
                                 quant_exclude=all_mats)
    f_excl, _ = step_q(w_all_excl, z, *decoder_state_zero(B))
    f_ref, _ = step_f(decoder_weights(params), z, *decoder_state_zero(B))
    np.testing.assert_allclose(np.asarray(f_excl), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)

    w_part = decoder_weights(params, quant="int8", quant_exclude=("whh",))
    f_part, _ = step_q(w_part, z, *decoder_state_zero(B))
    from radae_tpu.models.core import distortion_loss
    loss = float(np.asarray(distortion_loss(
        np.asarray(f_ref)[..., :20], np.asarray(f_part)[..., :20])).mean())
    assert loss < 0.01, loss

    with pytest.raises(ValueError, match="matched no weight name"):
        decoder_weights(params, quant="int8", quant_exclude=("w_ih",))


def test_fused_decoder_merged_parity_and_state():
    """The chain-merged kernel (27 -> 17 serial dots per z-step by fusing
    the GLU matmul with the next step's hh projection and the two conv
    taps into one dot) must match the layer-by-layer decoder exactly —
    the merges are column-wise weight concatenations, so the math is
    unchanged, including the carried state across calls."""
    dec = CoreDecoder(80, 21)
    params = dec.init(0)
    B = 8
    step = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                   merged=True)
    w = decoder_weights(params, merged=True)
    state = decoder_state_zero(B, merged=True)
    rng = np.random.default_rng(0)

    ref_state = None
    for i in range(3):      # multi-step: carried projected state too
        z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)
        f_fused, state = step(w, z, *state)
        f_ref, ref_state = dec(params, z, key=None, state=ref_state)
        np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)


def test_fused_decoder_merged_int8_matches_unmerged_int8():
    """int8 scales are per OUTPUT COLUMN, so quantizing the merged
    (concatenated) operands is bit-identical to quantizing the parts:
    the merged int8 kernel must reproduce the unmerged int8 kernel."""
    dec = CoreDecoder(80, 21)
    params = dec.init(3)
    B = 8
    rng = np.random.default_rng(2)

    step_u = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                     quant="int8")
    step_m = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                     quant="int8", merged=True)
    w_u = decoder_weights(params, quant="int8")
    w_m = decoder_weights(params, quant="int8", merged=True)
    st_u = decoder_state_zero(B)
    st_m = decoder_state_zero(B, merged=True)
    for i in range(2):
        z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)
        f_u, st_u = step_u(w_u, z, *st_u)
        f_m, st_m = step_m(w_m, z, *st_m)
        np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_u),
                                   rtol=1e-5, atol=1e-6)


def test_fused_decoder_merged_pad_matches_merged():
    """merged="pad" (scratch-x layout: x segments stored once into
    128-aligned VMEM windows, weights row-scattered with zero rows at
    the gaps) is the same math as merged=True — zero rows add exact
    0.0 to the dots, though the wider accumulation reassociates f32
    sums (~1e-6 relative).  Checked f32 and int8, with carried state
    across calls."""
    dec = CoreDecoder(80, 21)
    params = dec.init(5)
    B = 8
    rng = np.random.default_rng(7)

    for quant in (None, "int8"):
        step_m = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                         quant=quant, merged=True)
        step_p = make_fused_decoder_step(80, 21, B, tile=4, interpret=True,
                                         quant=quant, merged="pad")
        w_m = decoder_weights(params, quant=quant, merged=True)
        w_p = decoder_weights(params, quant=quant, merged="pad")
        st_m = decoder_state_zero(B, merged=True)
        st_p = decoder_state_zero(B, merged="pad")
        for i in range(2):
            z = np.tanh(rng.standard_normal((B, 3, 80))).astype(np.float32)
            f_m, st_m = step_m(w_m, z, *st_m)
            f_p, st_p = step_p(w_p, z, *st_p)
            np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_m),
                                       rtol=1e-4, atol=1e-5)
        for a, b in zip(st_p, st_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_streaming_rx_step_fused_merged_matches_unfused():
    """fused_merged plumbed through the runtime streaming rx step."""
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_rx_step
    from radae_tpu.ops import fused_core

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = dec.init(0)
    B = 4
    rng = np.random.default_rng(1)
    rx = rng.standard_normal((B, cfg.Nmf + cfg.M + cfg.Ncp, 2)) \
        .astype(np.float32)

    step_x = make_streaming_rx_step(cfg, dec, B, fused=False)
    f_x, _ = step_x(params, rx, dec.zero_state(B))

    orig = fused_core.make_fused_decoder_step
    fused_core.make_fused_decoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        step_m = make_streaming_rx_step(cfg, dec, B, fused=True,
                                        fused_tile=4, fused_merged=True)
        w = fused_core.decoder_weights(params, merged=True)
        f_m, _ = step_m(tuple(w), rx,
                        fused_core.decoder_state_zero(B, merged=True))
    finally:
        fused_core.make_fused_decoder_step = orig
    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_x),
                               rtol=1e-4, atol=1e-5)


def test_streaming_rx_step_frames_per_step_matches_chained():
    """frames_per_step=N must be bit-identical (to fp tolerance) to N
    chained fps=1 steps: each frame's EQ uses its own bracketing pilot
    rows, and the decoder state chains through z-steps regardless of the
    call boundary."""
    import jax.numpy as jnp
    from radae_tpu.config import flagship_config
    from radae_tpu.runtime import make_streaming_rx_step
    from radae_tpu.ops import fused_core

    cfg = flagship_config()
    dec = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    params = dec.init(0)
    B, fps = 4, 3
    rng = np.random.default_rng(5)
    # fps frames of contiguous stream + the closing pilot row
    n_samp = fps * cfg.Nmf + cfg.M + cfg.Ncp
    rx = rng.standard_normal((B, n_samp, 2)).astype(np.float32)

    step1 = make_streaming_rx_step(cfg, dec, B, fused=False)
    state = dec.zero_state(B)
    outs = []
    frame_win = cfg.Nmf + cfg.M + cfg.Ncp
    for f in range(fps):
        win = rx[:, f * cfg.Nmf: f * cfg.Nmf + frame_win]
        feats, state = step1(params, jnp.asarray(win), state)
        outs.append(np.asarray(feats))
    ref = np.concatenate(outs, axis=1)

    stepN = make_streaming_rx_step(cfg, dec, B, fused=False,
                                   frames_per_step=fps)
    featsN, _ = stepN(params, jnp.asarray(rx), dec.zero_state(B))
    np.testing.assert_allclose(np.asarray(featsN), ref,
                               rtol=1e-4, atol=1e-5)

    # fused merged kernel path (interpret mode), nz = fps*Nzmf
    orig = fused_core.make_fused_decoder_step
    fused_core.make_fused_decoder_step = (
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    try:
        stepF = make_streaming_rx_step(cfg, dec, B, fused=True,
                                       fused_tile=4, fused_merged=True,
                                       frames_per_step=fps)
        w = fused_core.decoder_weights(params, merged=True)
        featsF, _ = stepF(tuple(w), jnp.asarray(rx),
                          fused_core.decoder_state_zero(B, merged=True))
    finally:
        fused_core.make_fused_decoder_step = orig
    np.testing.assert_allclose(np.asarray(featsF), ref,
                               rtol=1e-4, atol=1e-5)
