"""Batched streaming pipelines — the serving hot path.

The streaming receiver decodes one 120 ms modem frame per step; throughput
on TPU comes from batching that step across independent streams (channel
realisations / users), which keeps the MXU busy despite the sequential
GRU recurrence (SURVEY §7 "hard parts").  These helpers build the jitted
fixed-shape step functions:

  rx step: (B, Nmf+M+Ncp) samples -> demod + LS pilot EQ -> stateful
           core decoder -> (B, 12, F) features        (radae_rxe hot path)
  tx step: (B, 12, F) features -> stateful core encoder -> OFDM mod
           -> (B, Nmf) samples                         (radae_txe hot path)

Inputs/outputs are packed (..., 2) float arrays for complex quantities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import RADAEConfig
from .models.core import CoreEncoder, CoreDecoder
from .ops import cplx, ofdm
from .ops import pilots as pilots_ops


def make_streaming_rx_step(cfg: RADAEConfig, decoder: CoreDecoder,
                           batch: int, fused: bool = False,
                           fused_tile: int = 512, fused_dtype=None,
                           fused_quant=None, fused_merged=False,
                           frames_per_step: int = 1):
    """Jitted batched streaming rx step.

    step(dec_params, rx_packed (B, fps*Nmf+M+Ncp, 2), dec_state)
      -> (features (B, fps*12, feature_dim), new_state)

    Mirrors receiver_one + stateful decoder (reference: radae_rxe.py:236,
    304; dsp.py:487-512) batched over B independent streams.

    With fused=True the decoder runs as the Pallas VMEM-resident kernel
    (ops/fused_core.py); dec_params must then be the fused weights tuple
    and dec_state the fused state tuple (both built with the SAME
    merged= flag as fused_merged here — True for the chain-merged kernel
    variant with ~40% fewer serial matmul issues, "pad" for chain-merged
    plus the padded scratch-x layout; see make_fused_decoder_step).

    frames_per_step=N demodulates and decodes N consecutive modem frames
    per call — bit-identical to N chained fps=1 calls (each frame's EQ
    still uses ITS OWN two bracketing pilot rows; the shared boundary
    pilot is the same DFT either way) but with 1/N the per-call/per-scan
    overhead: one big DFT matmul, one pilot LS solve, one decoder kernel
    invocation (nz = N*Nzmf) whose weights are read from HBM once per N
    frames instead of once per frame."""
    Ns = cfg.Ns
    fps = int(frames_per_step)
    assert fps >= 1
    idx = pilots_ops.window3_index(cfg.Nc)
    pmat = pilots_ops.ls_pmat(cfg.w, cfg.Fs)
    if fused:
        from .ops.fused_core import make_fused_decoder_step
        tile = min(fused_tile, batch)
        kw = {} if fused_dtype is None else {"compute_dtype": fused_dtype}
        dec_step = make_fused_decoder_step(cfg.latent_dim, cfg.feature_dim,
                                           batch, tile=tile,
                                           quant=fused_quant,
                                           merged=fused_merged,
                                           nz=fps * cfg.Nzmf, **kw)
    # symbol-row indices: pilots at f*(Ns+1) for f in 0..fps; data rows
    # of frame f are f*(Ns+1)+1 .. f*(Ns+1)+Ns
    pil_idx = tuple(f * (Ns + 1) for f in range(fps + 1))
    dat_idx = np.concatenate([f * (Ns + 1) + 1 + np.arange(Ns)
                              for f in range(fps)])

    def step(dec_params, rx_packed, dec_state):
        B = rx_packed.shape[0]
        rx = cplx.from_last(rx_packed)              # (B, fps*Nmf + M+Ncp)
        n_rs = rx.shape[1] // (cfg.M + cfg.Ncp)     # fps*(Ns+1) + 1
        assert n_rs == fps * (Ns + 1) + 1, (n_rs, fps)
        rx = rx.reshape(B, n_rs, cfg.M + cfg.Ncp)
        rx_dash = ofdm.strip_cp(rx, cfg.M, cfg.Ncp, cfg.time_offset)
        rx_sym = ofdm.dft(rx_dash, cfg.Wfwd)        # (B, n_rs, Nc)

        pilot_rows = rx_sym[:, pil_idx, :]          # (B, fps+1, Nc)
        rx_pilots = pilots_ops.est_pilots_ls(pilot_rows, cfg.P, idx, pmat,
                                             cfg.w, cfg.Fs)
        p0 = rx_pilots[:, :-1, :]                   # (B, fps, Nc)
        p1 = rx_pilots[:, 1:, :]
        slope = (p1 - p0) * (1.0 / (Ns + 1))
        steps = jnp.arange(1, Ns + 1, dtype=jnp.float32)[None, None, :, None]
        rx_ch = p0[:, :, None, :] + slope[:, :, None, :] * steps
        data = rx_sym[:, dat_idx, :].reshape(
            (B, fps, Ns, cfg.Nc)) * rx_ch.unit().conj()
        if cfg.coarse_mag:
            # per frame, from its own two bracketing pilot rows (exactly
            # the fps=1 math)
            p2 = 0.5 * (p0.abs2().mean(axis=-1) + p1.abs2().mean(axis=-1))
            mag = jnp.sqrt(p2) + 1e-6               # (B, fps)
            if cfg.bottleneck == 3:
                mag = mag * float(np.abs(cfg.P[0])) / cfg.pilot_gain
            data = data * (1.0 / mag)[:, :, None, None]

        z_hat = ofdm.qpsk_demap(data.reshape(B, -1, cfg.latent_dim // 2))
        if fused:
            z_hat = z_hat.reshape(B, fps * cfg.Nzmf, cfg.latent_dim)
            features, dec_state = dec_step(dec_params, z_hat, *dec_state)
        else:
            features, dec_state = decoder(dec_params, z_hat, key=None,
                                          state=dec_state)
        return features, dec_state

    return jax.jit(step)


def make_batched_receiver(cfg: RADAEConfig, decoder: CoreDecoder,
                          batch: int, n_frames: int,
                          frange: float = 100.0, fstep: float = 2.5,
                          fused: bool = False, fused_tile: int = 512,
                          fused_quant=None, fused_dtype=None,
                          fused_merged=False):
    """Whole-over batched receiver: ONE jitted program that acquires,
    aligns, derotates and decodes B independent raw IQ streams.

    rx(dec_params, rx_packed (B, T, 2)) ->
        (features (B, n_frames, 12, feature_dim),
         candidate (B,) bool, tmax (B,) int32, fmax (B,) float32)

    This is the at-scale serving path (SURVEY §7 stage 6): the per-stream
    work the product receiver does sequentially on the host
    (dsp/acquisition.py grid search -> freq correction -> frame slicing ->
    demod+EQ+decode, apps/rxe.py:128-266) expressed as fixed-shape
    batched device code — the acquisition grid is the MXU matmul op
    (ops/acquisition_op.py), alignment is a per-row gather, and the
    n_frames decode loop is a lax.scan over the streaming rx step.
    Streams whose `candidate` flag is False still produce (garbage)
    features; mask on the flag host-side.

    T must be >= 2*Nmf + M + Ncp (acquisition window) and
    >= tmax_max + (n_frames+1)*Nmf + Ncp; pad with zeros if short.
    """
    from .ops.acquisition_op import make_detect_pilots

    M, Ncp, Nmf, Fs, Ns = cfg.M, cfg.Ncp, cfg.Nmf, cfg.Fs, cfg.Ns
    detect = make_detect_pilots(cfg, batch, frange=frange, fstep=fstep)
    # fused=True runs the n_frames decode scan through the Pallas
    # VMEM-resident decoder (optionally int8); dec_params must then be the
    # fused weights tuple (ops.fused_core.decoder_weights(quant=...)).
    # fused_merged forwards verbatim to make_streaming_rx_step: False,
    # True (chain-merged kernel) or "pad" (chain-merged + padded
    # scratch-x) — weights/state must be built with the same flag.
    step = make_streaming_rx_step(cfg, decoder, batch, fused=fused,
                                  fused_tile=fused_tile,
                                  fused_quant=fused_quant,
                                  fused_dtype=fused_dtype,
                                  fused_merged=fused_merged)
    frame_len = (Ns + 2) * (M + Ncp)          # rx-step window incl. next pilot

    def rx(dec_params, rx_packed):
        B, T = rx_packed.shape[0], rx_packed.shape[1]
        if fused and B != batch:
            # the Pallas decoder bakes grid=batch//tile and its output
            # shapes at factory time; a different runtime batch would
            # silently leave state rows unwritten (the unfused path is
            # batch-dynamic and has no such constraint)
            raise ValueError(
                f"fused batched receiver was built for batch={batch} "
                f"but got rx batch {B}")
        candidate, tmax, fmax, _, _ = detect(
            rx_packed[:, : 2 * Nmf + M + Ncp])

        rxc = cplx.from_last(rx_packed)
        # Per-row time alignment FIRST, as a barrel shifter: tmax points
        # at the first pilot, the rx step wants the window Ncp early
        # (time_offset handling lives inside strip_cp).  The shift
        # s = tmax-Ncp < Nmf decomposes into log2(Nmf) conditional STATIC
        # shifts selected by jnp.where on the shift's bits — no gather at
        # all (a (B, T) take_along_axis was 90% of this program's device
        # time; element gathers don't vectorise on the VPU, lane-aligned
        # selects do).  Edge replication composes to exactly the old
        # clamped-index semantics: after shifting by s the tail reads
        # x[min(t+s, T-1)].
        start = jnp.maximum(tmax - Ncp, 0)
        xr, xi = rxc.re, rxc.im
        nbits = max(1, int(np.ceil(np.log2(Nmf))))

        def shift(x, sh):
            return jnp.concatenate(
                [x[:, sh:],
                 jnp.broadcast_to(x[:, -1:], (x.shape[0], sh))], axis=1)

        for k in range(nbits):
            sh = 1 << k
            bit = (((start >> k) & 1) > 0)[:, None]
            xr = jnp.where(bit, shift(xr, sh), xr)
            xi = jnp.where(bit, shift(xi, sh), xi)
        n_keep = T - Nmf                       # worst-case usable tail
        xr, xi = xr[:, :n_keep], xi[:, :n_keep]

        # Per-row freq derotation AFTER alignment (commutes exactly: the
        # absolute-time phase -2πf(t+s)/Fs splits into a per-row constant
        # and a ramp).  The (B, n_keep) phasor ramp is the outer product
        # of a 128-wide "lo" table and a ceil(n_keep/128)-wide "hi" table
        # (t = 128·hi + lo), cutting sin/cos evaluations ~80x — the other
        # half of this program's former device time.
        theta = -2.0 * jnp.pi * fmax / Fs                     # (B,)
        hi_n = -(-n_keep // 128)
        a_lo = theta[:, None] * jnp.arange(128, dtype=jnp.float32)[None, :]
        a_hi = theta[:, None] * (
            128.0 * jnp.arange(hi_n, dtype=jnp.float32)[None, :]
            + start[:, None].astype(jnp.float32))
        cl, sl = jnp.cos(a_lo), jnp.sin(a_lo)                 # (B, 128)
        ch, sh_ = jnp.cos(a_hi), jnp.sin(a_hi)                # (B, hi_n)
        B_ = xr.shape[0]
        ramp_r = (ch[:, :, None] * cl[:, None, :]
                  - sh_[:, :, None] * sl[:, None, :]).reshape(
                      B_, hi_n * 128)[:, :n_keep]
        ramp_i = (ch[:, :, None] * sl[:, None, :]
                  + sh_[:, :, None] * cl[:, None, :]).reshape(
                      B_, hi_n * 128)[:, :n_keep]
        aligned = cplx.C(xr * ramp_r - xi * ramp_i,
                         xr * ramp_i + xi * ramp_r)

        # frame windows (B, n_frames, frame_len) by gather, then scan
        f_idx = (jnp.arange(n_frames, dtype=jnp.int32)[:, None] * Nmf
                 + jnp.arange(frame_len, dtype=jnp.int32)[None, :])
        f_idx = jnp.minimum(f_idx, n_keep - 1)

        def body(dec_state, fi):
            win = cplx.C(jnp.take(aligned.re, fi, axis=1),
                         jnp.take(aligned.im, fi, axis=1))
            feats, dec_state = step(dec_params, cplx.stack_last(win),
                                    dec_state)
            return dec_state, feats

        if fused:
            from .ops.fused_core import decoder_state_zero
            state0 = decoder_state_zero(B, merged=fused_merged)
        else:
            state0 = decoder.zero_state(B)
        _, feats = jax.lax.scan(body, state0, f_idx)
        return jnp.swapaxes(feats, 0, 1), candidate, tmax, fmax

    return jax.jit(rx)


def make_streaming_tx_step(cfg: RADAEConfig, encoder: CoreEncoder,
                           batch: int, fused: bool = False,
                           fused_tile: int = 512):
    """Jitted batched streaming tx step.

    step(enc_params, features (B, 12, F), enc_state)
      -> (tx_packed (B, Nmf, 2), new_state)

    With fused=True the encoder runs as the Pallas VMEM-resident kernel;
    enc_params/enc_state must then be the fused tuples."""
    # one modem frame: Nzmf z-vectors -> Ns data symbol rows
    n_rs = cfg.Nzmf * cfg.latent_dim // (cfg.bps * cfg.Nc)
    if fused:
        from .ops.fused_core import make_fused_encoder_step
        enc_step = make_fused_encoder_step(
            cfg.feature_dim, cfg.latent_dim, batch,
            tile=min(fused_tile, batch), bottleneck=cfg.bottleneck)

    def step(enc_params, features, enc_state):
        B = features.shape[0]
        if fused:
            z, enc_state = enc_step(enc_params, features, *enc_state)
            z = z.reshape(B, -1, cfg.latent_dim)
        else:
            z, enc_state = encoder(enc_params, features, key=None,
                                   state=enc_state)
        tx_sym = ofdm.qpsk_map(z)
        if cfg.bottleneck == 2:
            tx_sym = ofdm.magnitude_bottleneck(tx_sym)
        tx_sym = tx_sym.reshape(B, n_rs, cfg.Nc)
        tx_sym = ofdm.insert_pilots(tx_sym, cfg.P, cfg.pilot_gain, cfg.Ns)
        tx = ofdm.idft(tx_sym, cfg.Winv)
        tx = ofdm.add_cp(tx, cfg.Ncp)
        tx = tx.reshape(B, -1)
        if cfg.bottleneck == 3:
            tx = ofdm.magnitude_bottleneck(tx)
        return cplx.stack_last(tx), enc_state

    return jax.jit(step)
