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

from . import calibration
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
                          fused_merged=False,
                          n_windows: int = 1, refine: bool = False,
                          eoo: bool = False, cp_correct=None):
    """Whole-over batched receiver: ONE jitted program that acquires,
    aligns, derotates and decodes B independent raw IQ streams.

    rx(dec_params, rx_packed (B, T, 2)) ->
        (features (B, n_frames, 12, feature_dim),
         candidate (B,) bool, tmax (B,) int32, fmax (B,) float32)

    or, when any of (n_windows > 1, refine, eoo, cp_correct) is set, a
    dict with keys
    features/candidate/tmax/fmax/win plus (when eoo) eoo_detected (B,)
    bool, eoo_frame (B,) int32 (first frame position whose end-of-over
    correlation exceeds threshold; n_frames+1 if none) and eoo_bits
    (B, Nseoo*bps) soft bits demodulated from that frame.

    This is the at-scale serving path (SURVEY §7 stage 6): the per-stream
    work the product receiver does sequentially on the host
    (dsp/acquisition.py grid search -> freq correction -> frame slicing ->
    demod+EQ+decode, apps/rxe.py:128-266) expressed as fixed-shape
    batched device code — the acquisition grid is the MXU matmul op
    (ops/acquisition_op.py), alignment is a per-row gather, and the
    n_frames decode loop is a lax.scan over the streaming rx step.
    Streams whose `candidate` flag is False still produce (garbage)
    features; mask on the flag host-side.

    Product-grade acquisition options (matching the streaming receiver's
    budget, reference: rx.py:146-205, radae_rxe.py:198-248):
      * n_windows=K retries the detection grid over K successive 2-frame
        windows with the reference's search->candidate->acquired machine
        (acquire on the first run of consecutive timing-consistent hits
        — see make_detect_pilots_windowed) — the product receiver's
        once-per-120ms retry loop inside the same XLA program (K=12
        covers the 1.5 s acquisition budget, README.md:447);
      * refine=True adds the fine +-2 Hz / 0.25 Hz, +-2 sample search
        around the coarse peak (the product path runs the same stage at
        sync entry; coarse fstep=2.5 Hz alone leaves +-1.25 Hz residual);
      * eoo=True scans every frame position for the end-of-over marker
        (the 2-frame P,E..E sequence, reference: radae.py:206-222) with
        the product receiver's threshold, and demodulates the detected
        EOO frame's embedded data symbols (reference: dsp.py:513-524);
      * cp_correct=True adds the cyclic-prefix frequency discriminator
        the streaming receiver's CP guard uses (dsp/acquisition.py
        est_cp_foff — a capability the reference lacks): the pilot
        correlation metric is Tmf-periodic in frequency, so coarse+
        refine can lock an 8.33 Hz alias under fading; each OFDM
        symbol's CP repeats exactly M samples later, measuring the TRUE
        residual unambiguously within +-Fs/2M = +-25 Hz.  The residual
        is estimated from the first frames' CP windows after the fmax
        derotation (static slices, fade-weighted by construction),
        SNAPPED to the 1/Tmf alias grid (which removes the one-shot
        estimate's noise from the correction and rejects sine-interferer
        bias — see the inline comment), the buffer is re-derotated by
        the snapped step, and the reported fmax includes it.  Defaults
        to ON whenever any other product option is set.

    The extended-output dict also carries "snrdB_3k" (B,): the per-stream
    pilot-based SNR estimate in a 3 kHz bandwidth (the streaming
    receiver's serving telemetry; AWGN-calibrated like the reference's).

    T must be >= (n_windows+1)*Nmf + M + Ncp (acquisition windows) and
    >= tmax_max + (n_frames+1)*Nmf + Ncp for a full decode; short
    buffers are edge-padded (replicating the old clamped-gather
    semantics exactly).

    Known limit vs the streaming receiver: sample-clock offset.  The
    whole-over program aligns once and decodes at a fixed Nmf stride,
    so accumulated clock drift must stay inside the CP over the decode
    span — at the spec's 200 ppm that is ~20 s of over (200e-6 * 20 s *
    8 kHz = 32 samples = Ncp).  Longer overs at large ppm need the
    streaming receiver's nin slip mechanism (apps/rxe.py) or a
    host-side resample.
    """
    from .ops.acquisition_op import (make_detect_pilots,
                                     make_detect_pilots_windowed,
                                     make_refine)

    M, Ncp, Nmf, Fs, Ns = cfg.M, cfg.Ncp, cfg.Nmf, cfg.Fs, cfg.Ns
    extended = (n_windows > 1) or refine or eoo or bool(cp_correct)
    if cp_correct is None:
        cp_correct = extended       # on by default on the product path
    if n_windows > 1:
        detect_w = make_detect_pilots_windowed(cfg, batch, n_windows,
                                               frange=frange, fstep=fstep)
    else:
        detect = make_detect_pilots(cfg, batch, frange=frange, fstep=fstep)
    refine_fn = make_refine(cfg, batch) if refine else None
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
        if n_windows > 1:
            candidate, tmax, fmax, win, Dthresh = detect_w(rx_packed)
        else:
            candidate, tmax, fmax, Dthresh, _ = detect(
                rx_packed[:, : 2 * Nmf + M + Ncp])
            win = jnp.zeros((B,), jnp.int32)

        rxc = cplx.from_last(rx_packed)
        if refine_fn is not None:
            tmax, fmax = refine_fn(rxc.re, rxc.im, tmax, fmax)
        # Per-row time alignment FIRST, as a barrel shifter: tmax points
        # at the first pilot, the rx step wants the window Ncp early
        # (time_offset handling lives inside strip_cp).  The shift
        # s = tmax-Ncp < n_windows*Nmf decomposes into log2 conditional
        # STATIC shifts selected by jnp.where on the shift's bits — no
        # gather at all (a (B, T) take_along_axis was 90% of this
        # program's device time; element gathers don't vectorise on the
        # VPU, lane-aligned selects do).  Edge replication composes to
        # exactly the old clamped-index semantics: after shifting by s
        # the tail reads x[min(t+s, T-1)].
        start = jnp.maximum(tmax - Ncp, 0)
        xr, xi = rxc.re, rxc.im
        nbits = max(1, int(np.ceil(np.log2(n_windows * Nmf))))

        def shift(x, sh):
            return jnp.concatenate(
                [x[:, sh:],
                 jnp.broadcast_to(x[:, -1:], (x.shape[0], sh))], axis=1)

        for k in range(nbits):
            sh = 1 << k
            bit = (((start >> k) & 1) > 0)[:, None]
            xr = jnp.where(bit, shift(xr, sh), xr)
            xi = jnp.where(bit, shift(xi, sh), xi)
        n_keep = T - n_windows * Nmf           # worst-case usable tail
        xr, xi = xr[:, :n_keep], xi[:, :n_keep]

        # Per-row freq derotation AFTER alignment (commutes exactly: the
        # absolute-time phase -2πf(t+s)/Fs splits into a per-row constant
        # and a ramp).  The (B, n_keep) phasor ramp is the outer product
        # of a 128-wide "lo" table and a ceil(n_keep/128)-wide "hi" table
        # (t = 128·hi + lo), cutting sin/cos evaluations ~80x — the other
        # half of this program's former device time.
        def derotate(wr, wi, f_hz, offs):
            theta = -2.0 * jnp.pi * f_hz / Fs                 # (B,)
            hi_n = -(-n_keep // 128)
            a_lo = theta[:, None] * jnp.arange(128,
                                               dtype=jnp.float32)[None, :]
            a_hi = theta[:, None] * (
                128.0 * jnp.arange(hi_n, dtype=jnp.float32)[None, :]
                + offs[:, None].astype(jnp.float32))
            cl, sl = jnp.cos(a_lo), jnp.sin(a_lo)             # (B, 128)
            ch, sh_ = jnp.cos(a_hi), jnp.sin(a_hi)            # (B, hi_n)
            B_ = wr.shape[0]
            ramp_r = (ch[:, :, None] * cl[:, None, :]
                      - sh_[:, :, None] * sl[:, None, :]).reshape(
                          B_, hi_n * 128)[:, :n_keep]
            ramp_i = (ch[:, :, None] * sl[:, None, :]
                      + sh_[:, :, None] * cl[:, None, :]).reshape(
                          B_, hi_n * 128)[:, :n_keep]
            return (wr * ramp_r - wi * ramp_i,
                    wr * ramp_i + wi * ramp_r)

        ar, ai = derotate(xr, xi, fmax, start)

        if cp_correct:
            # CP frequency discriminator (streaming path's est_cp_foff):
            # each symbol's CP repeats M samples later; the aggregated
            # conj(cp)*tail phasor's angle measures the residual offset
            # unambiguously within +-Fs/2M, catching the 8.33 Hz
            # pilot-metric aliases coarse+refine can lock under fading.
            # Deep-faded symbols contribute small magnitude, so the sum
            # is fade-weighted by construction.
            d_skip = Ncp // 2                 # skip multipath ISI region
            w_cp = Ncp - d_skip
            n_sym = min(2 * (Ns + 1),
                        max(1, (n_keep - M - Ncp) // (M + Ncp)))
            cr = ci = 0.0
            for k in range(n_sym):
                st_ = k * (M + Ncp) + d_skip
                a_r = ar[:, st_: st_ + w_cp]
                a_i = ai[:, st_: st_ + w_cp]
                b_r = ar[:, st_ + M: st_ + M + w_cp]
                b_i = ai[:, st_ + M: st_ + M + w_cp]
                cr = cr + (a_r * b_r + a_i * b_i).sum(axis=1)
                ci = ci + (a_r * b_i - a_i * b_r).sum(axis=1)
            f_res = jnp.arctan2(ci, cr) * (Fs / (2.0 * jnp.pi * M))
            # The pilot metric is periodic in exactly 1/Tmf = 8.33 Hz,
            # so a genuine false lock is off by an integer number of
            # alias steps — SNAP the measured residual to that grid and
            # recenter by the exact step, only when the estimate is near
            # a nonzero multiple.  This both keeps clean locks untouched
            # (on a good lock the one-shot CP estimate is noisier than
            # refine) and rejects interferer bias: a strong in-band sine
            # has perfect CP correlation and drags the raw estimate by
            # several Hz, but not onto the alias grid.
            f_alias = float(1.0 / cfg.Tmf)
            k = jnp.round(f_res / f_alias)
            k = jnp.clip(k, -3.0, 3.0)          # CP range is +-Fs/2M
            near = jnp.abs(f_res - k * f_alias) < 3.0
            f_res = jnp.where((k != 0.0) & near, k * f_alias, 0.0)
            ar, ai = derotate(ar, ai, f_res, jnp.zeros_like(start))
            fmax = fmax + f_res

        # Pad the aligned buffer by edge replication up to every static
        # window the frame scan / EOO scan will slice — identical to the
        # old per-element clamped-gather semantics (clamp-to-last ==
        # replicate-last), but lets the windows be dynamic SLICES
        # (contiguous, vectorisable) instead of a (B, n_frames*frame_len)
        # element gather, which profiling showed dominated the aligned
        # program's device time.
        need = (n_frames - 1) * Nmf + frame_len
        if eoo:
            need = max(need, (n_frames + 1) * Nmf + Ncp + M + Ncp)
        pad_n = max(0, need - n_keep)
        if pad_n:
            ar = jnp.concatenate(
                [ar, jnp.broadcast_to(ar[:, -1:], (B, pad_n))], axis=1)
            ai = jnp.concatenate(
                [ai, jnp.broadcast_to(ai[:, -1:], (B, pad_n))], axis=1)

        def body(dec_state, k):
            off = k * Nmf
            wr = jax.lax.dynamic_slice_in_dim(ar, off, frame_len, axis=1)
            wi = jax.lax.dynamic_slice_in_dim(ai, off, frame_len, axis=1)
            feats, dec_state = step(dec_params,
                                    cplx.stack_last(cplx.C(wr, wi)),
                                    dec_state)
            return dec_state, feats

        if fused:
            from .ops.fused_core import decoder_state_zero
            state0 = decoder_state_zero(B, merged=fused_merged)
        else:
            state0 = decoder.zero_state(B)
        _, feats = jax.lax.scan(body, state0,
                                jnp.arange(n_frames, dtype=jnp.int32))
        feats = jnp.swapaxes(feats, 0, 1)
        if not extended:
            return feats, candidate, tmax, fmax
        out = {"features": feats, "candidate": candidate,
               "tmax": tmax, "fmax": fmax, "win": win,
               "snrdB_3k": _est_snr(ar, ai)}
        if eoo:
            out.update(_eoo_scan(ar, ai, Dthresh))
        return out

    _idx = pilots_ops.window3_index(cfg.Nc)
    _pmat = pilots_ops.ls_pmat(cfg.w, cfg.Fs)

    def _est_snr(ar, ai):
        """Per-stream SNR estimate (dB in a 3 kHz bandwidth) from the
        decoded frames' pilot rows — the streaming receiver's estimator
        (dsp.py:437-456 analog, dsp/streaming.py) batched: rotate each
        received pilot row by the LS channel estimate's phase, compare
        total power to the quadrature (noise-only) power, correct by the
        refit m/c line (calibration.py, shared with the C runtime), and
        average the per-frame dB values over the over (the streaming
        path's 1 s IIR equivalent)."""
        po = Ncp + cfg.time_offset
        pr = jnp.stack([ar[:, k * Nmf + po: k * Nmf + po + M]
                        for k in range(n_frames)], axis=1)    # (B, K, M)
        pi_ = jnp.stack([ai[:, k * Nmf + po: k * Nmf + po + M]
                         for k in range(n_frames)], axis=1)
        P_sym = ofdm.dft(cplx.C(pr, pi_), cfg.Wfwd)           # (B, K, Nc)
        rx_p = pilots_ops.est_pilots_ls(P_sym, cfg.P, _idx, _pmat,
                                        cfg.w, cfg.Fs)
        R = P_sym * rx_p.unit().conj()
        S1 = P_sym.abs2().sum(axis=-1)                        # (B, K)
        S2 = (R.im ** 2).sum(axis=-1) + 1e-12
        snr = jnp.maximum(S1 / (2.0 * S2) - 1.0, 0.1)
        snr_db = (10.0 * jnp.log10(snr)
                  - calibration.SNR_CAL_C) / calibration.SNR_CAL_M
        Rs = cfg.Fs / M
        snr3k = (snr_db + 10.0 * np.log10(Rs * cfg.Nc / 3000.0)
                 + 10.0 * np.log10((M + Ncp) / M))
        return snr3k.mean(axis=1)

    def _eoo_scan(ar, ai, Dthresh):
        """End-of-over detection + data demod on the aligned, derotated
        buffer.  Product analog: check_pilots' Dtmax12_eoo correlation
        against the `pend` end-pilot with the Pacq_error1 threshold
        (reference: dsp.py:300-320; EOO frame layout P,E..E
        radae.py:206-222), then receiver_one's EOO branch (simple mean-
        phase per-carrier EQ over the three known symbols) for the
        embedded data (reference: dsp.py:513-524)."""
        B = ar.shape[0]
        pe_r = np.ascontiguousarray(cfg.pend.real, np.float32)
        pe_i = np.ascontiguousarray(cfg.pend.imag, np.float32)
        K = n_frames + 1
        # windows at static offsets: frame k's pilot sits at k*Nmf + Ncp
        # after alignment; the two pend copies follow at +M+Ncp and +Nmf
        o1 = [k * Nmf + Ncp + M + Ncp for k in range(K)]
        o2 = [k * Nmf + Ncp + Nmf for k in range(K)]
        e1r = jnp.stack([ar[:, o: o + M] for o in o1], axis=1)  # (B, K, M)
        e1i = jnp.stack([ai[:, o: o + M] for o in o1], axis=1)
        e2r = jnp.stack([ar[:, o: o + M] for o in o2], axis=1)
        e2i = jnp.stack([ai[:, o: o + M] for o in o2], axis=1)

        def corr_abs(er, ei):                    # |sum conj(e) * pend|
            cr = er @ pe_r + ei @ pe_i
            ci = er @ pe_i - ei @ pe_r
            return jnp.sqrt(cr * cr + ci * ci)

        E = corr_abs(e1r, e1i) + corr_abs(e2r, e2i)          # (B, K)
        hit = E > Dthresh[:, None]
        eoo_detected = hit.any(axis=1)
        first = jnp.argmax(hit, axis=1).astype(jnp.int32)
        eoo_frame = jnp.where(eoo_detected, first, K)

        # demod the detected frame's data symbols (one EOO frame =
        # Ns+2 OFDM symbols starting at the frame boundary).  Window
        # selection is a one-hot contraction over the K static frame
        # slices — an element gather here would be the exact VPU pattern
        # the rest of this program just eliminated
        wlen = Nmf + M + Ncp
        sel = jax.nn.one_hot(jnp.clip(eoo_frame, 0, K - 1), K,
                             dtype=ar.dtype)                  # (B, K)
        wr_stack = jnp.stack([ar[:, k * Nmf: k * Nmf + wlen]
                              for k in range(K)], axis=1)     # (B, K, wlen)
        wi_stack = jnp.stack([ai[:, k * Nmf: k * Nmf + wlen]
                              for k in range(K)], axis=1)
        wr = jnp.einsum("bk,bkl->bl", sel, wr_stack)
        wi = jnp.einsum("bk,bkl->bl", sel, wi_stack)
        n_rs = wlen // (M + Ncp)                              # Ns + 2
        rxw = cplx.C(wr, wi).reshape(B, n_rs, M + Ncp)
        rx_dash = ofdm.strip_cp(rxw, M, Ncp, cfg.time_offset)
        rx_sym = ofdm.dft(rx_dash, cfg.Wfwd)                  # (B, n_rs, Nc)
        invP = (1.0 / cfg.P).astype(np.complex64)
        invPend = (1.0 / cfg.Pend).astype(np.complex64)
        Nse = Ns + 1
        s = (cplx.mul_const(rx_sym[:, 0, :], invP)
             + cplx.mul_const(rx_sym[:, 1, :], invPend)
             + cplx.mul_const(rx_sym[:, Nse, :], invPend))    # (B, Nc)
        rot = s.unit().conj()
        eq = rx_sym * cplx.C(rot.re[:, None, :], rot.im[:, None, :])
        data = eq[:, 2:Nse, :].reshape(B, -1)
        eoo_bits = ofdm.qpsk_demap(data)                      # (B, Nseoo*bps)
        return {"eoo_detected": eoo_detected, "eoo_frame": eoo_frame,
                "eoo_bits": eoo_bits}

    return jax.jit(rx)


def make_streaming_tx_step(cfg: RADAEConfig, encoder: CoreEncoder,
                           batch: int, fused: bool = False,
                           fused_tile: int = 512, fused_quant=None):
    """Jitted batched streaming tx step.

    step(enc_params, features (B, 12, F), enc_state)
      -> (tx_packed (B, Nmf, 2), new_state)

    With fused=True the encoder runs as the Pallas VMEM-resident kernel;
    enc_params/enc_state must then be the fused tuples (built with the
    same quant= flag as fused_quant here)."""
    # one modem frame: Nzmf z-vectors -> Ns data symbol rows
    n_rs = cfg.Nzmf * cfg.latent_dim // (cfg.bps * cfg.Nc)
    if fused:
        from .ops.fused_core import make_fused_encoder_step
        enc_step = make_fused_encoder_step(
            cfg.feature_dim, cfg.latent_dim, batch,
            tile=min(fused_tile, batch), bottleneck=cfg.bottleneck,
            quant=fused_quant)

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
