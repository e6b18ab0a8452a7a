"""Pallas-fused core codec steps: the whole recurrent stack in one kernel.

The streaming decode/encode step chains ~30 small matmuls per z-step (5
GRUs + 5 convs + glue) over a growing concat vector; as separate XLA ops
each one pays kernel-launch + HBM weight reads, which dominates at serving
batch sizes (~1.7M params re-read 90x per 120 ms frame).  The fused kernel
keeps ALL weights resident in VMEM (decoder ~4.4 MB, encoder ~2.4 MB, well
under the ~16 MB budget) and runs the full 3-z-step frame in one program:
weights are read from HBM once per frame instead of once per matmul.

Batch rows are tiled over the grid; each program processes `tile` rows.
State (GRU h, conv history) is carried as kernel inputs/outputs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.core import (
    _DEC_GRU_DIMS, _DEC_CONV_DIMS, _ENC_GRU_DIMS, _ENC_CONV_DIMS,
    FRAMES_PER_STEP)


def _gru_step(w_ih, b_ih, w_hh, b_hh, x, h, cd=jnp.float32,
              s_ih=None, s_hh=None):
    # weights pre-transposed to (in, out); s_* are per-output-column
    # dequant scales when the weights are int8
    xg = jnp.dot(x.astype(cd), w_ih.astype(cd),
                 preferred_element_type=jnp.float32)
    hg = jnp.dot(h.astype(cd), w_hh.astype(cd),
                 preferred_element_type=jnp.float32)
    if s_ih is not None:
        xg = xg * s_ih
    if s_hh is not None:
        hg = hg * s_hh
    xg = xg + b_ih
    hg = hg + b_hh
    H = h.shape[-1]
    r = jax.nn.sigmoid(xg[:, :H] + hg[:, :H])
    z = jax.nn.sigmoid(xg[:, H:2 * H] + hg[:, H:2 * H])
    n = jnp.tanh(xg[:, 2 * H:] + r * hg[:, 2 * H:])
    return (1.0 - z) * n + z * h


def _fused_weights(params: Dict[str, Any], side: str,
                   dtype=jnp.float32, quant=None, quant_exclude=(),
                   merged=False):
    """Flatten the param tree into an ordered tuple of arrays + names.

    dtype=bfloat16 pre-casts the weights ONCE at load time: the MXU then
    consumes them natively at 2x f32 rate with f32 accumulation, and the
    VMEM-resident weight footprint halves.  (Casting per kernel call was
    measured slower than f32 — the cast must happen here, not in-kernel.)

    quant="int8" stores every matmul operand as int8 with per-output-
    column absmax scales (the transpose of the C runtime's per-row
    scheme, native/nnet.c rn_quantize_rows): VMEM weight footprint drops
    4x and the kernel dequantizes by scaling the matmul OUTPUT — one
    (1, out) multiply per dot instead of touching the (in, out) weight.
    quant_exclude: suffixes of flattened weight names (e.g. "whh",
    "out_w", "g3_wih" — see the add/addT calls below for the full list)
    kept at full precision under quant="int8"; a suffix matching no name
    raises (it would otherwise silently quantize everything).

    merged=True (decoder only) emits the CHAIN-MERGED layout used by
    make_fused_decoder_step(merged=True): per layer the GLU matrix is
    concatenated column-wise with the NEXT-step hh projection into one
    (H, 3H+H) operand ("g{i}_wgg" = [w_hh.T | glu]) and the two conv taps
    into one (in, 2*out) operand ("c{i}_w" = [tap1 | tap0]).  Because the
    int8 scales are per OUTPUT COLUMN, quantizing the concatenation is
    bit-identical to quantizing the parts — the merged kernel reproduces
    the unmerged kernel's numerics exactly; only the serial-matmul count
    changes (27 -> 17 issues per z-step).

    merged="pad" additionally scatters the ROWS of every x-consuming
    operand (g{i}_wih, c{i}_w, out_w) onto 128-aligned segment starts
    with zero rows in the gaps, matching the padded scratch-x layout of
    make_fused_decoder_step(merged="pad"): the kernel stores each x
    segment once into a lane-aligned VMEM scratch window instead of
    re-copying the whole growing concat vector twice per layer.  Zero
    rows contribute exact 0.0 to the f32-accumulated dots (and quantize
    to int8 zeros), so the math is identical to merged=True — but the
    wider dots may REASSOCIATE the f32 accumulation, so results agree to
    ~1e-6 relative, not bit-for-bit (the parity test uses rtol=1e-4);
    the dot in-dims grow (96..736 -> 128..1408 on the x operands).

    Returns (arrs, names, scales); scales is () unless quant."""
    arrs, names, scales = [], [], []
    matched = set()

    def add(name, a):
        a = jnp.asarray(a, jnp.float32)
        if a.ndim >= 2:                 # matmul operands only; biases f32
            if quant == "int8" and any(name.endswith(x)
                                       for x in quant_exclude):
                # excluded matrices keep full precision (pre-cast to the
                # compute dtype like the unquantized path) but still emit
                # a unit scale row so the kernel's positional scale map
                # is unchanged (they pay one redundant multiply per dot)
                matched.update(x for x in quant_exclude
                               if name.endswith(x))
                arrs.append(a.astype(dtype))
                names.append(name)
                scales.append(jnp.ones((1, a.shape[1]), jnp.float32))
                return
            if quant == "int8":
                w = np.asarray(a)
                # per-column MSE-optimal scale (same search as the C
                # runtime, native/nnet.c rn_quantize_rows): absmax clips
                # nothing but wastes resolution on outliers; a few
                # sub-absmax candidates roughly halve the column MSE
                s0 = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-12)
                cands = s0[None, :] * np.concatenate(
                    [[1.0], 0.64 + 0.045 * np.arange(8)])[:, None]
                best_s, best_m = None, None
                for s in cands:
                    q = np.clip(np.round(w / s), -127, 127)
                    m = ((q * s - w) ** 2).sum(axis=0)
                    if best_s is None:
                        best_s, best_m = s.copy(), m
                    else:
                        take = m < best_m
                        best_s[take] = s[take]
                        best_m = np.minimum(best_m, m)
                q = np.clip(np.round(w / best_s), -127,
                            127).astype(np.int8)
                arrs.append(jnp.asarray(q))
                names.append(name)
                scales.append(jnp.asarray(best_s[None, :], jnp.float32))
                return
            a = a.astype(dtype)
        arrs.append(a)
        names.append(name)

    def addT(name, a):
        # pre-transpose to (in_dim, out_dim): the kernel computes x @ w
        add(name, np.ascontiguousarray(np.asarray(a).T))

    if merged and side != "decoder":
        raise ValueError("merged layout is decoder-only")
    pad = merged == "pad"

    def _pad_rows(w, widths):
        # scatter row blocks (heights `widths`, the x segments the operand
        # consumes) onto 128-aligned starts; gap rows are exact zeros
        out = np.zeros((128 * len(widths), w.shape[1]), np.float32)
        r = 0
        for j, wd in enumerate(widths):
            out[128 * j:128 * j + wd] = w[r:r + wd]
            r += wd
        assert r == w.shape[0], (r, w.shape)
        return out

    def _xsegs(n):
        # x segment widths after n (y, yc) appends: x0 then per-layer
        # GLU output (H) and conv output
        return ([_DEC_GRU_DIMS[0][0]]
                + [v for j in range(n)
                   for v in (_DEC_GRU_DIMS[j][1], _DEC_CONV_DIMS[j][1])])

    addT("d1_w", params["dense_1"]["w"]); add("d1_b", params["dense_1"]["b"])
    for i in range(1, 6):
        g = params[f"gru{i}"]
        c = params[f"conv{i}"]
        if merged:
            glu = params[f"glu{i}"]
            v = np.asarray(glu["v"]); gg = np.asarray(glu["g"])
            gw = gg[:, None] * v / np.linalg.norm(v, axis=1, keepdims=True)
            wih_t = np.ascontiguousarray(np.asarray(g["w_ih"]).T)
            add(f"g{i}_wih",
                _pad_rows(wih_t, _xsegs(i - 1)) if pad else wih_t)
            add(f"g{i}_wgg", np.concatenate(
                [np.asarray(g["w_hh"]).T, np.asarray(gw).T], axis=1))
            add(f"g{i}_bih", g["b_ih"]); add(f"g{i}_bhh", g["b_hh"])
            cw = np.concatenate(
                [np.asarray(c["w"])[:, :, 1].T,
                 np.asarray(c["w"])[:, :, 0].T], axis=1)
            add(f"c{i}_w",
                _pad_rows(cw, _xsegs(i - 1) + [_DEC_GRU_DIMS[i - 1][1]])
                if pad else cw)
            add(f"c{i}_b", c["b"])
            continue
        addT(f"g{i}_wih", g["w_ih"]); addT(f"g{i}_whh", g["w_hh"])
        add(f"g{i}_bih", g["b_ih"]); add(f"g{i}_bhh", g["b_hh"])
        if side == "decoder":
            glu = params[f"glu{i}"]
            v = np.asarray(glu["v"]); gg = np.asarray(glu["g"])
            w = gg[:, None] * v / np.linalg.norm(v, axis=1, keepdims=True)
            addT(f"glu{i}_w", w)
        c = params[f"conv{i}"]
        addT(f"c{i}_w0", np.asarray(c["w"])[:, :, 0])
        addT(f"c{i}_w1", np.asarray(c["w"])[:, :, 1])
        add(f"c{i}_b", c["b"])
    out_name = "output" if side == "decoder" else "z_dense"
    if pad:
        out_t = np.ascontiguousarray(np.asarray(params[out_name]["w"]).T)
        add("out_w", _pad_rows(out_t, _xsegs(5)))
        add("out_b", params[out_name]["b"])
    else:
        addT("out_w", params[out_name]["w"])
        add("out_b", params[out_name]["b"])
    unmatched = set(quant_exclude) - matched
    if quant == "int8" and unmatched:
        raise ValueError(
            f"quant_exclude suffixes matched no weight name: "
            f"{sorted(unmatched)}; names are {names}")
    return arrs, names, scales


def make_fused_decoder_step(latent_dim: int, feature_dim: int,
                            batch: int, tile: int = 128,
                            nz: int = 3, interpret: bool = False,
                            compute_dtype=jnp.float32, quant=None,
                            merged: bool = False):
    """Build (step, pack_state, unpack_state).

    step(weights_tuple, z (B, nz, latent), *state) ->
        (features (B, nz*4, F), *new_state)
    state = 5 GRU h (B, 96) + 5 conv hist (B, in_dim) (dilation-1 convs).

    quant="int8": weights_tuple must come from decoder_weights(...,
    quant="int8") — int8 matmul operands + trailing per-output-column
    scale rows; each dot dequantizes its OUTPUT by one (1, out) multiply.

    merged=True cuts the kernel's SERIAL matmul count 27 -> 17 per z-step
    by merging off-critical-path projections into neighbouring dots
    (weights/state must come from decoder_weights/decoder_state_zero with
    merged=True).  The step is issue-latency-bound, not FLOP-bound — the
    GRU hh-chain serialises every dot — so two always-available merges
    buy time at bit-identical numerics (column-wise weight concat):
      * h_i(k) feeds BOTH the GLU gate at step k and the hh projection of
        step k+1 -> one (H, 3H+H) dot; the projected hh row rides the
        state across frames (zero state ⇒ zero projection, b_hh re-added
        at consumption, so the zero-state contract is unchanged).
      * the conv input x(k) IS the conv history of step k+1 -> one
        (in, 2*out) dot computes this step's tap-1 and next step's tap-0;
        state carries the 32-wide projected tap instead of the up-to-704-
        wide raw history (state shrinks ~4x).

    merged="pad" = the chain-merged kernel with a PADDED SCRATCH-X
    layout: instead of re-copying the growing concat vector twice per
    layer (O(width^2) VPU copy work across the stack, part of every
    serial dot-stage's ~3.5us floor), each x segment is stored ONCE into
    a 128-aligned window of a VMEM scratch buffer and every x-consuming
    dot reads a lane-aligned prefix slice of it.  Weights must come from
    decoder_weights(merged="pad") (exact-zero rows at the pad gaps keep
    the math identical to merged=True, though the wider dots may
    reassociate the f32 sums — agreement is ~1e-6 relative, not
    bit-for-bit); segments are zero-padded to the full 128 window on
    store so no uninitialised VMEM is ever read.
    """
    assert batch % tile == 0
    n_tiles = batch // tile
    gdims = _DEC_GRU_DIMS
    cdims = _DEC_CONV_DIMS
    out_dim = FRAMES_PER_STEP * feature_dim
    pad = merged == "pad"
    SEG = 128                        # scratch-x segment stride (lane width)
    n_seg = 1 + 2 * len(gdims)       # x0 + per-layer (y, yc)

    # dense_1 + 5 x (gru4 + glu + conv3 | merged: gru4 + wgg + conv2) + out
    NW = (2 + 5 * 6 + 2) if merged else (2 + 5 * 8 + 2)
    n_state = 15 if merged else 10
    NS = (17 if merged else 27) if quant else 0  # scale row per 2-D operand
    cd = compute_dtype

    def kernel_merged(z_ref, *refs):
        if pad:
            xs = refs[-1]                        # VMEM scratch (tile, 1408)
            refs = refs[:-1]
        w = refs[:NW]
        sc = refs[NW:NW + NS]
        state_in = refs[NW + NS:NW + NS + n_state]
        out_ref = refs[NW + NS + n_state]
        state_out = refs[NW + NS + n_state + 1:]

        (d1_w, d1_b), rest = (w[0], w[1]), w[2:]
        h = [state_in[i][:] for i in range(5)]
        hgp = [state_in[5 + i][:] for i in range(5)]
        hpp = [state_in[10 + i][:] for i in range(5)]

        def dot(a, b, si=None):
            r = jnp.dot(a.astype(cd), b.astype(cd) if quant else b,
                        preferred_element_type=jnp.float32)
            if quant and si is not None:
                r = r * sc[si][:]
            return r

        def put(idx, v):
            # full-window store (value zero-padded to SEG) so pad columns
            # never hold stale VMEM data
            xs[:, SEG * idx:SEG * (idx + 1)] = jnp.pad(
                v, ((0, 0), (0, SEG - v.shape[-1])))

        for step in range(nz):
            z = z_ref[:, step, :]
            x = jnp.tanh(dot(z, d1_w[:], 0) + d1_b[:])
            if pad:
                put(0, x)
            wi = 0
            for i in range(5):
                wih, wgg, bih, bhh, cw, cb = rest[wi:wi + 6]
                wi += 6
                H = gdims[i][1]
                co = cdims[i][1]
                xin = xs[:, :SEG * (2 * i + 1)] if pad else x
                xg = dot(xin, wih[:], 1 + 3 * i) + bih[:]
                hg = hgp[i] + bhh[:]
                r = jax.nn.sigmoid(xg[:, :H] + hg[:, :H])
                zz = jax.nn.sigmoid(xg[:, H:2 * H] + hg[:, H:2 * H])
                n = jnp.tanh(xg[:, 2 * H:] + r * hg[:, 2 * H:])
                h[i] = (1.0 - zz) * n + zz * h[i]
                gh = dot(h[i], wgg[:], 2 + 3 * i)    # [hg(k+1) | glu]
                hgp[i] = gh[:, :3 * H]
                y = h[i] * jax.nn.sigmoid(gh[:, 3 * H:])
                if pad:
                    put(2 * i + 1, y)
                    cin = xs[:, :SEG * (2 * i + 2)]
                else:
                    x = jnp.concatenate([x, y], axis=-1)
                    cin = x
                cc = dot(cin, cw[:], 3 + 3 * i)      # [tap1(k) | tap0(k+1)]
                yc = jnp.tanh(hpp[i] + cc[:, :co] + cb[:])
                hpp[i] = cc[:, co:]
                if pad:
                    put(2 * i + 2, yc)
                else:
                    x = jnp.concatenate([x, yc], axis=-1)
            out_w, out_b = w[NW - 2], w[NW - 1]
            out_in = xs[:, :SEG * n_seg] if pad else x
            out_ref[:, step, :] = dot(out_in, out_w[:], 16) + out_b[:]

        for i in range(5):
            state_out[i][:] = h[i]
            state_out[5 + i][:] = hgp[i]
            state_out[10 + i][:] = hpp[i]

    def kernel(z_ref, *refs):
        nw = NW
        w = refs[:nw]
        sc = refs[nw:nw + NS]
        state_in = refs[nw + NS:nw + NS + 10]
        out_ref = refs[nw + NS + 10]
        state_out = refs[nw + NS + 11:]

        (d1_w, d1_b), rest = (w[0], w[1]), w[2:]
        h = [state_in[i][:] for i in range(5)]
        hist = [state_in[5 + i][:] for i in range(5)]

        def dot(a, b, si=None):
            r = jnp.dot(a.astype(cd), b.astype(cd) if quant else b,
                        preferred_element_type=jnp.float32)
            if quant and si is not None:
                r = r * sc[si][:]
            return r

        def s(si):
            return sc[si][:] if quant else None

        for step in range(nz):
            z = z_ref[:, step, :]
            x = jnp.tanh(dot(z, d1_w[:], 0) + d1_b[:])
            wi = 0
            for i in range(5):
                wih, whh, bih, bhh, gluw, cw0, cw1, cb = rest[wi:wi + 8]
                wi += 8
                # scale order of appearance: d1, then per layer
                # (wih, whh, glu, cw0, cw1), then out (see _fused_weights)
                h[i] = _gru_step(wih[:], bih[:], whh[:], bhh[:], x, h[i],
                                 cd=cd, s_ih=s(1 + 5 * i), s_hh=s(2 + 5 * i))
                y = h[i] * jax.nn.sigmoid(dot(h[i], gluw[:], 3 + 5 * i))
                x = jnp.concatenate([x, y], axis=-1)
                yc = jnp.tanh(dot(hist[i], cw0[:], 4 + 5 * i)
                              + dot(x, cw1[:], 5 + 5 * i) + cb[:])
                hist[i] = x
                x = jnp.concatenate([x, yc], axis=-1)
            out_w, out_b = w[nw - 2], w[nw - 1]
            feats = dot(x, out_w[:], 26) + out_b[:]
            out_ref[:, step, :] = feats

        for i in range(5):
            state_out[i][:] = h[i]
            state_out[5 + i][:] = hist[i]

    def weight_spec():
        return pl.BlockSpec(memory_space=pl.ANY)

    def step(weights, z, *state):
        nw = len(weights)
        in_specs = [pl.BlockSpec((tile, nz, latent_dim),
                                 lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(w.shape,
                                  lambda b, nd=w.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM)
                     for w in weights]
        for s in state:
            in_specs.append(pl.BlockSpec(
                (tile,) + s.shape[1:],
                lambda b, nd=s.ndim: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM))
        out_shapes = ([jax.ShapeDtypeStruct((batch, nz, out_dim), jnp.float32)]
                      + [jax.ShapeDtypeStruct(s.shape, jnp.float32)
                         for s in state])
        out_specs = ([pl.BlockSpec((tile, nz, out_dim), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((tile,) + s.shape[1:],
                                     lambda b, nd=s.ndim: (b,) + (0,) * (nd - 1),
                                     memory_space=pltpu.VMEM)
                        for s in state])
        res = pl.pallas_call(
            kernel_merged if merged else kernel,
            grid=(n_tiles,),
            in_specs=in_specs[:1] + in_specs[1:],
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=([pltpu.VMEM((tile, SEG * n_seg), jnp.float32)]
                            if pad else []),
            interpret=interpret,
        )(z, *weights, *state)
        feats, new_state = res[0], res[1:]
        B = feats.shape[0]
        feats = feats.reshape(B, nz * FRAMES_PER_STEP, feature_dim)
        return feats, new_state

    return step


def _lane_pad(n: int) -> int:
    """Round up to the TPU lane width (128) so a row of n floats occupies
    whole VMEM lanes and static column slices of this width are
    tiling-legal for Mosaic."""
    return ((n + 127) // 128) * 128


def rx_demod_consts(cfg):
    """Host-precomputed demod matrices folding the whole OFDM receive
    front-end into two matmuls (for make_fused_rx_frame_step):

    * Wbig (lane_pad(M+Ncp), Nc) complex split: the forward DFT with the
      CP-strip slice folded in as zero rows, so `rx_row @ Wbig` IS
      strip_cp+dft.  Rows are zero-padded to the lane width to match the
      kernel's padded per-symbol sample rows (see
      make_fused_rx_frame_step layout note).
    * E (Nc, Nc) complex split: the entire LS pilot estimator — known-
      pilot ratio, 3-carrier window gather, per-carrier LS projection and
      2-ray recombination (ops/pilots.py est_pilots_ls) — which is linear
      in the received pilot row, collapsed to one matrix.
    """
    from . import pilots as pilots_ops

    M, Ncp, Nc = cfg.M, cfg.Ncp, cfg.Nc
    st = Ncp + cfg.time_offset
    assert 0 <= st and st + M <= M + Ncp
    Wbig = np.zeros((_lane_pad(M + Ncp), Nc), np.complex64)
    Wbig[st:st + M] = cfg.Wfwd

    idx = pilots_ops.window3_index(Nc)
    Pmat = pilots_ops.ls_pmat(cfg.w, cfg.Fs)
    a = pilots_ops.LOCAL_PATH_DELAY_S * cfg.Fs
    phase = np.exp(-1j * np.asarray(cfg.w) * a)
    invP = 1.0 / np.asarray(cfg.P)
    E = np.zeros((Nc, Nc), np.complex64)
    for c in range(Nc):
        for k in range(3):
            j = idx[c, k]
            E[j, c] += invP[j] * (Pmat[c, 0, k] + Pmat[c, 1, k] * phase[c])

    f32 = lambda x: jnp.asarray(np.ascontiguousarray(x, np.float32))
    return (f32(Wbig.real), f32(Wbig.imag), f32(E.real), f32(E.imag))


def fused_rx_weights(params, cfg, dtype=jnp.float32):
    """Demod consts + decoder weights with dense_1 rows permuted so the
    kernel can feed [re(0..39), im(0..39)] instead of interleaved
    re/im latents (the interleave is folded into the matmul)."""
    arrs, names, _ = _fused_weights(params, "decoder", dtype=dtype)
    d1 = np.asarray(arrs[0])                    # (latent, out), pre-transposed
    L = d1.shape[0]
    perm = np.concatenate([np.arange(0, L, 2), np.arange(1, L, 2)])
    arrs[0] = jnp.asarray(np.ascontiguousarray(d1[perm]))
    return rx_demod_consts(cfg) + tuple(arrs)


def make_fused_rx_frame_step(cfg, batch: int, tile: int = 512,
                             interpret: bool = False,
                             compute_dtype=jnp.float32,
                             rx_dma: bool = False):
    """The ENTIRE streaming rx frame as ONE Pallas program: OFDM demod
    (CP strip + DFT), LS pilot EQ, coarse magnitude, QPSK demap, and the
    full 3-z-step recurrent decoder — weights and demod matrices VMEM-
    resident (runtime.make_streaming_rx_step:53-81 folded into the
    kernel; VERDICT round-1 perf backlog item).

    step(weights, rx_packed (B, (Ns+2)(M+Ncp), 2), *state)
      -> (features (B, 12, F), *state)
    weights = fused_rx_weights(params, cfg).

    rx_dma=True keeps the raw sample block in ANY/HBM and manually DMAs
    per-symbol (tile, lane_pad(M+Ncp)) rows into a double-buffered VMEM
    scratch (pltpu.make_async_copy), overlapping sample fetch with the
    demod matmuls.  This removes the rx block — the largest VMEM tenant —
    from the grid pipeline entirely (~2 MB of scratch instead), which is
    what capped the whole-frame kernel's Mosaic compile at B~1536 in
    round 2 (VERDICT r2 next-step #2).

    Sample-block layout (VERDICT r3 next-step #1): per-symbol rows are
    zero-padded host-side from M+Ncp=192 to lane_pad(192)=256 floats and
    the block is addressed as a 2-D (tile, n_rs*256) VMEM ref.  Mosaic
    tiles the last two dims (8,128); the earlier 3-D (tile, n_rs, 192)
    layout needed a size-1 slice of the 8-tiled middle dim per symbol,
    which is illegal on this backend ("Slice shape along dimension 1 must
    be aligned to tiling (8), but is 1" — BENCH_r03 tail).  With the 2-D
    layout every per-symbol slice is a static lane-aligned column window
    (start/width multiples of 128); the pad columns are zeros and the
    demod matrix rows beyond M+Ncp are zero, so the matmul result is
    unchanged."""
    assert batch % tile == 0
    n_tiles = batch // tile
    M, Ncp, Nc, Ns = cfg.M, cfg.Ncp, cfg.Nc, cfg.Ns
    n_rs = Ns + 2
    samp = M + Ncp
    samp_pad = _lane_pad(samp)
    latent = cfg.latent_dim
    feature_dim = cfg.feature_dim
    nz = cfg.Nzmf
    per_z = latent // 2                  # complex symbols per z-step
    assert Ns * Nc == nz * per_z         # frame symbols = nz z-steps
    out_dim = FRAMES_PER_STEP * feature_dim
    mag_k = float(np.abs(cfg.P[0])) / cfg.pilot_gain if cfg.bottleneck == 3 \
        else 1.0
    coarse_mag = cfg.coarse_mag
    ND = 4                        # demod consts
    NW = 2 + 5 * 8 + 2
    cd = compute_dtype

    def kernel(rxr_ref, rxi_ref, *refs):
        if rx_dma:
            sr, si, sem = refs[-3:]
            refs = refs[:-3]
        dem = refs[:ND]
        w = refs[ND:ND + NW]
        state_in = refs[ND + NW:ND + NW + 10]
        out_ref = refs[ND + NW + 10]
        state_out = refs[ND + NW + 11:]
        Wr, Wi, Er, Ei = (d[:] for d in dem)

        def dot(a, b):
            return jnp.dot(a.astype(cd), b.astype(cd),
                           preferred_element_type=jnp.float32)

        # demod: strip_cp + DFT as one matmul per symbol row, addressed as
        # static lane-aligned column windows of the host-padded 2-D sample
        # block (see factory docstring layout note).  The pad is NOT a
        # per-frame serving cost: in the scanned serving loop the pad of
        # the incoming block is outside the kernel and amounts to <1/3 of
        # one extra rx-block HBM round-trip; a pad-free DMA variant that
        # slices the UNPADDED 3-D block in HBM (untiled, so legal) was
        # tried and HANGS this backend's compile helper — same symptom as
        # round 3's original 3-D DMA variant.
        Yr, Yi = [], []
        if rx_dma:
            # rx stays in HBM; double-buffered row DMA overlapped with the
            # previous row's demod matmuls
            row0 = pl.program_id(0) * tile

            def dma(s, slot, hbm, scratch, col):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(row0, tile),
                           pl.ds(s * samp_pad, samp_pad)],
                    scratch.at[slot], sem.at[col, slot])

            dma(0, 0, rxr_ref, sr, 0).start()
            dma(0, 0, rxi_ref, si, 1).start()
            for s in range(n_rs):
                slot = s % 2
                if s + 1 < n_rs:
                    dma(s + 1, 1 - slot, rxr_ref, sr, 0).start()
                    dma(s + 1, 1 - slot, rxi_ref, si, 1).start()
                dma(s, slot, rxr_ref, sr, 0).wait()
                dma(s, slot, rxi_ref, si, 1).wait()
                xr, xi = sr[slot], si[slot]
                Yr.append(dot(xr, Wr) - dot(xi, Wi))
                Yi.append(dot(xr, Wi) + dot(xi, Wr))
        else:
            for s in range(n_rs):
                sl = slice(s * samp_pad, (s + 1) * samp_pad)
                xr, xi = rxr_ref[:, sl], rxi_ref[:, sl]
                Yr.append(dot(xr, Wr) - dot(xi, Wi))
                Yi.append(dot(xr, Wi) + dot(xi, Wr))

        # LS pilot channel estimates from the frame's two pilot rows
        hp0r = dot(Yr[0], Er) - dot(Yi[0], Ei)
        hp0i = dot(Yr[0], Ei) + dot(Yi[0], Er)
        hp1r = dot(Yr[n_rs - 1], Er) - dot(Yi[n_rs - 1], Ei)
        hp1i = dot(Yr[n_rs - 1], Ei) + dot(Yi[n_rs - 1], Er)

        if coarse_mag:
            p2 = hp0r * hp0r + hp0i * hp0i + hp1r * hp1r + hp1i * hp1i
            mag = (jnp.sqrt(0.5 * jnp.mean(p2, axis=-1, keepdims=True))
                   + 1e-6) * mag_k
            inv_mag = 1.0 / mag
        else:
            inv_mag = 1.0

        # per-data-row linear pilot interpolation + phase EQ + demap scale
        dr, di = [], []
        for s in range(1, Ns + 1):
            t = s / (Ns + 1)
            hr = hp0r * (1.0 - t) + hp1r * t
            hi = hp0i * (1.0 - t) + hp1i * t
            den = jax.lax.rsqrt(hr * hr + hi * hi + 1e-12)
            scale = den * inv_mag
            dr.append((Yr[s] * hr + Yi[s] * hi) * scale)
            di.append((Yi[s] * hr - Yr[s] * hi) * scale)

        (d1_w, d1_b), rest = (w[0], w[1]), w[2:]
        h = [state_in[i][:] for i in range(5)]
        hist = [state_in[5 + i][:] for i in range(5)]

        # flatten the data grid row-major (matches reshape(B,-1,latent/2))
        Dr = jnp.concatenate(dr, axis=-1)        # (tile, Ns*Nc)
        Di = jnp.concatenate(di, axis=-1)
        for k in range(nz):
            xz = jnp.concatenate([Dr[:, k * per_z:(k + 1) * per_z],
                                  Di[:, k * per_z:(k + 1) * per_z]], axis=-1)
            x = jnp.tanh(dot(xz, d1_w[:]) + d1_b[:])
            wi_ = 0
            for i in range(5):
                wih, whh, bih, bhh, gluw, cw0, cw1, cb = rest[wi_:wi_ + 8]
                wi_ += 8
                h[i] = _gru_step(wih[:], bih[:], whh[:], bhh[:], x, h[i],
                                 cd=cd)
                y = h[i] * jax.nn.sigmoid(dot(h[i], gluw[:]))
                x = jnp.concatenate([x, y], axis=-1)
                yc = jnp.tanh(dot(hist[i], cw0[:]) + dot(x, cw1[:]) + cb[:])
                hist[i] = x
                x = jnp.concatenate([x, yc], axis=-1)
            out_w, out_b = w[NW - 2], w[NW - 1]
            out_ref[:, k, :] = dot(x, out_w[:]) + out_b[:]

        for i in range(5):
            state_out[i][:] = h[i]
            state_out[5 + i][:] = hist[i]

    def step(weights, rx_packed, *state):
        B = rx_packed.shape[0]
        if B != batch:
            raise ValueError(
                f"fused rx step was built for batch={batch} (grid/BlockSpecs"
                f" are baked in at factory time) but got rx batch {B}")
        for s in state:
            if s.shape[0] != batch:
                raise ValueError(
                    f"fused rx step built for batch={batch} but got state "
                    f"leading dim {s.shape[0]}")
        rx = rx_packed.reshape(B, n_rs, samp, 2)
        # zero-pad each symbol row to the lane width and flatten to 2-D
        # (the pad columns meet zero demod-matrix rows; see docstring) —
        # loop-invariant in a scanned serving loop, so XLA hoists it
        rx = jnp.pad(rx, ((0, 0), (0, 0), (0, samp_pad - samp), (0, 0)))
        rxr = rx[..., 0].reshape(B, n_rs * samp_pad)
        rxi = rx[..., 1].reshape(B, n_rs * samp_pad)
        if rx_dma:
            # full arrays stay in ANY/HBM; the kernel DMAs rows itself
            in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        else:
            in_specs = [pl.BlockSpec((tile, n_rs * samp_pad),
                                     lambda b: (b, 0),
                                     memory_space=pltpu.VMEM)] * 2
        in_specs += [pl.BlockSpec(w.shape,
                                  lambda b, nd=w.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM)
                     for w in weights]
        for s in state:
            in_specs.append(pl.BlockSpec(
                (tile,) + s.shape[1:],
                lambda b, nd=s.ndim: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM))
        out_shapes = ([jax.ShapeDtypeStruct((batch, nz, out_dim), jnp.float32)]
                      + [jax.ShapeDtypeStruct(s.shape, jnp.float32)
                         for s in state])
        out_specs = ([pl.BlockSpec((tile, nz, out_dim), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((tile,) + s.shape[1:],
                                     lambda b, nd=s.ndim: (b,) + (0,) * (nd - 1),
                                     memory_space=pltpu.VMEM)
                        for s in state])
        scratch = []
        if rx_dma:
            scratch = [pltpu.VMEM((2, tile, samp_pad), jnp.float32),
                       pltpu.VMEM((2, tile, samp_pad), jnp.float32),
                       pltpu.SemaphoreType.DMA((2, 2))]
        res = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            interpret=interpret,
        )(rxr, rxi, *weights, *state)
        feats, new_state = res[0], res[1:]
        feats = feats.reshape(batch, nz * FRAMES_PER_STEP, feature_dim)
        return feats, new_state

    return step


def decoder_state_zero(batch, merged=False):
    s = [jnp.zeros((batch, gh), jnp.float32) for _, gh in _DEC_GRU_DIMS]
    if merged:
        # projected next-step hh rows + projected conv tap-0 rows (both
        # zero at zero h/history; biases are re-added at consumption)
        s += [jnp.zeros((batch, 3 * gh), jnp.float32)
              for _, gh in _DEC_GRU_DIMS]
        s += [jnp.zeros((batch, co), jnp.float32)
              for _, co, _ in _DEC_CONV_DIMS]
    else:
        s += [jnp.zeros((batch, cin), jnp.float32)
              for cin, _, _ in _DEC_CONV_DIMS]
    return tuple(s)


def decoder_weights(params, dtype=jnp.float32, quant=None,
                    quant_exclude=(), merged=False):
    arrs, _, scales = _fused_weights(params, "decoder", dtype=dtype,
                                     quant=quant,
                                     quant_exclude=quant_exclude,
                                     merged=merged)
    return tuple(arrs) + tuple(scales)


def make_fused_encoder_step(feature_dim: int, latent_dim: int,
                            batch: int, tile: int = 512,
                            nz: int = 3, bottleneck: int = 3,
                            quant=None, compute_dtype=jnp.float32,
                            interpret: bool = False):
    """Fused encoder step: features (B, nz*4, F) -> z (B, nz, latent).

    Mirrors make_fused_decoder_step for the encoder stack (no GLU; conv
    dilations 1,2,2,2,2 carried as per-layer history rings).  quant="int8"
    takes weights from encoder_weights(quant="int8") — int8 operands with
    trailing per-output-column scale rows, output-side dequant, the same
    contract as the decoder kernel and the C runtime.

    Round-5 layout fix: the original kernel carried each conv-history
    ring as a 3-D (tile, d, cin) VMEM block, whose size-1 slices of the
    (8,128)-tiled middle dim do not lower through Mosaic on the v5-lite
    relay (the identical failure mode the whole-frame rx kernel had).
    The ring is now FLAT 2-D (tile, d*ceil128(cin)) with each tap in a
    128-aligned column window (zero columns in the gaps, same recipe as
    make_fused_rx_frame_step's padded symbol rows), so every tap access
    is a static lane-aligned 2-D slice.  encoder_state_zero emits the
    flat layout.

    Measured keep-or-retire (round 5, work/sweep_enc{,2,3,4}.log — four
    sessions of same-session interleaves at B=2048, scan=256): plain XLA
    tx 1.27-1.41M audio-s/s; fused f32 tile=256 1.48-1.62M (consistent
    same-session win, within-session controls stable to <1%); fused f32
    tile=512 swings 1.32-1.68M between sessions; **fused int8 tile=512
    1.67-1.72M reproducibly across sessions** — int8's 4x VMEM shrink
    appears to stabilise the big tile, and it beats every same-session
    f32 rung by +3-6%.  Batch tx serving default: quant="int8",
    tile=512 (~+25-30% over plain XLA).  (Single-stream tx B=1 stays on
    the plain XLA path: a tile-1 kernel has no batch to fill the MXU
    with.)"""
    assert batch % tile == 0
    n_tiles = batch // tile
    dils = [d for _, _, d in _ENC_CONV_DIMS]
    cins = [cin for cin, _, _ in _ENC_CONV_DIMS]
    c128s = [-(-cin // 128) * 128 for cin in cins]   # per-tap window width
    in_dim = FRAMES_PER_STEP * feature_dim

    NW = 2 + 5 * 7 + 2      # dense_1 + 5 x (gru4 + conv3) + z_dense
    NS = 22 if quant else 0  # scale row per 2-D operand (encoder_weights)
    cd = compute_dtype

    def kernel(f_ref, *refs):
        w = refs[:NW]
        sc = refs[NW:NW + NS]
        state_in = refs[NW + NS:NW + NS + 10]
        out_ref = refs[NW + NS + 10]
        state_out = refs[NW + NS + 11:]

        d1_w, d1_b = w[0], w[1]
        rest = w[2:]
        h = [state_in[i][:] for i in range(5)]
        # flat history ring: hist[i] is (tile, d*c128); tap t occupies the
        # 128-aligned window [t*c128, t*c128+cin) with exact-zero pad
        # columns in the gap; window 0 is the oldest tap (d steps ago)
        hist = [state_in[5 + i][:] for i in range(5)]

        def dot(a, b, si=None):
            r = jnp.dot(a.astype(cd), b.astype(cd) if quant else b,
                        preferred_element_type=jnp.float32)
            if quant and si is not None:
                r = r * sc[si][:]
            return r

        def s(si):
            return sc[si][:] if quant else None

        for step in range(nz):
            f = f_ref[:, step, :]
            x = jnp.tanh(dot(f, d1_w[:], 0) + d1_b[:])
            wi = 0
            for i in range(5):
                wih, whh, bih, bhh, cw0, cw1, cb = rest[wi:wi + 7]
                wi += 7
                # scale order of appearance: d1, per layer
                # (wih, whh, cw0, cw1), then out (see _fused_weights)
                h[i] = _gru_step(wih[:], bih[:], whh[:], bhh[:], x, h[i],
                                 cd=cd, s_ih=s(1 + 4 * i),
                                 s_hh=s(2 + 4 * i))
                x = jnp.concatenate([x, h[i]], axis=-1)
                cin, c128 = cins[i], c128s[i]
                x_old = hist[i][:, :cin]             # oldest tap window
                yc = jnp.tanh(dot(x_old, cw0[:], 3 + 4 * i)
                              + dot(x, cw1[:], 4 + 4 * i) + cb[:])
                xp = (x if cin == c128 else
                      jnp.pad(x, ((0, 0), (0, c128 - cin))))
                if dils[i] == 1:
                    hist[i] = xp
                else:
                    hist[i] = jnp.concatenate([hist[i][:, c128:], xp],
                                              axis=1)
                x = jnp.concatenate([x, yc], axis=-1)
            out_w, out_b = w[NW - 2], w[NW - 1]
            z = dot(x, out_w[:], 21) + out_b[:]
            if bottleneck == 1:
                z = jnp.tanh(z)
            out_ref[:, step, :] = z

        for i in range(5):
            state_out[i][:] = h[i]
            state_out[5 + i][:] = hist[i]

    def step(weights, feats, *state):
        B, T, F = feats.shape
        feats = feats.reshape(B, nz, in_dim)
        in_specs = [pl.BlockSpec((tile, nz, in_dim), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(w.shape,
                                  lambda b, nd=w.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM)
                     for w in weights]
        for s in state:
            in_specs.append(pl.BlockSpec(
                (tile,) + s.shape[1:],
                lambda b, nd=s.ndim: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM))
        out_shapes = ([jax.ShapeDtypeStruct((batch, nz, latent_dim), jnp.float32)]
                      + [jax.ShapeDtypeStruct(s.shape, jnp.float32)
                         for s in state])
        out_specs = ([pl.BlockSpec((tile, nz, latent_dim),
                                   lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((tile,) + s.shape[1:],
                                     lambda b, nd=s.ndim: (b,) + (0,) * (nd - 1),
                                     memory_space=pltpu.VMEM)
                        for s in state])
        res = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(feats, *weights, *state)
        return res[0], res[1:]

    return step


def encoder_state_zero(batch):
    # conv-history rings in the FLAT 2-D layout the kernel uses: tap t of
    # layer i in the 128-aligned window [t*c128, t*c128+cin), zero pads
    s = [jnp.zeros((batch, gh), jnp.float32) for _, gh in _ENC_GRU_DIMS]
    s += [jnp.zeros((batch, d * (-(-cin // 128) * 128)), jnp.float32)
          for cin, _, d in _ENC_CONV_DIMS]
    return tuple(s)


def encoder_weights(params, dtype=jnp.float32, quant=None,
                    quant_exclude=()):
    arrs, _, scales = _fused_weights(params, "encoder", dtype=dtype,
                                     quant=quant,
                                     quant_exclude=quant_exclude)
    return tuple(arrs) + tuple(scales)
