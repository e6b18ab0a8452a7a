"""SNR x channel evaluation sweep, sharded over the device mesh.

Equivalent of the reference's evaluate.sh / evaluate_loop.sh harness
(reference: evaluate_loop.sh:43-53 sweeps SNR over {AWGN, MPG, MPP, MPD}
channel classes by repeatedly invoking inference), redesigned TPU-first:
the whole (SNR x channel x realisation) grid becomes ONE batch with each
row an independent channel draw, sharded over the "dp" mesh axis — the
channel-grid parallelism the reference runs as a bash loop.

Outputs a loss table per (channel, SNR) cell and optionally JSON.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from ..config import RADAEConfig
from ..models.radae import RADAE
from ..models.core import distortion_loss
from ..channel.doppler import multipath_samples
from ..parallel.mesh import make_mesh, shard_batch
from ..convert import load_checkpoint, load_torch_checkpoint
from ..utils.hostio import device_put_tree
from ..ops import cplx
from ..data.io import NB_TOTAL_FEATURES, NUM_USED_FEATURES, read_f32

CHANNELS = ["awgn", "mpg", "mpp", "mpd"]


def build_grid_batch(cfg, feats_seq, channels, EbNodB_list, reps, rng):
    """One batch row per (channel, EbNo, rep): features replicated, H/G per
    row an independent realisation."""
    B = len(channels) * len(EbNodB_list) * reps
    T = feats_seq.shape[0]
    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    n_fs = cfg.num_timesteps_at_rate_Fs(n_rs)

    feats = np.broadcast_to(feats_seq[None], (B, T, feats_seq.shape[1])).copy()
    H = np.ones((B, n_rs, cfg.Nc), np.float32)
    G = np.zeros((B, n_fs, 2), np.complex64)
    G[:, :, 0] = 1
    ebno = np.zeros((B,), np.float32)

    rows = []
    i = 0
    for ch in channels:
        for e in EbNodB_list:
            for rep in range(reps):
                ebno[i] = e
                if ch != "awgn":
                    nsec = n_fs / cfg.Fs + 1
                    _, Gs, hf_gain = multipath_samples(
                        ch, cfg.Fs, cfg.Rs_dash, cfg.Nc, nsec, rng=rng)
                    G[i] = hf_gain * Gs[:n_fs]
                rows.append((ch, e, rep))
                i += 1
    return feats, H, G, ebno, rows


def run_sweep_shard_map(model, params, feats_seq, channels, EbNodB_list,
                        reps=2, mesh=None, seed=0, metric="loss"):
    """run_sweep with *explicit* per-device programs and collectives
    (shard_map + lax.psum) instead of jit-propagated shardings.

    Each device runs the forward on its own grid rows only, reduces its
    rows into per-(channel,SNR)-cell sums via a one-hot matmul, then a
    single psum over the "dp" axis combines the partial sums across the
    mesh — the cell means come back replicated, already aggregated, so
    the host never sees per-row losses.  This is the pattern that scales
    the evaluation grid over pod slices: per-device compute + one ICI
    collective, no host-side gather of O(grid) data."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    cfg = model.cfg
    rng = np.random.default_rng(seed)
    feats, H, G, ebno, rows = build_grid_batch(cfg, feats_seq, channels,
                                               EbNodB_list, reps, rng)
    assert mesh is not None
    n_dev = mesh.devices.size

    # cell id per row (channel, EbNo); padding rows get a dead cell so
    # they never pollute a real mean
    cells = {(ch, e): i for i, (ch, e) in enumerate(
        (c, e) for c in channels for e in EbNodB_list)}
    n_cells = len(cells)
    cell_id = np.array([cells[(ch, e)] for ch, e, _ in rows], np.int32)
    pad = (-len(rows)) % n_dev
    if pad:
        feats = np.concatenate([feats, feats[:pad]])
        H = np.concatenate([H, H[:pad]])
        G = np.concatenate([G, G[:pad]])
        ebno = np.concatenate([ebno, ebno[:pad]])
        cell_id = np.concatenate([cell_id, np.full(pad, n_cells, np.int32)])
    onehot = np.eye(n_cells + 1, dtype=np.float32)[cell_id][:, :n_cells]
    Gp = cplx.pack_np(G)
    key = np.array([0, seed], np.uint32)

    def per_device(p, f, h, g, e, oh, k):
        # decorrelate the noise draws across devices: with a shared key,
        # same-shaped local draws would repeat on every device
        k = jax.random.fold_in(k, jax.lax.axis_index("dp"))
        out = model.forward(p, f, h, g, key=k, EbNodB=e)
        if metric == "ber":
            losses = out["ber_row"]
        else:
            losses = distortion_loss(f[..., :20],
                                     out["features_hat"][..., :20])
        sums = oh.T @ losses                     # (n_cells,) partial sums
        counts = oh.sum(axis=0)
        sums = jax.lax.psum(sums, "dp")          # ONE collective each
        counts = jax.lax.psum(counts, "dp")
        return sums / jnp.maximum(counts, 1.0)   # replicated cell means

    dp, rep = P("dp"), P()
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(rep, dp, dp, dp, dp, dp, rep),
                   out_specs=rep, check_vma=False)
    with mesh:
        sh = NamedSharding(mesh, P("dp"))
        args = [jax.device_put(a, sh) for a in (feats, H, Gp, ebno, onehot)]
        means = np.asarray(jax.jit(fn)(params, *args, jnp.asarray(key)))
    return {k: float(means[i]) for k, i in cells.items()}


def run_sweep(model, params, feats_seq, channels, EbNodB_list, reps=2,
              mesh=None, seed=0, metric="loss"):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = model.cfg
    rng = np.random.default_rng(seed)
    feats, H, G, ebno, rows = build_grid_batch(cfg, feats_seq, channels,
                                               EbNodB_list, reps, rng)

    # ONE compiled forward for the entire grid: EbNodB rides in as a
    # per-row tensor (models/radae.py forward EbNodB arg), so the SNR axis
    # never causes a recompile — the whole (channel x SNR x rep) grid is
    # literally one sharded batch.
    Gp = cplx.pack_np(G)
    key = np.array([0, seed], np.uint32)

    def fwd(p, f, h, g, e, k):
        out = model.forward(p, f, h, g, key=k, EbNodB=e)
        if metric == "ber":
            return out["ber_row"]
        fh = out["features_hat"]
        # per-row loss computed on device so only (B,) comes back
        return distortion_loss(f[..., :20], fh[..., :20])

    if mesh is not None:
        n_dev = mesh.devices.size
        pad = (-len(rows)) % n_dev
        fb = np.concatenate([feats, feats[:pad]]) if pad else feats
        Hb = np.concatenate([H, H[:pad]]) if pad else H
        Gb = np.concatenate([Gp, Gp[:pad]]) if pad else Gp
        eb = np.concatenate([ebno, ebno[:pad]]) if pad else ebno
        with mesh:
            batch = shard_batch(mesh, (fb, Hb, Gb, eb))
            sh = NamedSharding(mesh, P("dp"))
            out = jax.jit(
                fwd, in_shardings=(None, sh, sh, sh, sh, None),
            )(params, *batch, jnp.asarray(key))
        losses = np.asarray(out)[: len(rows)]
    else:
        losses = np.asarray(jax.jit(fwd)(
            params, feats, H, Gp, ebno, jnp.asarray(key)))

    # aggregate per (channel, EbNo)
    table = {}
    for (ch, e, rep), l in zip(rows, losses):
        table.setdefault((ch, e), []).append(float(l))
    return {k: float(np.mean(v)) for k, v in table.items()}


def write_audio_cells(model, params, feats_seq, channels, EbNodB_list,
                      outdir, seed=0, name="sample"):
    """A/B listening material per sweep cell (reference: evaluate.sh).

    For each (channel, EbNo) cell, writes next to each other:
      <name>_<E>dB_<ch>.wav      decoded RADAE audio at that operating point
      <name>_<E>dB_<ch>_ssb.wav  the SSB comparison: compressed speech +
                                 calibrated noise at the SAME C/No as the
                                 RADAE signal (via tools/ch, the independent
                                 channel/measurement path)
      <name>_<E>dB_<ch>_zREADME.txt  measured Eb/No / C/No / SNR3k / PAPR
    plus once: zz_<name>_orig.wav (clean vocoder reference) and
    zz_<name>_ssb.wav (compressed clean SSB tx signal).
    """
    import os
    import wave

    import jax

    from ..vocoder import get_vocoder, SPEECH_FS
    from .ch import analog_compressor, apply_ch

    os.makedirs(outdir, exist_ok=True)
    cfg = model.cfg
    voc = get_vocoder()
    rng = np.random.default_rng(seed)

    def write_wav(path, pcm, fs):
        pcm = np.clip(np.asarray(pcm, np.float32), -32767, 32767)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(fs))
            w.writeframes(pcm.astype(np.int16).tobytes())

    def _pad36(f20):
        """Synthesis back-ends take the full 36-float-per-frame feature
        layout (the FARGAN binary parses its input as 36-wide frames;
        the built-in vocoders read the first 20 columns)."""
        out = np.zeros((f20.shape[0], NB_TOTAL_FEATURES), np.float32)
        out[:, :f20.shape[1]] = f20
        return out

    # clean references, written once
    clean16k = np.asarray(voc.synthesize(_pad36(feats_seq[:, :20])),
                          np.float32)
    write_wav(os.path.join(outdir, f"zz_{name}_orig.wav"), clean16k,
              SPEECH_FS)
    # SSB path runs at the modem rate (8 kHz): decimate by 2 post-LPF
    from scipy.signal import decimate
    clean8k = decimate(clean16k, int(SPEECH_FS // 8000)).astype(np.float32)
    ssb_tx = analog_compressor(clean8k)
    write_wav(os.path.join(outdir, f"zz_{name}_ssb.wav"), ssb_tx, 8000)

    T = feats_seq.shape[0]
    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    n_fs = cfg.num_timesteps_at_rate_Fs(n_rs)
    fwd = jax.jit(lambda p, f, h, g, k, e:
                  model.forward(p, f, h, g, key=k, EbNodB=e))
    written = []
    for ch in channels:
        for e in EbNodB_list:
            H = model.default_H(1, n_rs)
            G = model.default_G(1, n_fs)
            if ch != "awgn":
                _, Gs, hf_gain = multipath_samples(
                    ch, cfg.Fs, cfg.Rs_dash, cfg.Nc, n_fs / cfg.Fs + 1,
                    rng=rng)
                G = cplx.pack_np((hf_gain * Gs[:n_fs])[None])
            out = fwd(params, feats_seq[None], H, G,
                      np.array([0, seed], np.uint32),
                      np.full((1,), e, np.float32))
            fh = np.asarray(out["features_hat"])[0]
            base = os.path.join(outdir, f"{name}_{e:g}dB_{ch}")
            decoded = np.asarray(voc.synthesize(_pad36(fh[:, :20])),
                                 np.float32)
            write_wav(base + ".wav", decoded, SPEECH_FS)
            # end-to-end listening proxy: fwSegSNR of the decoded audio
            # against the clean vocoder reference (utils/quality.py)
            from ..utils.quality import fwsegsnr_aligned
            q_e2e = fwsegsnr_aligned(clean16k, decoded, fs=SPEECH_FS)

            # measured RADAE operating point (tools/inference.py printout)
            tx = cplx.to_c64(out["tx"])
            sigma = float(np.asarray(out["sigma"]).flatten()[0])
            S = float(np.mean(np.abs(tx) ** 2))
            CNodB = 10 * np.log10(S * cfg.Fs / sigma ** 2)
            EbNodB_meas = CNodB + 10 * np.log10(
                cfg.M / (cfg.Fs * cfg.Nc * cfg.bps))
            SNRdB = CNodB - 10 * np.log10(3000.0)
            PAPRdB = 20 * np.log10(np.max(np.abs(tx)) / np.sqrt(S))

            # SSB at the SAME C/No: fade first, then calibrate the noise
            # density from the post-fade power (reference: evaluate.sh
            # measures RMS with --after_fade) via the independent ch path
            ssb_sig = ssb_tx.astype(np.complex64)
            if ch != "awgn":
                from ..channel.doppler import fade_two_path
                ssb_sig = fade_two_path(ssb_sig, ch, 8000, rng=rng,
                                        normalize=False)
            C_ssb = float(np.mean(np.abs(ssb_sig) ** 2))
            No_dB = 10 * np.log10(max(C_ssb, 1e-12)) - CNodB
            ssb_rx, CNo_meas = apply_ch(ssb_sig, No_dB, Fs=8000, rng=rng)
            ssb_rx = ssb_rx.real
            peak = np.abs(ssb_rx).max() + 1e-9
            write_wav(base + "_ssb.wav", ssb_rx / peak * 16384, 8000)

            with open(base + "_zREADME.txt", "w") as f:
                f.write("Waveform           EbNo  PAPR  C/No  SNR3k\n")
                f.write(f"Radio Autoencoder: {EbNodB_meas:5.2f} {PAPRdB:5.2f}"
                        f" {CNodB:5.2f} {SNRdB:5.2f}\n")
                f.write(f"SSB..............:   n/a   n/a {CNo_meas:5.2f}"
                        f" {CNo_meas - 10 * np.log10(3000.0):5.2f}\n")
                f.write(f"RADAE decoded-audio fwSegSNR vs clean reference: "
                        f"{q_e2e:5.2f} dB\n")
            written.append(base)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name", type=str)
    p.add_argument("features", type=str)
    p.add_argument("--channels", type=str, default="awgn,mpp")
    p.add_argument("--EbNodB", type=str, default="0,3,6,10")
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--auxdata", action="store_true")
    p.add_argument("--json", type=str, default="")
    p.add_argument("--n_devices", type=int, default=0)
    p.add_argument("--ber", action="store_true",
                   help="QPSK substitution BER grid instead of feature "
                        "loss (reference ofdm_sync.sh BER-vs-EbNo curves, "
                        "the whole curve as one batch)")
    p.add_argument("--shard_map", action="store_true",
                   help="explicit per-device programs + psum reduction "
                        "(requires a mesh) instead of jit-propagated "
                        "shardings")
    p.add_argument("--audio", type=str, default="",
                   help="also write per-cell A/B listening audio to this "
                        "directory: decoded RADAE wav + matched-C/No SSB "
                        "comparison wav + measured-numbers README "
                        "(reference: evaluate.sh)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    import jax

    # Native checkpoints record their model args: infer --auxdata from the
    # checkpoint so a trained-with-aux model evaluates correctly without
    # the flag (a mismatch otherwise fails deep in the encoder matmul).
    if (not args.auxdata and args.model_name not in ("", "random")
            and not args.model_name.endswith(".pth")):
        _, _meta = load_checkpoint(args.model_name)
        if _meta.get("model_args", {}).get("auxdata"):
            print("note: checkpoint was trained with auxdata; enabling it",
                  file=sys.stderr)
            args.auxdata = True

    nf = 21 if args.auxdata else 20
    common = dict(feature_dim=nf, latent_dim=args.latent_dim, EbNodB=100,
                  rate_Fs=True, pilots=True, pilot_eq=True, eq_mean6=False,
                  cyclic_prefix=0.004)
    if args.ber:
        # BER calibration waveform: bottleneck 1, no PA clip / coarse mag
        # (reference model05, test/inference_ber_awgn.sh + ofdm_sync.sh —
        # full-scale random QPSK through the bottleneck-3 tanh saturation
        # is not a calibrated constellation)
        cfg = RADAEConfig(bottleneck=1, ber_test=True, **common)
    else:
        cfg = RADAEConfig(coarse_mag=True, time_offset=-16, bottleneck=3,
                          **common)
    model = RADAE(cfg)
    if args.model_name in ("", "random"):
        params = model.init(args.seed)
    elif args.model_name.endswith(".pth"):
        params = load_torch_checkpoint(args.model_name)
    else:
        params, _ = load_checkpoint(args.model_name)
    params = device_put_tree(params)

    f = read_f32(args.features, NB_TOTAL_FEATURES)[:, :NUM_USED_FEATURES]
    T = cfg.num_10ms_times_steps_rounded_to_modem_frames(
        min(f.shape[0], int(args.seconds * 100)))
    feats_seq = f[:T].astype(np.float32)
    if args.auxdata:
        aux = -np.ones((T, 1), np.float32)
        feats_seq = np.concatenate([feats_seq, aux], axis=1)

    channels = args.channels.split(",")
    ebnos = [float(x) for x in args.EbNodB.split(",")]
    n_dev = args.n_devices or len(jax.devices())
    mesh = make_mesh(min(n_dev, len(jax.devices()))) if n_dev > 1 else None

    import time
    t0 = time.time()
    sweep = run_sweep_shard_map if args.shard_map else run_sweep
    table = sweep(model, params, feats_seq, channels, ebnos,
                  reps=args.reps, mesh=mesh, seed=args.seed,
                  metric="ber" if args.ber else "loss")
    dt = time.time() - t0

    print(f"{'channel':8s} " + " ".join(f"{e:7.1f}" for e in ebnos))
    for ch in channels:
        print(f"{ch:8s} " + " ".join(f"{table[(ch, e)]:7.3f}" for e in ebnos))
    print(f"sweep: {len(channels)*len(ebnos)*args.reps} cells in {dt:.1f}s",
          file=sys.stderr)
    if args.json:
        with open(args.json, "w") as fj:
            json.dump({f"{ch}@{e}": v for (ch, e), v in table.items()}, fj)
    if args.audio:
        import os
        name = os.path.splitext(os.path.basename(args.features))[0]
        written = write_audio_cells(model, params, feats_seq, channels,
                                    ebnos, args.audio, seed=args.seed,
                                    name=name)
        print(f"audio: {len(written)} cell pairs in {args.audio}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
