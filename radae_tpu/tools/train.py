"""Training CLI: mirrors the reference train.py workflow on a TPU mesh.

Per-epoch checkpoints carrying model/dataset args (reference:
train.py:80-101,298-303), Adam(0.8,0.95) with 1/(1+decay*step) LR decay,
per-sequence Eb/No range draws, optional auxdata BER reporting, and the
loss-vs-Eq/No evaluation mode (--plot_EqNo, reference: train.py:161-226).

Data-parallel over the available device mesh: batch rows sharded, params
replicated (see radae_tpu/parallel)."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..config import RADAEConfig
from ..models.radae import RADAE
from ..data.dataset import RADAEDataset
from ..parallel.mesh import make_mesh, shard_batch
from ..parallel.trainstep import make_train_step, make_eval_step
from ..convert import save_checkpoint, load_checkpoint
from ..utils.hostio import device_put_tree
from ..ops import cplx


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("features", type=str)
    p.add_argument("output", type=str)
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--EbNodB", type=float, default=0)
    p.add_argument("--range_EbNo", action="store_true")
    p.add_argument("--range_EbNo_start", type=float, default=-6.0)
    p.add_argument("--h_file", type=str, default="")
    p.add_argument("--g_file", type=str, default="")
    p.add_argument("--rate_Fs", action="store_true")
    p.add_argument("--freq_rand", action="store_true")
    p.add_argument("--gain_rand", action="store_true")
    p.add_argument("--bottleneck", type=int, default=1)
    p.add_argument("--pilots", action="store_true")
    p.add_argument("--pilot_eq", action="store_true")
    p.add_argument("--eq_ls", action="store_true")
    p.add_argument("--cp", type=float, default=0.0)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--sequence-length", type=int, default=256)
    p.add_argument("--lr-decay-factor", type=float, default=2.5e-5)
    p.add_argument("--initial-checkpoint", type=str, default=None)
    p.add_argument("--plot_EqNo", type=str, default="")
    p.add_argument("--auxdata", action="store_true")
    p.add_argument("--aux_weight_boost", type=float, default=1.0,
                   help="training-time extra weight on the aux symbol loss")
    p.add_argument("--n_devices", type=int, default=0,
                   help="devices for the dp mesh (0 = all)")
    p.add_argument("--scan-steps", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan "
                        "over stacked minibatches): amortises per-call "
                        "dispatch latency on relay-tunnelled TPUs; "
                        "epoch-end leftover groups are dropped "
                        "(deterministic, like the reference's drop_last)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    num_features = 21 if args.auxdata else 20
    cfg = RADAEConfig(
        feature_dim=num_features, latent_dim=args.latent_dim,
        EbNodB=args.EbNodB, range_EbNo=args.range_EbNo,
        range_EbNo_start=args.range_EbNo_start, rate_Fs=args.rate_Fs,
        freq_rand=args.freq_rand, gain_rand=args.gain_rand,
        bottleneck=args.bottleneck, pilots=args.pilots,
        pilot_eq=args.pilot_eq, eq_mean6=not args.eq_ls,
        cyclic_prefix=args.cp)
    model = RADAE(cfg)
    print(cfg.summary(), file=sys.stderr)

    params = model.init(args.seed)
    start_epoch = 1
    if args.initial_checkpoint:
        params, meta = load_checkpoint(args.initial_checkpoint)
        start_epoch = int(meta.get("epoch", 0)) + 1
        print(f"Loaded {args.initial_checkpoint} (epoch {start_epoch-1})",
              file=sys.stderr)

    # dataset with the reference's H/G sequence-length derivation
    H_seq = cfg.num_timesteps_at_rate_Rs(args.sequence_length)
    G_seq = cfg.num_timesteps_at_rate_Fs(H_seq)
    ds = RADAEDataset(args.features, args.sequence_length, H_seq, cfg.Nc,
                      G_seq, h_file=args.h_file, g_file=args.g_file,
                      rate_Fs=args.rate_Fs, auxdata=args.auxdata)
    print(f"dataset: {len(ds)} sequences of {args.sequence_length} frames",
          file=sys.stderr)

    n_dev = args.n_devices or len(jax.devices())
    n_dev = min(n_dev, len(jax.devices()), max(1, args.batch_size))
    mesh = make_mesh(n_dev)
    ckpt_dir = os.path.join(args.output, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    meta_common = dict(
        model_args=dict(num_features=num_features, latent_dim=args.latent_dim,
                        EbNodB=args.EbNodB, range_EbNo=args.range_EbNo,
                        rate_Fs=args.rate_Fs, bottleneck=args.bottleneck,
                        pilots=args.pilots, pilot_eq=args.pilot_eq,
                        cp=args.cp, auxdata=args.auxdata),
        dataset_args=dict(features=args.features,
                          sequence_length=args.sequence_length,
                          H_sequence_length=H_seq, Nc=cfg.Nc,
                          G_sequence_length=G_seq),
        batch_size=args.batch_size, lr=args.lr,
        lr_decay_factor=args.lr_decay_factor,
        sequence_length=args.sequence_length, adam_betas=[0.8, 0.95])

    rng = np.random.default_rng(args.seed)
    key = jax.numpy.asarray(np.array([0, args.seed], np.uint32))

    if args.plot_EqNo:
        _loss_vs_EqNo(args, cfg, model, device_put_tree(params), ds, rng, key)
        return

    scan = max(1, args.scan_steps)
    init_state, train_step = make_train_step(
        model, lr=args.lr, lr_decay_factor=args.lr_decay_factor, mesh=mesh,
        aux_ber=args.auxdata, aux_weight_boost=args.aux_weight_boost,
        scan_steps=scan)
    state = init_state(device_put_tree(params))

    log_interval = 10
    metrics = None
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        running = 0.0
        nb = 0
        group = []
        with mesh:
            for feats, H, G in ds.batches(args.batch_size, rng):
                # benign channels are built in-graph: only ship real data
                Hb = H if args.h_file else None
                Gb = cplx.pack_np(G) if (cfg.rate_Fs and args.g_file) else None
                if scan > 1:
                    # stack `scan` minibatches into one (scan, B, ...)
                    # dispatch; B stays the sharded axis
                    group.append((feats, Hb, Gb))
                    if len(group) < scan:
                        continue
                    feats = np.stack([g[0] for g in group])
                    Hb = (np.stack([g[1] for g in group])
                          if Hb is not None else None)
                    Gb = (np.stack([g[2] for g in group])
                          if Gb is not None else None)
                    group = []
                batch = shard_batch(mesh, tuple(
                    x for x in (feats, Hb, Gb) if x is not None),
                    batch_axis=1 if scan > 1 else 0)
                it = iter(batch)
                feats_d = next(it)
                Hd = next(it) if Hb is not None else None
                Gd = next(it) if Gb is not None else None
                state, metrics = train_step(state, feats_d, Hd, Gd, key)
                # metrics are the group's last step; running mean samples
                # one step per dispatch (weighting is uniform either way)
                running += float(np.asarray(metrics["loss"])[0])
                nb += scan
                if nb % (log_interval * scan) == 0:
                    msg = f"epoch {epoch} batch {nb} loss {running*scan/nb:.4f}"
                    if args.auxdata:
                        msg += f" BER {float(np.asarray(metrics['ber'])[0]):.3f}"
                    print(msg, file=sys.stderr)
        epoch_loss = running * scan / max(nb, 1)
        dt = time.time() - t0
        ber_str = ""
        if args.auxdata and metrics is not None and "ber" in metrics:
            ber_str = f" BER {float(np.asarray(metrics['ber'])[0]):.3f}"
        print(f"epoch {epoch}: loss {epoch_loss:.4f}{ber_str} "
              f"({nb} batches, {dt:.1f}s, "
              f"{nb*args.batch_size*args.sequence_length*0.01/dt:.0f} audio-sec/s)",
              file=sys.stderr)
        host_params = jax.tree_util.tree_map(np.asarray, state.params)
        save_checkpoint(os.path.join(ckpt_dir, f"checkpoint_epoch_{epoch}.npz"),
                        host_params,
                        dict(meta_common, epoch=epoch, loss=epoch_loss))


def _loss_vs_EqNo(args, cfg, model, params, ds, rng, key):
    """One frozen pass collecting per-sequence (Eq/No, loss) into 1 dB bins
    (reference: train.py:161-226)."""
    import jax
    ev = make_eval_step(model)
    rows = []
    for feats, H, G in ds.batches(args.batch_size, rng, shuffle=False):
        Gp = cplx.pack_np(G)
        loss, ebno, sigma = ev(params, feats, H, Gp, key)
        loss = np.asarray(loss)
        EbNodB = np.asarray(ebno)
        # measured Eq/No from sigma (rate Rs): Eq ~ 2, No = sigma^2
        No = np.asarray(sigma)[:, 0] ** 2
        EqNodB = 10 * np.log10(2.0 / No)
        rows.append(np.stack([EqNodB, loss], 1))
    rows = np.concatenate(rows)
    lo, hi = int(np.ceil(rows[:, 0].min())), int(np.ceil(rows[:, 0].max()))
    out = []
    for e in range(lo, hi):
        sel = np.abs(rows[:, 0] - e) < 0.5
        if sel.any():
            out.append((e, rows[sel, 1].mean()))
    np.savetxt(args.plot_EqNo + "_loss_EqNodB.txt", np.array(out))
    print(f"wrote {args.plot_EqNo}_loss_EqNodB.txt ({len(out)} bins)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
