"""BBFM CLIs: inference (enc + FM channel + dec), standalone decoder, and
training (reference: bbfm_inference.py, bbfm_rx.py, train_bbfm.py)."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..config import BBFMConfig
from ..models.bbfm import BBFM
from ..models.core import distortion_loss
from ..convert import load_checkpoint, load_torch_checkpoint, save_checkpoint
from ..utils.hostio import device_put_tree
from ..data.io import NB_TOTAL_FEATURES, NUM_USED_FEATURES, read_f32, write_f32


def _load_params(model, name, seed=0):
    if name in ("", "random"):
        return model.init(seed)
    if name.endswith(".pth"):
        return load_torch_checkpoint(name)
    return load_checkpoint(name)[0]


def bbfm_inference(argv=None):
    p = argparse.ArgumentParser(
        description="BBFM enc + FM channel + dec (reference bbfm_inference.py)")
    p.add_argument("model_name", type=str)
    p.add_argument("features", type=str)
    p.add_argument("features_hat", type=str)
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--write_latent", type=str, default="")
    p.add_argument("--CNRdB", type=float, default=100)
    p.add_argument("--passthru", action="store_true")
    p.add_argument("--h_file", type=str, default="")
    p.add_argument("--write_CNRdB", type=str, default="")
    p.add_argument("--loss_test", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    import jax

    cfg = BBFMConfig(feature_dim=NUM_USED_FEATURES,
                     latent_dim=args.latent_dim, CNRdB=args.CNRdB)
    model = BBFM(cfg)

    features_in = read_f32(args.features, NB_TOTAL_FEATURES)
    if args.passthru:
        write_f32(args.features_hat, features_in)
        return

    params = device_put_tree(_load_params(model, args.model_name, args.seed))
    T = cfg.num_10ms_times_steps_rounded_to_modem_frames(features_in.shape[0])
    feats = features_in[None, :T, :NUM_USED_FEATURES].copy()
    print(f"Processing: {T} feature vectors", file=sys.stderr)

    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    H = np.ones((1, n_rs, 1), np.float32)
    if args.h_file:
        Hf = read_f32(args.h_file, 1)
        if Hf.shape[0] < n_rs:
            print("H file too short", file=sys.stderr)
            sys.exit(1)
        H = Hf[None, :n_rs, :]

    key = jax.numpy.asarray(np.array([0, args.seed], np.uint32))
    out = model.forward(params, feats, H, key=key)

    fh = np.asarray(out["features_hat"])
    pad = np.zeros(fh.shape[:2] + (NB_TOTAL_FEATURES - NUM_USED_FEATURES,),
                   np.float32)
    write_f32(args.features_hat, np.concatenate([fh, pad], axis=-1))
    loss = float(np.asarray(distortion_loss(feats, fh))[0])
    print(f"loss: {loss:5.3f}")
    if args.loss_test > 0.0:
        print("PASS" if loss < args.loss_test else "FAIL")
    if args.write_latent:
        write_f32(args.write_latent, np.asarray(out["z_hat"]))
    if args.write_CNRdB:
        write_f32(args.write_CNRdB, np.asarray(out["CNRdB"]))


def bbfm_rx(argv=None):
    p = argparse.ArgumentParser(
        description="BBFM standalone decoder: z_hat.f32 -> features.f32")
    p.add_argument("model_name", type=str)
    p.add_argument("z_hat", type=str)
    p.add_argument("features_hat", type=str)
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = BBFMConfig(feature_dim=NUM_USED_FEATURES, latent_dim=args.latent_dim)
    model = BBFM(cfg)
    params = device_put_tree(_load_params(model, args.model_name, args.seed))

    z_hat = read_f32(args.z_hat, args.latent_dim)[None]
    print(f"Processing: {z_hat.shape[1]} modem frames", file=sys.stderr)
    fh = np.asarray(model.receiver(params, z_hat.astype(np.float32)))
    pad = np.zeros(fh.shape[:2] + (NB_TOTAL_FEATURES - NUM_USED_FEATURES,),
                   np.float32)
    write_f32(args.features_hat, np.concatenate([fh, pad], axis=-1))


def train_bbfm(argv=None):
    """BBFM training loop (reference train_bbfm.py): CNRdB instead of
    EbNodB, Nc=1 fading sequences."""
    p = argparse.ArgumentParser()
    p.add_argument("features", type=str)
    p.add_argument("output", type=str)
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--CNRdB", type=float, default=100)
    p.add_argument("--range_CNRdB", action="store_true")
    p.add_argument("--range_CNRdB_start", type=float, default=-3.0)
    p.add_argument("--h_file", type=str, default="")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--sequence-length", type=int, default=256)
    p.add_argument("--lr-decay-factor", type=float, default=2.5e-5)
    p.add_argument("--initial-checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax
    from ..data.dataset import RADAEDataset
    from ..parallel.trainstep import make_optimizer

    cfg = BBFMConfig(feature_dim=NUM_USED_FEATURES,
                     latent_dim=args.latent_dim, CNRdB=args.CNRdB)
    model = BBFM(cfg)
    params = _load_params(model, args.initial_checkpoint or "random", args.seed)
    params = device_put_tree(params)

    H_seq = cfg.num_timesteps_at_rate_Rs(args.sequence_length)
    ds = RADAEDataset(args.features, args.sequence_length, H_seq, 1, 1,
                      h_file=args.h_file)
    opt = make_optimizer(args.lr, args.lr_decay_factor)
    opt_state = opt.init(params)

    def loss_fn(params, feats, H, key, CNRdB):
        out_f, _ = model.core_encoder(params["encoder"], feats, key=key)
        z_hat, _, _ = model.channel(key, out_f, H, CNRdB)
        fh, _ = model.core_decoder(params["decoder"], z_hat, key=key)
        return distortion_loss(feats, fh).mean()

    @jax.jit
    def step(params, opt_state, feats, H, key, CNRdB):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, H, key, CNRdB)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss.reshape(1)

    rng = np.random.default_rng(args.seed)
    ckpt_dir = os.path.join(args.output, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    for epoch in range(1, args.epochs + 1):
        running, nb = 0.0, 0
        for feats, H, _ in ds.batches(args.batch_size, rng):
            key = jax.numpy.asarray(
                np.array([epoch, nb], np.uint32))
            CNRdB = args.CNRdB
            if args.range_CNRdB:
                CNRdB = float(args.range_CNRdB_start + 20 * rng.random())
            params, opt_state, loss = step(params, opt_state,
                                           feats, H[..., :1], key, CNRdB)
            running += float(np.asarray(loss)[0])
            nb += 1
        print(f"epoch {epoch}: loss {running/max(nb,1):.4f}", file=sys.stderr)
        host_params = jax.tree_util.tree_map(np.asarray, params)
        save_checkpoint(os.path.join(ckpt_dir, f"checkpoint_epoch_{epoch}.npz"),
                        host_params, dict(epoch=epoch, loss=running / max(nb, 1),
                                          CNRdB=args.CNRdB,
                                          latent_dim=args.latent_dim))


if __name__ == "__main__":
    bbfm_inference()
