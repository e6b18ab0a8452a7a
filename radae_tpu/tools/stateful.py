"""Stateful vs vanilla encoder/decoder equivalence checks.

In the reference, streaming ("Statefull") modules are separate classes and
these tools gate loss_delta < 0.01 between the two paths (reference:
stateful_encoder.py:73-109, stateful_decoder.py:44-109).  In radae_tpu the
streaming step IS the implementation (batch = scan from zero state), so the
check is exact; the tools remain for (a) regression cover and (b) validating
externally-produced latents (--read_latent, used by the C encoder port).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import flagship_config
from ..models.radae import RADAE
from ..models.core import distortion_loss
from ..convert import load_checkpoint, load_torch_checkpoint
from ..utils.hostio import device_put_tree
from ..data.io import NB_TOTAL_FEATURES, NUM_USED_FEATURES, read_f32, write_f32


def _setup(args):
    num_features = 21 if args.auxdata else 20
    cfg = flagship_config(feature_dim=num_features,
                          latent_dim=args.latent_dim)
    model = RADAE(cfg)
    if args.model_name in ("", "random"):
        params = model.init(0)
    elif args.model_name.endswith(".pth"):
        params = load_torch_checkpoint(args.model_name)
    else:
        params, _ = load_checkpoint(args.model_name)
    feats = read_f32(args.features, NB_TOTAL_FEATURES)
    T = cfg.num_10ms_times_steps_rounded_to_modem_frames(feats.shape[0])
    f = feats[None, :T, :NUM_USED_FEATURES].copy()
    if args.auxdata:
        aux = -np.ones((1, T, 1), np.float32)
        f = np.concatenate([f, aux], axis=2)
    return cfg, model, device_put_tree(params), f


def _common(p):
    p.add_argument("model_name", type=str)
    p.add_argument("features", type=str)
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--auxdata", action="store_true")
    p.add_argument("--read_latent", type=str, default="",
                   help="compare against externally-produced z (C encoder)")
    p.add_argument("--write_latent", type=str, default="")


def stateful_encoder(argv=None):
    p = argparse.ArgumentParser()
    _common(p)
    args = p.parse_args(argv)
    cfg, model, params, feats = _setup(args)

    z_van, _ = model.core_encoder(params["encoder"], feats, key=None)
    z_van = np.asarray(z_van)

    # streaming: one modem frame (12 feature frames) at a time
    state = None
    chunks = []
    step = cfg.enc_stride * cfg.Nzmf
    for i in range(0, feats.shape[1], step):
        zc, state = model.core_encoder(params["encoder"],
                                       feats[:, i:i + step], key=None,
                                       state=state)
        chunks.append(np.asarray(zc))
    z_str = np.concatenate(chunks, axis=1)

    if args.read_latent:
        z_str = read_f32(args.read_latent, cfg.latent_dim)[None]
        z_str = z_str[:, : z_van.shape[1], :]

    delta = float(np.abs(z_van - z_str).mean())
    print(f"mean |z_vanilla - z_stream|: {delta:6.4f}")
    if args.write_latent:
        write_f32(args.write_latent, z_str)
    ok = delta < 0.01
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def stateful_decoder(argv=None):
    p = argparse.ArgumentParser()
    _common(p)
    args = p.parse_args(argv)
    cfg, model, params, feats = _setup(args)

    z, _ = model.core_encoder(params["encoder"], feats, key=None)
    z = np.asarray(z)
    if args.read_latent:
        z = read_f32(args.read_latent, cfg.latent_dim)[None]

    f_van, _ = model.core_decoder(params["decoder"], z, key=None)
    f_van = np.asarray(f_van)

    state = None
    chunks = []
    for i in range(z.shape[1]):
        fc, state = model.core_decoder(params["decoder"], z[:, i:i + 1],
                                       key=None, state=state)
        chunks.append(np.asarray(fc))
    f_str = np.concatenate(chunks, axis=1)

    loss = float(np.asarray(distortion_loss(
        f_van[..., :NUM_USED_FEATURES], f_str[..., :NUM_USED_FEATURES]))[0])
    print(f"loss delta vanilla vs streaming: {loss:6.4f}")
    ok = loss < 0.01
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1
