"""Batch file transmitter: encode MANY feature files into modem IQ
streams in ONE compiled TPU program — the tx counterpart of rx_batch and
the serving surface of runtime.make_streaming_tx_step.

The streaming `txe` app mirrors the reference's radae_txe.py one frame at
a time; this tool batches B independent streams through one scan-chained
program (stateful encoder + OFDM mod + PA model per frame), optionally
through the Pallas VMEM-resident fused encoder kernel with int8 weights
(measured 1.67-1.72M audio-s/s vs 1.27-1.41M plain XLA at B=2048 across
sessions, work/sweep_enc{,2,3,4}.log).

    python -m radae_tpu tx_batch model.npz out_dir in1_feat.f32 [...]

Inputs are 36-col vocoder feature files (the reference's lpcnet_demo
contract); per stream k the tool writes out_dir/<stem>_iq.f32 (rate-Fs
complex IQ, ..IQIQ..) truncated to that stream's own frame count, with an
end-of-over marker appended (disable with --no-eoo).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import flagship_config
from ..convert import load_checkpoint, load_torch_checkpoint
from ..data.io import NB_TOTAL_FEATURES, NUM_USED_FEATURES, read_f32
from ..models.core import CoreEncoder
from ..runtime import make_streaming_tx_step
from ..utils.hostio import device_put_tree


def main(argv=None):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name", type=str)
    p.add_argument("out_dir", type=str)
    p.add_argument("feat_files", nargs="+", help="36-col feature .f32 files")
    p.add_argument("--latent-dim", type=int, default=80)
    p.add_argument("--bottleneck", type=int, default=3)
    p.add_argument("--auxdata", action="store_true", default=True)
    p.add_argument("--no-auxdata", dest="auxdata", action="store_false")
    p.add_argument("--no-eoo", dest="eoo", action="store_false")
    p.add_argument("--fused", action="store_true",
                   help="Pallas fused encoder kernel (large batches; "
                        "batch must divide by the 8-lane tile)")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(eoo=True)
    args = p.parse_args(argv)

    num_features = 21 if args.auxdata else 20
    cfg = flagship_config(feature_dim=num_features,
                          latent_dim=args.latent_dim,
                          bottleneck=args.bottleneck)
    encoder = CoreEncoder(num_features, args.latent_dim,
                          bottleneck=args.bottleneck)
    if args.model_name in ("", "random"):
        params = {"encoder": encoder.init(args.seed)}
    elif args.model_name.endswith(".pth"):
        params = load_torch_checkpoint(args.model_name)
    else:
        params, _ = load_checkpoint(args.model_name)

    rows_per_frame = cfg.Nzmf * cfg.enc_stride          # 12 x 10 ms
    feats_in = []
    for f in args.feat_files:
        x = read_f32(f, NB_TOTAL_FEATURES)[:, :NUM_USED_FEATURES]
        n = len(x) // rows_per_frame * rows_per_frame
        feats_in.append(x[:n])
    B = len(feats_in)
    n_frames = [len(x) // rows_per_frame for x in feats_in]
    NF = max(n_frames)
    feats = np.zeros((B, NF * rows_per_frame, num_features), np.float32)
    for b, x in enumerate(feats_in):
        feats[b, : len(x), :NUM_USED_FEATURES] = x
        if args.auxdata:
            feats[b, :, NUM_USED_FEATURES] = -1.0

    step = make_streaming_tx_step(cfg, encoder, B, fused=args.fused,
                                  fused_tile=min(512, B),
                                  fused_quant="int8" if args.fused
                                  else None)
    if args.fused:
        from ..ops.fused_core import encoder_weights, encoder_state_zero
        enc_params = tuple(jax.device_put(w)
                           for w in encoder_weights(params["encoder"],
                                                    quant="int8"))
        state0 = encoder_state_zero(B)
    else:
        enc_params = device_put_tree(params["encoder"])
        state0 = encoder.zero_state(B)

    frames = feats.reshape(B, NF, rows_per_frame, num_features)
    frames = jnp.swapaxes(jnp.asarray(frames), 0, 1)    # (NF, B, 12, F)

    @jax.jit
    def run(p, fr, st):
        def body(s, f):
            tx, s = step(p, f, s)
            return s, tx
        _, tx = jax.lax.scan(body, st, fr)
        return jnp.swapaxes(tx, 0, 1)                   # (B, NF, Nmf, 2)

    tx = np.asarray(run(enc_params, frames, state0))
    eoo = (cfg.eoo.flatten().astype(np.complex64) if args.eoo
           else np.zeros(0, np.complex64))

    os.makedirs(args.out_dir, exist_ok=True)
    for b, f in enumerate(args.feat_files):
        stem = os.path.splitext(os.path.basename(f))[0]
        iq = tx[b, : n_frames[b]].reshape(-1, 2)
        s = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
        s = np.concatenate([s, eoo])
        s.tofile(os.path.join(args.out_dir, f"{stem}_iq.f32"))
        print(f"{stem}: {n_frames[b]} frames -> {len(s)} samples")
    return 0


if __name__ == "__main__":
    main()
