"""Experiment: gradient-train low-PAPR pilot sequences.

Pilots are trainable complex carrier amplitudes; the pipeline is
IDFT -> tanh PA clamp -> AWGN -> correlation detector, with loss
-sum(Dt) + 0.1*std|P| to maximise the detector peak while keeping pilot
power flat (reference: ml_pilots.py:65-128).  Split-complex JAX + optax.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..config import RADAEConfig
from ..ops.cplx import C


def train_pilots(EsNodB=10.0, lr=1e-3, epochs=100, batches=10,
                 latent_dim=40, seed=0, verbose=False):
    import jax
    import jax.numpy as jnp
    import optax

    cfg = RADAEConfig(latent_dim=latent_dim, EbNodB=100, rate_Fs=True,
                      pilots=True, cyclic_prefix=0.004)
    Nc, M, Fs, Rb = cfg.Nc, cfg.M, cfg.Fs, cfg.Rb
    Wr = np.ascontiguousarray(cfg.Winv.real.astype(np.float32))
    Wi = np.ascontiguousarray(cfg.Winv.imag.astype(np.float32))

    S = 1.0
    EsNo = 10 ** (EsNodB / 10)
    sigma = float(np.sqrt(S * Fs / (EsNo * Rb)))

    rng = np.random.default_rng(seed)
    params = {"Pr": rng.standard_normal(Nc).astype(np.float32),
              "Pi": rng.standard_normal(Nc).astype(np.float32)}

    def forward(params, key):
        P = C(jnp.asarray(params["Pr"]), jnp.asarray(params["Pi"]))
        scaled = P * (M / np.sqrt(Nc))
        p = C(scaled.re @ Wr - scaled.im @ Wi,
              scaled.re @ Wi + scaled.im @ Wr)            # (M,)
        # PA clamp
        r = jnp.sqrt(p.abs2() + 1e-12)
        tx = p * (jnp.tanh(r) / r)
        kr, ki = jax.random.split(key)
        n = C(sigma / np.sqrt(2) * jax.random.normal(kr, (M,)),
              sigma / np.sqrt(2) * jax.random.normal(ki, (M,)))
        rx = tx + n
        Dt = (rx.conj() * tx)
        Dt_sum = C(Dt.re.sum(), Dt.im.sum()) * (1.0 / (Nc * M))
        return jnp.sqrt(Dt_sum.abs2()), jnp.sqrt(P.abs2())

    def loss_fn(params, key):
        Dt, Pabs = forward(params, key)
        return -Dt + 0.1 * jnp.std(Pabs)

    opt = optax.sgd(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(epochs):
        total = 0.0
        for b in range(batches):
            key = jax.numpy.asarray(np.array([epoch, b + seed], np.uint32))
            params, opt_state, loss = step(params, opt_state, key)
            total += float(loss)
        if verbose and (epoch % 10 == 0 or epoch == epochs - 1):
            print(f"Epoch {epoch+1:5d} | loss {total/batches:.6f}",
                  file=sys.stderr)

    # report trained pilot stats
    P = params["Pr"] + 1j * params["Pi"]
    p = (P * M / np.sqrt(Nc)) @ cfg.Winv
    papr = 20 * np.log10(np.abs(p).max() /
                         np.sqrt(np.mean(np.abs(p) ** 2)))
    return params, papr


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--EsNodB", type=float, default=10.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)
    params, papr = train_pilots(args.EsNodB, args.lr, args.epochs,
                                verbose=True)
    print(f"trained pilot PAPR: {papr:5.2f} dB")
    if args.out:
        (params["Pr"] + 1j * params["Pi"]).astype(np.complex64).tofile(args.out)


if __name__ == "__main__":
    main()
