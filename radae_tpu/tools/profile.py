"""Performance characterisation harness.

Equivalent of the reference's cProfile/%-CPU performance ctests
(reference: CMakeLists.txt:420-458, README.md:312-331), TPU-native:
per-stage steady-state timings (slope method, see bench.py) for the
streaming rx pipeline and the training step, plus an optional
jax.profiler trace for the XLA-level view.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _slope(fn, mkstate, n1=20, n2=100):
    state = mkstate()
    out = None
    t = {}
    for n in (n1, n2):
        state = mkstate()
        t0 = time.time()
        out = fn(n, state)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        t[n] = time.time() - t0
    return (t[n2] - t[n1]) / (n2 - n1)


def train_breakdown(batches, T=240, remat=False, scan=8,
                    n1=2, n2=8, slopes=3):
    """Per-component training-step timings.

    Decomposes the train step into encoder fwd+bwd, decoder fwd+bwd,
    autoencoder-without-channel, full grad, and full step (+Adam), each as
    its own jitted program, so the channel-sim cost and the optimizer cost
    fall out by subtraction.  Each jitted program runs `scan` chained
    iterations inside one lax.scan (each iteration consumes the previous
    one's scalar, keeping them strictly sequential on device), and the
    per-call time is the median of three two-point slopes — the same
    methodology as bench.py, because through the relay every individual
    dispatch/readback carries tens of ms of latency noise that would
    otherwise swamp millisecond-scale steps.
    """
    import jax
    import jax.numpy as jnp
    from ..config import flagship_config
    from ..models.core import distortion_loss
    from ..models.radae import RADAE
    from ..parallel.trainstep import make_train_step
    from ..utils.hostio import device_put_tree

    assert T % 12 == 0, f"T={T}: need whole modem frames (12 x 10 ms)"
    cfg = flagship_config(EbNodB=3.0, range_EbNo=True)
    model = RADAE(cfg)
    params_host = model.init(0)
    key = jnp.asarray(np.zeros(2, np.uint32))
    rng = np.random.default_rng(0)
    Tz = T // 4

    def full_loss(params, feats):
        out = model.forward(params, feats, None, None, key=key)
        return distortion_loss(feats, out["features_hat"]).mean()

    def nochan_loss(params, feats):
        z, _ = model.core_encoder(params["encoder"], feats)
        fh, _ = model.core_decoder(params["decoder"], z)
        return distortion_loss(feats, fh).mean()

    def enc_loss(params, feats):
        z, _ = model.core_encoder(params["encoder"], feats)
        return (z ** 2).mean()

    def timed(chain, mkstate, per_call_iters):
        dts = [_slope(chain, mkstate, n1=n1, n2=n2) for _ in range(slopes)]
        return float(np.median(dts)) / per_call_iters

    rows = []
    for B in batches:
        params = device_put_tree(params_host)
        feats = jax.device_put(
            (rng.standard_normal((B, T, 21)) * 0.3).astype(np.float32))
        z_hat = jax.device_put(
            rng.standard_normal((B, Tz, cfg.latent_dim)).astype(np.float32))

        def dec_loss(params, feats, z_hat=z_hat):
            fh, _ = model.core_decoder(params["decoder"], z_hat)
            return distortion_loss(feats, fh).mean()

        def grad_norm(loss_fn):
            def f(params, feats):
                g = jax.grad(loss_fn)(params, feats)
                return sum((x ** 2).sum()
                           for x in jax.tree_util.tree_leaves(g))
            return f

        variants = [
            ("forward only (loss)", full_loss),
            ("encoder fwd+bwd", grad_norm(enc_loss)),
            ("decoder fwd+bwd", grad_norm(dec_loss)),
            ("enc+dec, no channel", grad_norm(nochan_loss)),
            ("full fwd+bwd (grad)", grad_norm(full_loss)),
        ]
        row = {"B": B}
        for name, fn in variants:
            @jax.jit
            def scanned(params, feats, l0, fn=fn):
                def body(l, _):
                    return fn(params, feats + 0.0 * l), None
                l, _ = jax.lax.scan(body, l0, None, length=scan)
                return l

            l0 = scanned(params, feats, jnp.zeros(()))
            np.asarray(l0)                      # compile + complete

            def chain(n, state, scanned=scanned):
                l = state
                for _ in range(n):
                    l = scanned(params, feats, l)
                return l

            row[name] = timed(chain, lambda: jnp.zeros(()), scan)

        # full step incl. Adam update (donated state; fresh per run)
        init_state, tstep = make_train_step(model, remat=remat,
                                            scan_steps=scan)
        st0 = tstep(init_state(device_put_tree(params_host)),
                    feats, None, None, key)
        np.asarray(st0[1]["loss"])

        def tchain(n, state):
            metrics = None
            for _ in range(n):
                state, metrics = tstep(state, feats, None, None, key)
            return metrics["loss"]

        row["full step (+Adam)"] = timed(
            tchain, lambda: init_state(device_put_tree(params_host)), scan)
        rows.append(row)

    names = [k for k in rows[0] if k != "B"]
    print(f"\ntraining-step breakdown (T={T} frames = {T*0.01:.1f} s audio"
          f"{', remat' if remat else ''}); ms/step:")
    print(f"{'component':>22} " + " ".join(f"B={r['B']:>5}" for r in rows))
    for name in names:
        print(f"{name:>22} " + " ".join(f"{r[name]*1e3:7.1f}" for r in rows))
    chan = [(r["full fwd+bwd (grad)"] - r["enc+dec, no channel"]) * 1e3
            for r in rows]
    print(f"{'-> channel sim (diff)':>22} " + " ".join(f"{c:7.1f}" for c in chan))
    thr = [r["B"] * T * 0.01 / r["full step (+Adam)"] for r in rows]
    print(f"{'audio-s/s training':>22} " + " ".join(f"{t:7,.0f}" for t in thr))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--trace", type=str, default="",
                   help="write a jax profiler trace to this directory")
    p.add_argument("--train", action="store_true",
                   help="also profile the training step")
    p.add_argument("--train-breakdown", type=str, default="",
                   help="comma-separated batch sizes, e.g. 32,128,512: "
                        "per-component training-step timing table")
    p.add_argument("--remat", action="store_true",
                   help="use jax.checkpoint in the breakdown's full step")
    args = p.parse_args(argv)

    if args.train_breakdown:
        train_breakdown([int(b) for b in args.train_breakdown.split(",")],
                        remat=args.remat)
        if not (args.train or args.trace):
            return

    import jax
    from ..config import flagship_config
    from ..models.core import CoreDecoder
    from ..runtime import make_streaming_rx_step
    from ..utils.hostio import device_put_tree

    cfg = flagship_config()
    B = args.batch
    decoder = CoreDecoder(cfg.latent_dim, cfg.feature_dim)
    dp = device_put_tree(decoder.init(1))
    rng = np.random.default_rng(0)
    rx = jax.device_put(
        rng.standard_normal((B, cfg.Nmf + cfg.M + cfg.Ncp, 2)).astype(np.float32))

    step = make_streaming_rx_step(cfg, decoder, B, fused=False)
    feats, _ = step(dp, rx, decoder.zero_state(B))
    np.asarray(feats)

    def chain(n, state):
        f = None
        for _ in range(n):
            f, state = step(dp, rx, state)
        return f

    dt = _slope(chain, lambda: decoder.zero_state(B))
    print(f"streaming rx step B={B}: {dt*1e3:.3f} ms/frame "
          f"-> {B*cfg.Tmf/dt:,.0f} audio-seconds/s/chip")

    if args.train:
        from ..models.radae import RADAE
        from ..parallel.trainstep import make_train_step
        model = RADAE(flagship_config(EbNodB=3.0, range_EbNo=True))
        params = model.init(0)
        init_state, tstep = make_train_step(model)
        st = init_state(device_put_tree(params))
        Bt, T = 32, 240
        feats = jax.device_put(
            (rng.standard_normal((Bt, T, 21)) * 0.3).astype(np.float32))
        key = jax.numpy.asarray(np.zeros(2, np.uint32))
        _, m = tstep(st, feats, None, None, key)
        np.asarray(m["loss"])

        def tchain(n, state):
            metrics = None
            for _ in range(n):
                state, metrics = tstep(state, feats, None, None, key)
            return metrics["loss"]

        # tstep donates its state argument, so every timing run needs a
        # FRESH TrainState: reusing one across runs would pass deleted
        # (donated) buffers back in on backends that honor donation.
        dt = _slope(tchain, lambda: init_state(device_put_tree(params)),
                    n1=10, n2=40)
        print(f"train step B={Bt} T={T}: {dt*1e3:.1f} ms "
              f"-> {Bt*T*0.01/dt:,.0f} audio-seconds/s training")

    if args.trace:
        import jax.profiler
        with jax.profiler.trace(args.trace):
            state = decoder.zero_state(B)
            for _ in range(10):
                feats, state = step(dp, rx, state)
            np.asarray(feats)
        print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
