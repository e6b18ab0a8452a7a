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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--trace", type=str, default="",
                   help="write a jax profiler trace to this directory")
    p.add_argument("--train", action="store_true",
                   help="also profile the training step")
    args = p.parse_args(argv)

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
