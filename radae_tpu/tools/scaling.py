"""Measured sharded-scaling curves on the virtual CPU mesh.

The parallelism layer is correctness-tested for shard-count invariance
(tests/test_train.py::test_shard_count_invariance and the two-process
trajectory match in tests/test_distributed.py) but with one real TPU chip
its *efficiency* can
only be measured on the virtual CPU mesh — N jax devices multiplexed over
the host's physical cores (VERDICT r3 weak #3).  Two regimes fall out of
that topology:

* up to the physical core count, strong scaling of a fixed global batch
  is a real speedup measurement (each virtual device runs on its own
  core);
* past it, every extra virtual device adds only partitioning + collective
  overhead, so time-vs-1-device at the SAME global batch isolates the
  sharding overhead the XLA partitioner introduces — the quantity that
  carries over to a real multi-chip mesh, where per-device compute
  shrinks 1/N and this overhead is the efficiency ceiling.

Measures the two sharded workloads the framework ships: the one-batch
eval sweep forward (tools/evaluate.py grid-as-one-batch) and the full
training step (parallel/trainstep.py), at a fixed global batch over
1/2/4/8 devices.  Timing is the two-point slope method (see bench.py).
"""

from __future__ import annotations

import time

import numpy as np


def _slope(call, n1=1, n2=3, reps=3):
    """Median two-point slope of n chained calls (relay/dispatch-noise
    robust; calls must consume the previous result to stay sequential)."""
    dts = []
    for _ in range(reps):
        t0 = time.time()
        call(n1)
        t1 = time.time() - t0
        t0 = time.time()
        call(n2)
        t2 = time.time() - t0
        dts.append((t2 - t1) / (n2 - n1))
    return float(np.median(dts))


def measure_scaling(device_counts=(1, 2, 4, 8), B=32, T=120, seed=0,
                    weak=False):
    """Returns rows of {devices, eval_s, train_s}.

    weak=False: fixed GLOBAL batch B (strong scaling / overhead isolation).
    weak=True: B is the PER-DEVICE batch; global batch grows with the
    mesh, so flat time = perfect weak scaling.

    Run under the CPU platform with xla_force_host_platform_device_count
    >= max(device_counts) (tests/conftest.py does this)."""
    import jax
    import jax.numpy as jnp
    from ..config import flagship_config
    from ..models.radae import RADAE
    from ..models.core import distortion_loss
    from ..parallel.mesh import make_mesh, shard_batch
    from ..parallel.trainstep import make_train_step

    cfg = flagship_config(EbNodB=3.0, range_EbNo=True)
    model = RADAE(cfg)
    params_host = model.init(0)
    rng = np.random.default_rng(seed)
    Bmax = B * (max(device_counts) if weak else 1)
    feats_all = (rng.standard_normal((Bmax, T, cfg.feature_dim))
                 * 0.3).astype(np.float32)
    key = jnp.asarray(np.zeros(2, np.uint32))

    rows = []
    for nd in device_counts:
        if nd > len(jax.devices()):
            break
        mesh = make_mesh(nd)
        fb = shard_batch(mesh, feats_all[:B * nd] if weak
                         else feats_all[:B])
        params = jax.device_put(params_host)

        # ---- eval-sweep forward: per-row loss, one compiled batch ----
        @jax.jit
        def fwd(p, f, k):
            out = model.forward(p, f, None, None, key=k)
            return distortion_loss(f[..., :20],
                                   out["features_hat"][..., :20])

        losses = np.asarray(fwd(params, fb, key))   # compile + complete

        def eval_call(n):
            # chain each call's key on the previous result so the n
            # executions stay strictly sequential under async dispatch
            k = key
            out = losses
            for i in range(n):
                k = key + 1 + i + (out[0] * 0).astype(jnp.uint32)
                out = fwd(params, fb, k)
            np.asarray(out)

        eval_s = _slope(eval_call)

        # ---- full train step (donated state) ----
        init_state, tstep = make_train_step(model)
        st = init_state(jax.device_put(params_host))
        st, m = tstep(st, fb, None, None, key)
        np.asarray(m["loss"])                       # compile + complete

        # donation invalidates st across calls; rebuild per measurement
        # (the rebuild cost cancels in the two-point slope)
        def train_call(n):
            s = init_state(jax.device_put(params_host))
            m = None
            for _ in range(n):
                s, m = tstep(s, fb, None, None, key)
            np.asarray(m["loss"])

        train_s = _slope(train_call, n1=1, n2=5, reps=5)
        rows.append({"devices": nd, "eval_s": eval_s, "train_s": train_s,
                     "loss0": float(losses.mean())})
    return rows


def main(argv=None):
    import argparse
    import jax
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq", type=int, default=120)
    p.add_argument("--weak", action="store_true",
                   help="--batch is per-device; global batch grows with "
                        "the mesh (flat time = perfect weak scaling)")
    args = p.parse_args(argv)
    # force the CPU platform BEFORE any backend initialization (querying
    # jax.default_backend() first would itself initialize and pin it),
    # and ask for 8 virtual CPU devices
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    if len(jax.devices()) < 8:
        p.error(
            "need 8 virtual CPU devices; relaunch with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 (the jax "
            "backend was already initialized with "
            f"{len(jax.devices())} device(s))")
    rows = measure_scaling(B=args.batch, T=args.seq, weak=args.weak)
    t1e, t1t = rows[0]["eval_s"], rows[0]["train_s"]
    print(f"{'devices':>8} {'eval ms':>9} {'vs 1dev':>8} "
          f"{'train ms':>9} {'vs 1dev':>8}")
    for r in rows:
        print(f"{r['devices']:>8} {1e3 * r['eval_s']:>9.1f} "
              f"{t1e / r['eval_s']:>8.2f} {1e3 * r['train_s']:>9.1f} "
              f"{t1t / r['train_s']:>8.2f}")


if __name__ == "__main__":
    main()
