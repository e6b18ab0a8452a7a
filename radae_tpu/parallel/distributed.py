"""Multi-process (multi-host) training support.

The reference is a single-GPU torch codebase with no distributed story;
SURVEY §2.7 makes multi-chip scale a first-class obligation of this
framework.  Single-process multi-device data parallelism lives in
``parallel.mesh`` / ``parallel.trainstep`` (one jit over a Mesh, XLA
inserts the psum).  This module adds the *multi-process* layer used on
real TPU pods, where each host owns a slice of the chips and JAX runs one
process per host over ICI/DCN:

  * :func:`initialize` — ``jax.distributed.initialize`` wrapper; on the
    CPU backend it selects the Gloo collectives implementation so the
    same SPMD program (mesh + NamedSharding + jit) runs across processes
    for CI and local verification.
  * :func:`global_mesh` — a mesh over ALL processes' devices.
  * :func:`host_local_batch` — turn each process's local batch shard into
    one global sharded jax.Array (``make_array_from_process_local_data``).
  * :func:`replicated_scalar` — read back a replicated metric on every
    process without a cross-host gather.
  * :func:`demo_worker` — an end-to-end two-process demo: a real RADAE
    train step sharded over the global "dp" mesh, gradients reduced
    across process boundaries by XLA.  ``tests/test_distributed.py``
    launches two of these and checks the training loss trajectory matches
    the single-process 8-device run, which proves the cross-process psum
    is doing exactly what the single-process mesh does.

The program is identical in both regimes — that is the point of the JAX
SPMD model: the per-host code never names a peer, it just jits over the
global mesh and XLA lowers the collectives onto whatever fabric connects
the devices (ICI within a host/pod slice, DCN across hosts, TCP/Gloo in
the CPU verification harness).
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: int | None = None, cpu: bool = False):
    """Join the distributed runtime.  Call before any jax computation.

    With cpu=True (the verification harness) pins the CPU platform, the
    per-process virtual device count, and the Gloo cross-process
    collectives backend; on TPU the platform defaults are already right.
    The config knobs (not env vars) are used because the runtime may have
    imported jax at interpreter startup — they stay effective until the
    backend is first touched.
    """
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "dp"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(mesh, tree, axis: str = "dp"):
    """Assemble a global batch from per-process local shards.

    Each process passes its own rows (global_batch / num_processes); the
    result is one jax.Array whose leading axis is sharded over the global
    mesh, ready to feed the jitted step.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.tree_util.tree_map(put, tree)


def replicated_scalar(x) -> float:
    """Host value of a fully-replicated device scalar/array (every process
    owns a replica, so no collective is needed to read it)."""
    return float(np.asarray(x.addressable_data(0)).reshape(-1)[0])


def _demo_problem(seed: int = 0, B_global: int = 16, T: int = 120):
    """The fixed toy problem both demo regimes share: model, params, and a
    deterministic global batch (identical however many processes split it)."""
    from ..config import RADAEConfig
    from ..models.radae import RADAE

    cfg = RADAEConfig(EbNodB=6.0, rate_Fs=False)
    model = RADAE(cfg)
    params = model.init(seed)
    rng = np.random.default_rng(seed + 1)
    feats = (rng.standard_normal((B_global, T, cfg.feature_dim))
             .astype(np.float32) * 0.3)
    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    H = np.ones((B_global, n_rs, cfg.Nc), np.float32)
    return model, params, feats, H


def demo_single_process(steps: int = 3, seed: int = 0) -> list[float]:
    """Reference trajectory: the same problem on the current process's own
    mesh (e.g. the 8-virtual-device CPU test mesh)."""
    import jax
    from .mesh import make_mesh, shard_batch
    from .trainstep import make_train_step

    model, params, feats, H = _demo_problem(seed)
    mesh = make_mesh()
    init_state, train_step = make_train_step(model, lr=3e-4, mesh=mesh)
    state = init_state(params)
    key = np.zeros(2, np.uint32)
    losses = []
    with mesh:
        batch = shard_batch(mesh, (feats, H))
        for _ in range(steps):
            state, metrics = train_step(state, batch[0], batch[1], None, key)
            losses.append(float(np.asarray(metrics["loss"])[0]))
    return losses


def demo_worker(process_id: int, num_processes: int, steps: int = 3,
                coordinator: str = "127.0.0.1:9911",
                local_device_count: int = 4, seed: int = 0) -> list[float]:
    """Run `steps` sharded RADAE train steps across the process group and
    return the per-step losses.  Deterministic given (seed, total batch):
    the global batch and PRNG key are identical regardless of how many
    processes split it, so the loss trajectory must match a
    single-process run over the same number of total devices.
    """
    initialize(coordinator, num_processes, process_id, local_device_count,
               cpu=True)
    from .trainstep import make_train_step

    model, params, feats_global, H_global = _demo_problem(seed)
    B_global = feats_global.shape[0]
    assert B_global % num_processes == 0
    B_local = B_global // num_processes
    lo = process_id * B_local

    mesh = global_mesh()
    init_state, train_step = make_train_step(model, lr=3e-4, mesh=mesh)
    state = init_state(params)
    key = np.zeros(2, np.uint32)

    losses = []
    with mesh:
        batch = host_local_batch(mesh, (feats_global[lo: lo + B_local],
                                        H_global[lo: lo + B_local]))
        for _ in range(steps):
            state, metrics = train_step(state, batch[0], batch[1], None, key)
            losses.append(replicated_scalar(metrics["loss"]))
    return losses


def _demo_main(argv=None):  # pragma: no cover - exercised via subprocess
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("process_id", type=int)
    p.add_argument("num_processes", type=int)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--coordinator", default="127.0.0.1:9911")
    p.add_argument("--local-devices", type=int, default=4)
    args = p.parse_args(argv)
    losses = demo_worker(args.process_id, args.num_processes,
                         steps=args.steps, coordinator=args.coordinator,
                         local_device_count=args.local_devices)
    print("LOSSES " + " ".join(f"{l:.8f}" for l in losses), flush=True)


if __name__ == "__main__":  # pragma: no cover
    _demo_main()
