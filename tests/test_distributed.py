"""Multi-process (multi-host) data parallelism (SURVEY §2.7).

Launches TWO OS processes, each owning 4 virtual CPU devices, joined via
jax.distributed + Gloo collectives into one 8-device global mesh — the
same process-per-host topology as a TPU pod (ICI/DCN replaced by TCP).
The sharded RADAE train-step loss trajectory must match the conftest's
single-process 8-device mesh on the identical global batch: that proves
the cross-process gradient psum computes exactly what the single-process
mesh computes, i.e. scaling out over hosts does not change the math.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)          # device count set via jax config
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "radae_tpu.parallel.distributed",
             str(pid), "2", "--steps", "3",
             "--coordinator", f"127.0.0.1:{port}"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed demo timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSSES")][0]
        losses.append([float(x) for x in line.split()[1:]])
    # both processes report the same replicated loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

    # single-process 8-device reference on the same global batch
    from radae_tpu.parallel.distributed import demo_single_process
    ref = demo_single_process(steps=3)
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5)
