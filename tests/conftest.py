"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding/collective code is validated against 8 virtual CPU devices since
multi-chip TPU hardware is not available in CI; the real-chip bench path is
exercised separately by bench.py.
"""

import os

# NB: the runtime may import jax at interpreter startup (sitecustomize), so
# the env var alone is not enough — set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_oracle():
    """Import the public reference implementation (read-only) as a numerics
    oracle, or skip if unavailable.  Quantization noise in the oracle is
    disabled by patching torch.rand_like to its mean so comparisons are
    deterministic."""
    import sys
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference implementation not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import torch
    import radae as ref_radae  # noqa: F401

    class Oracle:
        @staticmethod
        def no_quant_noise():
            """Context manager nulling the stochastic quantization noise."""
            import contextlib

            @contextlib.contextmanager
            def ctx():
                orig = torch.rand_like
                torch.rand_like = lambda x, **kw: 0.5 * torch.ones_like(x)
                try:
                    yield
                finally:
                    torch.rand_like = orig
            return ctx()

    Oracle.torch = torch
    Oracle.radae = ref_radae
    return Oracle


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
