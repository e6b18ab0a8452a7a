"""Primitive neural layers as pure functions over parameter pytrees.

All layers follow the convention
    params = init_<layer>(key, ...)        # dict of jnp arrays
    y[, state] = <layer>(params, x, ...)   # pure apply

Weight layouts intentionally match the de-facto standard row-major
(out_features, in_features) so converted PyTorch checkpoints map 1:1
(reference layer semantics: radae/radae_base.py:84-153).

The time-recurrent layers (GRU, causal dilated conv) take an explicit
`state` and return the updated state: streaming inference and batch
processing share one code path, with the batch path simply a scan from the
zero state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quant_noise(key, x):
    """Simulated 8-bit quantization noise: clamp(x + U(-.5,.5)/127, -1, 1).

    Applied after every layer activation; load-bearing for matching the
    fixed-point C inference port (reference: radae/radae_base.py:80-81).
    """
    u = jax.random.uniform(key, x.shape, dtype=x.dtype) - 0.5
    return jnp.clip(x + u / 127.0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Initialisation
#
# All parameter init happens host-side in numpy: device RNG dispatch is an
# eager op per tensor, which is pathologically slow through a remote-compile
# TPU runtime, and init-time numerics don't belong on the accelerator.
# `as_rng` turns a jax PRNG key (or int) into a numpy Generator.
# ---------------------------------------------------------------------------

def as_rng(key_or_seed) -> np.random.Generator:
    if isinstance(key_or_seed, np.random.Generator):
        return key_or_seed
    if isinstance(key_or_seed, (int, np.integer)):
        return np.random.default_rng(key_or_seed)
    data = np.asarray(jax.random.key_data(key_or_seed)).flatten()
    return np.random.default_rng(np.random.SeedSequence(data.tolist()))


def _uniform(rng, shape, bound, dtype):
    # returns numpy: init stays off-device; transfer once via
    # utils.hostio.device_put_tree
    return rng.uniform(-bound, bound, shape).astype(dtype)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def init_dense(key, in_dim, out_dim, dtype=jnp.float32):
    rng = as_rng(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": _uniform(rng, (out_dim, in_dim), bound, dtype),
        "b": _uniform(rng, (out_dim,), bound, dtype),
    }


def dense(params, x):
    return x @ params["w"].T + params["b"]


# ---------------------------------------------------------------------------
# GRU (torch gate conventions: r, z, n blocks stacked along dim 0)
# ---------------------------------------------------------------------------

def init_gru(key, in_dim, hidden, dtype=jnp.float32):
    rng = as_rng(key)
    bound = 1.0 / np.sqrt(hidden)
    return {
        "w_ih": _uniform(rng, (3 * hidden, in_dim), bound, dtype),
        # orthogonal recurrent weights (reference init_weights)
        "w_hh": _orthogonal(rng, (3 * hidden, hidden), dtype),
        "b_ih": _uniform(rng, (3 * hidden,), bound, dtype),
        "b_hh": _uniform(rng, (3 * hidden,), bound, dtype),
    }


def _orthogonal(rng, shape, dtype):
    # orthogonal init (reference: radae_base.py:72-77), computed on host
    rows, cols = shape
    n = max(rows, cols)
    a = rng.standard_normal((n, n))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    return np.asarray(q[:rows, :cols], dtype)


def gru_cell(params, x_gates, h):
    """One GRU step given precomputed input gates x_gates = x@W_ih.T + b_ih.

    Args:
      x_gates: (..., 3H) input projection for this timestep.
      h: (..., H) carried hidden state.
    Returns new hidden state (..., H).
    """
    H = h.shape[-1]
    h_gates = h @ params["w_hh"].T + params["b_hh"]
    r = jax.nn.sigmoid(x_gates[..., :H] + h_gates[..., :H])
    z = jax.nn.sigmoid(x_gates[..., H:2 * H] + h_gates[..., H:2 * H])
    n = jnp.tanh(x_gates[..., 2 * H:] + r * h_gates[..., 2 * H:])
    return (1.0 - z) * n + z * h


def gru(params, x, h0):
    """Run a GRU over a sequence.

    The input projection is hoisted out of the scan as one large matmul
    (MXU-friendly); only the small recurrent matmul stays sequential.

    Args:
      x: (B, T, in_dim)
      h0: (B, H) initial hidden state
    Returns:
      y: (B, T, H) outputs, hT: (B, H) final state
    """
    x_gates = x @ params["w_ih"].T + params["b_ih"]   # (B, T, 3H)

    def step(h, xg_t):
        h_new = gru_cell(params, xg_t, h)
        return h_new, h_new

    hT, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_gates, 0, 1))
    return jnp.swapaxes(ys, 0, 1), hT


def gru_zero_state(batch, hidden, dtype=jnp.float32):
    return jnp.zeros((batch, hidden), dtype)


# ---------------------------------------------------------------------------
# Causal dilated Conv1d, kernel_size=2, tanh activation
# ---------------------------------------------------------------------------

def init_conv2tap(key, in_dim, out_dim, dtype=jnp.float32):
    rng = as_rng(key)
    bound = 1.0 / np.sqrt(in_dim * 2)
    return {
        # torch Conv1d layout (out, in, k) kept for checkpoint conversion
        "w": _uniform(rng, (out_dim, in_dim, 2), bound, dtype),
        "b": _uniform(rng, (out_dim,), bound, dtype),
    }


def conv2tap(params, x, hist, dilation=1):
    """Causal 2-tap dilated conv with tanh (reference: MyConv, radae_base.py:84-94).

    y[t] = tanh(W0 @ x[t-d] + W1 @ x[t] + b), with x[t-d] drawn from `hist`
    (the previous d timesteps) for t < d.  Fully parallel over time.

    Args:
      x: (B, T, in_dim)
      hist: (B, d, in_dim) carried history (zeros at stream start)
    Returns:
      y: (B, T, out_dim), new_hist: (B, d, in_dim)
    """
    d = dilation
    w0 = params["w"][:, :, 0]
    w1 = params["w"][:, :, 1]
    ext = jnp.concatenate([hist, x], axis=1)          # (B, d+T, in)
    x_prev = ext[:, : x.shape[1], :]                   # x[t-d]
    y = jnp.tanh(x_prev @ w0.T + x @ w1.T + params["b"])
    new_hist = ext[:, -d:, :]
    return y, new_hist


def conv2tap_zero_state(batch, in_dim, dilation, dtype=jnp.float32):
    return jnp.zeros((batch, dilation, in_dim), dtype)


# ---------------------------------------------------------------------------
# GLU with weight-norm parameterised gate
# ---------------------------------------------------------------------------

def init_glu(key, feat, dtype=jnp.float32):
    # gate initialised orthogonal, stored in weight-norm (g, v) form
    # (reference: radae_base.py:132-153)
    v = _orthogonal(as_rng(key), (feat, feat), dtype)
    g = np.linalg.norm(v, axis=1).astype(dtype)
    return {"v": v, "g": g}


def glu_weight(params):
    v = params["v"]
    return params["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)


def glu(params, x):
    """x * sigmoid(W x) with weight-normed W."""
    return x * jax.nn.sigmoid(x @ glu_weight(params).T)
