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
# Dense
# ---------------------------------------------------------------------------

def init_dense(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def dense(params, x):
    return x @ params["w"].T + params["b"]


# ---------------------------------------------------------------------------
# GRU (torch gate conventions: r, z, n blocks stacked along dim 0)
# ---------------------------------------------------------------------------

def init_gru(key, in_dim, hidden, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    w_hh = _orthogonal(k2, (3 * hidden, hidden), dtype)  # reference init_weights
    return {
        "w_ih": jax.random.uniform(k1, (3 * hidden, in_dim), dtype, -bound, bound),
        "w_hh": w_hh,
        "b_ih": jax.random.uniform(k3, (3 * hidden,), dtype, -bound, bound),
        "b_hh": jax.random.uniform(k4, (3 * hidden,), dtype, -bound, bound),
    }


def _orthogonal(key, shape, dtype):
    # orthogonal init of recurrent weights (reference: radae_base.py:72-77)
    rows, cols = shape
    n = max(rows, cols)
    a = jax.random.normal(key, (n, n), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    return q[:rows, :cols].astype(dtype)


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
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim * 2)
    return {
        # torch Conv1d layout (out, in, k) kept for checkpoint conversion
        "w": jax.random.uniform(kw, (out_dim, in_dim, 2), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
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
    v = _orthogonal(key, (feat, feat), dtype)
    g = jnp.linalg.norm(v, axis=1)
    return {"v": v, "g": g}


def glu_weight(params):
    v = params["v"]
    return params["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)


def glu(params, x):
    """x * sigmoid(W x) with weight-normed W."""
    return x * jax.nn.sigmoid(x @ glu_weight(params).T)
