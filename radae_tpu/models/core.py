"""Core RADAE encoder/decoder as stateful-by-construction JAX modules.

The reference maintains two module families — vanilla (whole-sequence) and
"Statefull" (streaming) — with weight-remapping glue between them
(reference: radae/radae_base.py:157-430, radae/radae.py:238-285).  Here a
single implementation serves both: every network is a function
    (params, x, state) -> (y, state)
where `state` carries GRU hidden vectors and causal-conv history.  Batch
processing == running from the zero state; streaming == threading the state
between calls.  Stateful-vs-vanilla equivalence is exact by construction.

Architecture (DenseNet-style concatenative skip stacks):
  Encoder: 4x10ms feature frames -> dense(64) -> 5x[GRU(64) | conv k2(96)]
           with concat skips -> dense(864 -> latent_dim) [+tanh if bottleneck 1]
           (reference: radae_base.py:157-220)
  Decoder: dense(96) -> 5x[GRU(96)+GLU | conv k2(32)] -> dense(736 -> 4*out)
           (reference: radae_base.py:291-354)

8-bit quantization noise n(x) follows every activation (radae_base.py:80-81).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]
State = Dict[str, Any]

FRAMES_PER_STEP = 4

# (layer_name, kind, in_dim_fn, out_dim, dilation)
_ENC_GRU_DIMS = [(64, 64), (224, 64), (384, 64), (544, 64), (704, 64)]
_ENC_CONV_DIMS = [(128, 96, 1), (288, 96, 2), (448, 96, 2), (608, 96, 2), (768, 96, 2)]
_ENC_CAT_DIM = 864

_DEC_GRU_DIMS = [(96, 96), (224, 96), (352, 96), (480, 96), (608, 96)]
_DEC_CONV_DIMS = [(192, 32, 1), (320, 32, 1), (448, 32, 1), (576, 32, 1), (704, 32, 1)]
_DEC_CAT_DIM = 736


class _NoiseStream:
    """Per-call stream of quantization-noise applications.

    When key is None the stream is a no-op (deterministic inference /
    parity testing)."""

    def __init__(self, key):
        self.key = key

    def __call__(self, x):
        if self.key is None:
            return x
        self.key, sub = jax.random.split(self.key)
        return L.quant_noise(sub, x)


class CoreEncoder:
    """Maps vocoder features to latent PSK symbols z."""

    FRAMES_PER_STEP = FRAMES_PER_STEP

    def __init__(self, feature_dim: int, output_dim: int, bottleneck: int = 1):
        self.feature_dim = feature_dim
        self.output_dim = output_dim
        self.bottleneck = bottleneck
        self.input_dim = FRAMES_PER_STEP * feature_dim

    def init(self, key) -> Params:
        rng = L.as_rng(key)   # host-side init; see layers.py
        p: Params = {"dense_1": L.init_dense(rng, self.input_dim, 64)}
        for i, ((gin, gh), (cin, cout, _)) in enumerate(
                zip(_ENC_GRU_DIMS, _ENC_CONV_DIMS), start=1):
            p[f"gru{i}"] = L.init_gru(rng, gin, gh)
            p[f"conv{i}"] = L.init_conv2tap(rng, cin, cout)
        p["z_dense"] = L.init_dense(rng, _ENC_CAT_DIM, self.output_dim)
        return p

    def zero_state(self, batch: int, dtype=jnp.float32) -> State:
        s: State = {}
        for i, ((_, gh), (cin, _, dil)) in enumerate(
                zip(_ENC_GRU_DIMS, _ENC_CONV_DIMS), start=1):
            s[f"gru{i}"] = L.gru_zero_state(batch, gh, dtype)
            s[f"conv{i}"] = L.conv2tap_zero_state(batch, cin, dil, dtype)
        return s

    def __call__(self, params: Params, features, key=None,
                 state: Optional[State] = None) -> Tuple[jnp.ndarray, State]:
        """Encode features to latents.

        Args:
          features: (B, T10ms, feature_dim); T10ms divisible by 4.
          key: PRNG key for quantization noise, or None to disable.
          state: carried streaming state; None = start of stream (zeros).
        Returns:
          z: (B, T10ms//4, output_dim), new_state.
        """
        B, T, F = features.shape
        if state is None:
            state = self.zero_state(B, features.dtype)
        n = _NoiseStream(key)
        new_state: State = {}

        # group FRAMES_PER_STEP frames into one step (learned transform
        # across time; reference: radae_base.py:199)
        x = features.reshape(B, T // FRAMES_PER_STEP, FRAMES_PER_STEP * F)

        x = n(jnp.tanh(L.dense(params["dense_1"], x)))
        for i, (_, (_, _, dil)) in enumerate(
                zip(_ENC_GRU_DIMS, _ENC_CONV_DIMS), start=1):
            y, new_state[f"gru{i}"] = L.gru(params[f"gru{i}"], x, state[f"gru{i}"])
            x = jnp.concatenate([x, n(y)], axis=-1)
            y, new_state[f"conv{i}"] = L.conv2tap(
                params[f"conv{i}"], x, state[f"conv{i}"], dilation=dil)
            x = jnp.concatenate([x, n(y)], axis=-1)

        z = L.dense(params["z_dense"], x)
        if self.bottleneck == 1:
            z = jnp.tanh(z)
        return z, new_state


class CoreDecoder:
    """Reconstructs vocoder features from received latents z_hat."""

    FRAMES_PER_STEP = FRAMES_PER_STEP

    def __init__(self, input_dim: int, output_dim: int):
        self.input_dim = input_dim
        self.output_dim = output_dim

    def init(self, key) -> Params:
        rng = L.as_rng(key)   # host-side init; see layers.py
        p: Params = {"dense_1": L.init_dense(rng, self.input_dim, 96)}
        for i, ((gin, gh), (cin, cout, _)) in enumerate(
                zip(_DEC_GRU_DIMS, _DEC_CONV_DIMS), start=1):
            p[f"gru{i}"] = L.init_gru(rng, gin, gh)
            p[f"glu{i}"] = L.init_glu(rng, gh)
            p[f"conv{i}"] = L.init_conv2tap(rng, cin, cout)
        p["output"] = L.init_dense(rng, _DEC_CAT_DIM,
                                   FRAMES_PER_STEP * self.output_dim)
        return p

    def zero_state(self, batch: int, dtype=jnp.float32) -> State:
        s: State = {}
        for i, ((_, gh), (cin, _, dil)) in enumerate(
                zip(_DEC_GRU_DIMS, _DEC_CONV_DIMS), start=1):
            s[f"gru{i}"] = L.gru_zero_state(batch, gh, dtype)
            s[f"conv{i}"] = L.conv2tap_zero_state(batch, cin, dil, dtype)
        return s

    def __call__(self, params: Params, z, key=None,
                 state: Optional[State] = None) -> Tuple[jnp.ndarray, State]:
        """Decode latents to features.

        Args:
          z: (B, Tz, input_dim)
        Returns:
          features: (B, 4*Tz, output_dim), new_state.
        """
        B, Tz, _ = z.shape
        if state is None:
            state = self.zero_state(B, z.real.dtype if jnp.iscomplexobj(z) else z.dtype)
        n = _NoiseStream(key)
        new_state: State = {}

        x = n(jnp.tanh(L.dense(params["dense_1"], z)))
        for i, (_, (_, _, dil)) in enumerate(
                zip(_DEC_GRU_DIMS, _DEC_CONV_DIMS), start=1):
            y, new_state[f"gru{i}"] = L.gru(params[f"gru{i}"], x, state[f"gru{i}"])
            y = n(L.glu(params[f"glu{i}"], n(y)))
            x = jnp.concatenate([x, y], axis=-1)
            y, new_state[f"conv{i}"] = L.conv2tap(
                params[f"conv{i}"], x, state[f"conv{i}"], dilation=dil)
            x = jnp.concatenate([x, n(y)], axis=-1)

        x = L.dense(params["output"], x)
        features = x.reshape(B, Tz * FRAMES_PER_STEP, self.output_dim)
        return features, new_state


def distortion_loss(y_true, y_pred):
    """Feature-domain distortion loss (reference: radae_base.py:50-68).

    Cepstral L2 + pitch-weighted L1 + voicing-correlation L2 (+ auxdata L2
    when 21 features).  Returns per-sequence loss, shape (B,).
    """
    nf = y_true.shape[-1]
    assert nf in (20, 21), "distortion loss is designed for 20 or 21 features"

    ceps_error = y_pred[..., :18] - y_true[..., :18]
    pitch_error = 2.0 * (y_pred[..., 18] - y_true[..., 18])
    corr_error = y_pred[..., 19] - y_true[..., 19]
    pitch_weight = jax.nn.relu(y_true[..., 19] + 0.5) ** 2
    # NB: in the reference the 1-wide pitch/corr/data terms broadcast across
    # the 18 cepstral columns before the feature-dim mean, so they enter at
    # full weight while the cepstral error enters as its mean.
    loss = (ceps_error ** 2).mean(axis=-1)
    loss = loss + 3.0 * (10.0 / 18.0) * jnp.abs(pitch_error) * pitch_weight
    loss = loss + (1.0 / 18.0) * corr_error ** 2
    if nf == 21:
        data_error = y_pred[..., 20] - y_true[..., 20]
        loss = loss + (0.5 / 18.0) * data_error ** 2
    return loss.mean(axis=-1)             # mean over time
