"""Split-complex arithmetic: complex tensors as (re, im) float32 planes.

complex64 is not a TPU hardware type — XLA emulates it, and some TPU
runtimes have gaps in that emulation (observed: complex elementwise ops
fused into larger programs fail with UNIMPLEMENTED, and complex64 buffers
cannot be transferred device->host).  All device-side modem/channel math in
radae_tpu therefore runs on explicit (re, im) float planes:

  * elementwise complex ops lower to plain VPU float ops,
  * the Nc<->M DFTs become pairs of real MXU matmuls,
  * phase rotations avoid angle/exp via conj-multiply normalisation.

complex64 appears only at host boundaries (file IO, numpy DSP).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class C(NamedTuple):
    """A complex tensor as two same-shape float planes (a jax pytree)."""
    re: jnp.ndarray
    im: jnp.ndarray

    @property
    def shape(self):
        return self.re.shape

    def reshape(self, *shape):
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx):
        return C(self.re[idx], self.im[idx])

    def conj(self):
        return C(self.re, -self.im)

    def __add__(self, o):
        if isinstance(o, C):
            return C(self.re + o.re, self.im + o.im)
        return C(self.re + o, self.im)

    def __sub__(self, o):
        if isinstance(o, C):
            return C(self.re - o.re, self.im - o.im)
        return C(self.re - o, self.im)

    def __mul__(self, o):
        if isinstance(o, C):
            return C(self.re * o.re - self.im * o.im,
                     self.re * o.im + self.im * o.re)
        return C(self.re * o, self.im * o)   # real scalar/tensor

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, C):
            d = o.re * o.re + o.im * o.im
            return C((self.re * o.re + self.im * o.im) / d,
                     (self.im * o.re - self.re * o.im) / d)
        return C(self.re / o, self.im / o)

    def abs2(self):
        return self.re * self.re + self.im * self.im

    def abs(self):
        return jnp.sqrt(self.abs2())

    def unit(self, eps=1e-12):
        """self / |self| — the phase factor, without computing the angle."""
        r = jnp.sqrt(self.abs2() + eps)
        return C(self.re / r, self.im / r)


# ---------------------------------------------------------------------------
# construction / conversion
# ---------------------------------------------------------------------------

def of(x) -> C:
    """Make a C from a complex (numpy/jax) array, a real array, or a C."""
    if isinstance(x, C):
        return x
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        # host side: split before transfer
        return C(jnp.asarray(np.ascontiguousarray(x.real)),
                 jnp.asarray(np.ascontiguousarray(x.imag)))
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return C(x.real, x.imag)
    return C(x, jnp.zeros_like(x))


def zeros(shape, dtype=jnp.float32) -> C:
    return C(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def to_c64(x: C) -> np.ndarray:
    """Fetch to host as numpy complex64 (device->host of floats only)."""
    return (np.asarray(x.re) + 1j * np.asarray(x.im)).astype(np.complex64)


def expj(theta) -> C:
    """e^{j theta} for a real tensor theta."""
    return C(jnp.cos(theta), jnp.sin(theta))


def matmul(a: C, w: C) -> C:
    """(a @ w) for split operands: four real MXU matmuls."""
    return C(a.re @ w.re - a.im @ w.im, a.re @ w.im + a.im @ w.re)


def matmul_const(a: C, w_np: np.ndarray) -> C:
    """a @ W with W a host-side complex numpy constant (split on host)."""
    wr = jnp.asarray(np.ascontiguousarray(w_np.real.astype(np.float32)))
    wi = jnp.asarray(np.ascontiguousarray(w_np.imag.astype(np.float32)))
    return C(a.re @ wr - a.im @ wi, a.re @ wi + a.im @ wr)


def mul_const(a: C, z_np: np.ndarray) -> C:
    """a * z with z a host-side complex numpy constant."""
    zr = jnp.asarray(np.ascontiguousarray(z_np.real.astype(np.float32)))
    zi = jnp.asarray(np.ascontiguousarray(z_np.imag.astype(np.float32)))
    return a * C(zr, zi)


def where(mask, a: C, b: C) -> C:
    return C(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))


def concatenate(parts, axis=0) -> C:
    return C(jnp.concatenate([p.re for p in parts], axis),
             jnp.concatenate([p.im for p in parts], axis))


def stack_last(x: C):
    """Pack to an interleaved (..., 2) float array (for jit outputs)."""
    return jnp.stack([x.re, x.im], axis=-1)


def from_last(x) -> C:
    """Unpack an interleaved (..., 2) float array."""
    return C(x[..., 0], x[..., 1])


def pack_np(x: np.ndarray) -> np.ndarray:
    """Host: complex64 numpy -> (..., 2) float32 view for jit arguments."""
    x = np.ascontiguousarray(x, dtype=np.complex64)
    return x.view(np.float32).reshape(x.shape + (2,))


def unpack_np(x: np.ndarray) -> np.ndarray:
    """Host: (..., 2) float32 -> complex64 numpy."""
    x = np.ascontiguousarray(x, np.float32)
    return x.view(np.complex64).reshape(x.shape[:-1])
