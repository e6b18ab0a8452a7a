"""Device<->host transfer helpers.

Some TPU runtimes cannot transfer complex64 buffers device->host (the
transfer layer, not the compute path — complex math inside jit is fine).
`to_host` therefore converts complex arrays to interleaved (re, im) float32
on device first and reassembles the complex numpy array on host.  Use it for
every readback that might be complex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _interleave(x):
    return jnp.stack([x.real, x.imag], axis=-1)


def to_host(x) -> np.ndarray:
    """Fetch a device array to host numpy, complex-safe."""
    if isinstance(x, np.ndarray):
        return x
    if jnp.iscomplexobj(x):
        pair = np.asarray(_interleave(x))
        return (pair[..., 0] + 1j * pair[..., 1]).astype(np.complex64)
    return np.asarray(x)


def host_complex(x) -> np.ndarray:
    """Alias of to_host for call sites that document complex intent."""
    return to_host(x)


def device_put_tree(tree, device=None):
    """Transfer a (numpy) pytree to device via ONE flat buffer.

    Per-leaf device_put issues one transfer per tensor, which is slow on
    remote-tunnelled TPU runtimes (observed ~2s/tensor).  Packing ~80 model
    tensors into a single f32 buffer turns 150s of transfers into one."""
    import jax.tree_util as jtu
    leaves, treedef = jtu.tree_flatten(tree)
    leaves = [np.asarray(l) for l in leaves]
    assert all(l.dtype == np.float32 for l in leaves), \
        "device_put_tree currently supports float32 trees"
    sizes = [l.size for l in leaves]
    flat = np.concatenate([l.ravel() for l in leaves])
    flat_dev = jax.device_put(flat, device)

    shapes = [l.shape for l in leaves]
    offs = np.cumsum([0] + sizes)

    @jax.jit
    def unpack(buf):
        return [jax.lax.dynamic_slice(buf, (int(o),), (int(s),)).reshape(shape)
                for o, s, shape in zip(offs[:-1], sizes, shapes)]

    return jtu.tree_unflatten(treedef, unpack(flat_dev))
