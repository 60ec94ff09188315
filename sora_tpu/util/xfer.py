"""Host<->device transfer helpers for complex sample streams.

The axon TPU runtime cannot move complex64 buffers across the host<->device
boundary (the transfer layer returns UNIMPLEMENTED, and an executable fed a
host-transferred complex array produces poisoned outputs).  Complex math ON
the device is fully supported — only the boundary is restricted.  So every
boundary crossing ships float32 with a trailing (re, im) axis and the
combine/split happens on device.

This mirrors the reference's own boundary convention: the RX DMA ring
carries interleaved I/Q int16 pairs (kernel/core/src/_rx_manager.h:85-137),
not a "complex" type — complexness is a view the DSP code imposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(f: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(f[..., 0], f[..., 1])


@jax.jit
def _split(z: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def device_complex(x, sharding=None) -> jnp.ndarray:
    """Host complex array -> device complex64, via a float32 (..., 2)
    transfer (complex never crosses the boundary)."""
    x = np.asarray(x)
    f = np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    fd = jax.device_put(f) if sharding is None else jax.device_put(f, sharding)
    return _combine(fd)


def fetch(tree):
    """Device pytree -> host numpy; complex leaves are split on device and
    reassembled on the host."""
    def pull(v):
        if hasattr(v, "dtype") and jnp.iscomplexobj(v):
            f = np.asarray(_split(v))
            return (f[..., 0] + 1j * f[..., 1]).astype(np.complex64)
        return np.asarray(v)

    return jax.tree.map(pull, tree)
