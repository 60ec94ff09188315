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


# 12-bit scaling for the int16 wire format: unit-amplitude float samples
# quantize at -66 dBFS — far below channel noise at any usable SNR
I16_SCALE = 2048.0


@jax.jit
def _combine_i16(h: jnp.ndarray) -> jnp.ndarray:
    f = h.astype(jnp.float32) * jnp.float32(1.0 / I16_SCALE)
    return jax.lax.complex(f[..., 0], f[..., 1])


def device_complex16(x, sharding=None, scale: float = 1.0) -> jnp.ndarray:
    """Host complex array -> device complex64 over an int16 I/Q wire —
    the reference's COMPLEX16 RX DMA convention (_rx_manager.h:85-137),
    and HALF the boundary bytes of :func:`device_complex`.  Used by the
    live node, where host->device bandwidth is the streaming budget.

    ``scale`` is a gain applied at the quantizer — the software stand-in
    for the radio's analog RX gain ahead of the ADC (the node's AGC
    drives it); it folds into the existing multiply, costing nothing.
    The device-side value keeps the scale (the AGC divides it back out
    of its power measurements)."""
    x = np.asarray(x)
    h = np.empty(x.shape + (2,), np.int16)
    f = np.multiply(x.real, I16_SCALE * scale, dtype=np.float32)
    np.clip(f, -32767.0, 32767.0, out=f)      # ADC saturates, never wraps
    h[..., 0] = f
    np.multiply(x.imag, I16_SCALE * scale, out=f, dtype=np.float32)
    np.clip(f, -32767.0, 32767.0, out=f)
    h[..., 1] = f
    hd = jax.device_put(h) if sharding is None else jax.device_put(
        h, sharding)
    return _combine_i16(hd)


# 6-bit-headroom scaling for the int8 wire: at the node's AGC amplitude
# target (~1.0 rms) OFDM peaks (~10 dB PAPR) stay inside +-127 while the
# quantization floor sits ~35 dB under the signal — above every rate's
# operating SNR.  Real front ends ship 8-bit ADCs at exactly this
# trade-off; the AGC is what makes the fixed scale safe.
I8_SCALE = 32.0


@jax.jit
def _combine_i8(h: jnp.ndarray) -> jnp.ndarray:
    f = h.astype(jnp.float32) * jnp.float32(1.0 / I8_SCALE)
    return jax.lax.complex(f[..., 0], f[..., 1])


def device_quantized(h: np.ndarray, sharding=None) -> jnp.ndarray:
    """Pre-quantized (..., 2) int16/int8 interleaved I/Q (e.g. assembled
    and scaled by the native ring's windowed reader) -> device complex64.
    The inverse fixed scale (I16_SCALE / I8_SCALE) divides out on
    device, matching device_complex16/device_complex8."""
    hd = jax.device_put(h) if sharding is None else jax.device_put(
        h, sharding)
    return _combine_i8(hd) if h.dtype == np.int8 else _combine_i16(hd)


def device_complex8(x, sharding=None, scale: float = 1.0) -> jnp.ndarray:
    """Host complex array -> device complex64 over an int8 I/Q wire —
    QUARTER the boundary bytes of :func:`device_complex`.  For the live
    node on bandwidth-starved links (the axon tunnel moves ~45 MB/s; a
    20 Msps int16 feed needs 80), with the AGC keeping the signal at the
    quantizer's design amplitude."""
    x = np.asarray(x)
    h = np.empty(x.shape + (2,), np.int8)
    f = np.multiply(x.real, I8_SCALE * scale, dtype=np.float32)
    np.clip(f, -127.0, 127.0, out=f)          # ADC saturates, never wraps
    h[..., 0] = f
    np.multiply(x.imag, I8_SCALE * scale, out=f, dtype=np.float32)
    np.clip(f, -127.0, 127.0, out=f)
    h[..., 1] = f
    hd = jax.device_put(h) if sharding is None else jax.device_put(
        h, sharding)
    return _combine_i8(hd)
