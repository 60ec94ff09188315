"""CRC-32/16 on device — JAX.

The reference checks the 802.11 FCS incrementally with byte LUTs
(kernel/core/inc/CRC32.h, used by TBB11aFrameSink, PHY_11a.hpp:607-702).
On TPU a 256-entry gather per byte would serialize; instead we use the
bit-matrix formulation: processing one byte is an affine map over GF(2)^32,
so processing a *block* of bytes is a chain of precomputed XOR matrices.
For frame checking (a few kB) the simple byte-table `lax.scan` is plenty
and is what `crc32_bytes` does; it exists mainly so whole RX pipelines can
run start-to-finish on device without a host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.mac.frame import crc32_table

_TBL = crc32_table().astype(np.uint32)   # numpy: embeds as constant


@jax.jit
def crc32_bytes(data: jnp.ndarray) -> jnp.ndarray:
    """CRC-32 (IEEE, reflected) of a uint8 vector; scalar uint32 result."""
    def step(crc, b):
        idx = (crc ^ b.astype(jnp.uint32)) & jnp.uint32(0xFF)
        return jnp.asarray(_TBL)[idx] ^ (crc >> jnp.uint32(8)), None

    crc, _ = jax.lax.scan(step, jnp.uint32(0xFFFFFFFF),
                          data.astype(jnp.uint8))
    return crc ^ jnp.uint32(0xFFFFFFFF)


@jax.jit
def crc32_batch(data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Batched masked CRC-32.

    data: (B, N) uint8, each row a frame padded to N; lengths: (B,) valid
    byte counts.  Bytes at or beyond a row's length do not affect its CRC
    (the scan carries the finished value through).
    """
    def step(crc, inp):
        b, t = inp
        idx = (crc ^ b.astype(jnp.uint32)) & jnp.uint32(0xFF)
        nxt = jnp.asarray(_TBL)[idx] ^ (crc >> jnp.uint32(8))
        return jnp.where(t < lengths, nxt, crc), None

    B, N = data.shape
    ts = jnp.arange(N)
    crc, _ = jax.lax.scan(
        step, jnp.full((B,), 0xFFFFFFFF, dtype=jnp.uint32),
        (data.T, ts))
    return crc ^ jnp.uint32(0xFFFFFFFF)


def crc16_bits(bits: np.ndarray) -> int:
    """CRC-16 of the 802.11b PLCP header (Clause 18.2.3.6; the reference
    computes it at PHY_11b.hpp:126): poly x^16+x^12+x^5+1, init 0xFFFF,
    ones-complement result, input is the LSB-first PLCP bit stream."""
    crc = 0xFFFF
    for bit in np.asarray(bits, dtype=np.uint8):
        c15 = (crc >> 15) & 1
        crc = (crc << 1) & 0xFFFF
        if c15 ^ int(bit):
            crc ^= 0x1021
    return (~crc) & 0xFFFF
