"""CRC-32/16 on device — JAX.

The reference checks the 802.11 FCS incrementally with byte LUTs
(kernel/core/inc/CRC32.h, used by TBB11aFrameSink, PHY_11a.hpp:607-702).
A 256-entry gather per byte would serialize on TPU (a ~1500-step scan
costs milliseconds), so the batched checker uses the bit-matrix
formulation instead: the CRC register update is affine over GF(2)^32, so
the CRC of a fixed-length message is ``c0 XOR (bits @ V)`` for a
precomputed (8N, 32) matrix V — ONE f32 matmul on the MXU (column sums
stay < 2^24, so f32 carries the GF(2) arithmetic exactly, reduced mod 2
afterwards).  Variable lengths are handled by zero-padding every row to N
and then *unwinding* the zero tail: appending k zero bytes applies the
linear map A^k to the register, so applying (A^-1)^k — decomposed into
log2(N) conditional 32x32 bit-matrix multiplies keyed on the bits of k —
recovers each row's true CRC.  No scan, no gather.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.mac.frame import crc32_table

_TBL = crc32_table().astype(np.uint32)   # numpy: embeds as constant


@jax.jit
def crc32_bytes(data: jnp.ndarray) -> jnp.ndarray:
    """CRC-32 (IEEE, reflected) of a uint8 vector; scalar uint32 result.
    Byte-LUT scan — fine for one-off host-side checks; hot pipelines use
    :func:`crc32_batch`."""
    def step(crc, b):
        idx = (crc ^ b.astype(jnp.uint32)) & jnp.uint32(0xFF)
        return jnp.asarray(_TBL)[idx] ^ (crc >> jnp.uint32(8)), None

    crc, _ = jax.lax.scan(step, jnp.uint32(0xFFFFFFFF),
                          data.astype(jnp.uint8))
    return crc ^ jnp.uint32(0xFFFFFFFF)


def _bits32(v: int) -> np.ndarray:
    return np.array([(v >> i) & 1 for i in range(32)], np.uint8)


@lru_cache(maxsize=None)
def _crc32_mats(N: int):
    """Precompute the affine CRC machinery for length-N messages.

    Returns (V (8N, 32) f32 — bit j of byte t maps to row 8t+j;
    g0 (32,) uint8 — register after N zero bytes from init 0xFFFFFFFF;
    inv_pows (ceil(log2(N+1)), 32, 32) f32 — (A^-1)^(2^i) bit matrices).
    """
    # A: one zero-byte register step crc' = TBL[crc & 0xFF] ^ (crc >> 8);
    # columns are the images of unit register bits
    A = np.zeros((32, 32), np.uint8)
    for i in range(32):
        v = 1 << i
        img = int(_TBL[v & 0xFF]) ^ (v >> 8)
        A[:, i] = _bits32(img)
    # D: data-byte injection (register 0): crc' = TBL[b]
    D = np.zeros((32, 8), np.uint8)
    for j in range(8):
        D[:, j] = _bits32(int(_TBL[1 << j]))
    # W_t = A^(N-1-t) . D, built back to front
    V = np.zeros((N, 8, 32), np.uint8)
    W = D.copy()
    for t in range(N - 1, -1, -1):
        V[t] = W.T
        W = (A @ W) % 2
    # register after N zero bytes from init (no final xor)
    g = 0xFFFFFFFF
    for _ in range(N):
        g = int(_TBL[g & 0xFF]) ^ (g >> 8)
    # A^-1 over GF(2) and its power-of-two powers
    Ainv = _gf2_inv(A)
    nbits = max(1, int(np.ceil(np.log2(N + 1))))
    inv_pows = np.zeros((nbits, 32, 32), np.uint8)
    P = Ainv
    for i in range(nbits):
        inv_pows[i] = P
        P = (P @ P) % 2
    return (V.reshape(8 * N, 32).astype(np.float32), _bits32(g),
            inv_pows.astype(np.float32))


def _gf2_inv(A: np.ndarray) -> np.ndarray:
    """Invert a GF(2) matrix by Gauss-Jordan."""
    n = A.shape[0]
    M = np.concatenate([A.astype(np.uint8) % 2, np.eye(n, dtype=np.uint8)],
                       axis=1)
    r = 0
    for c in range(n):
        piv = next(i for i in range(r, n) if M[i, c])
        M[[r, piv]] = M[[piv, r]]
        for i in range(n):
            if i != r and M[i, c]:
                M[i] ^= M[r]
        r += 1
    return M[:, n:]


@jax.jit
def crc32_batch(data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Batched variable-length CRC-32 with no scan.

    data: (B, N) uint8, each row a frame padded to N; lengths: (B,) valid
    byte counts.  Bytes at or beyond a row's length do not affect its CRC.
    """
    B, N = data.shape
    V, g0, inv_pows = _crc32_mats(N)
    ts = jnp.arange(N)[None, :]
    masked = jnp.where(ts < lengths[:, None], data, 0).astype(jnp.int32)
    bits = ((masked[:, :, None] >> jnp.arange(8)[None, None, :]) & 1)
    bits = bits.reshape(B, 8 * N).astype(jnp.float32)
    # register after the zero-padded message (linear part + zero-message
    # register); f32 matmul is exact (column sums < 2^24), reduce mod 2
    reg = jnp.matmul(bits, jnp.asarray(V),
                     precision=jax.lax.Precision.HIGHEST)
    reg = (reg.astype(jnp.int32) & 1) ^ jnp.asarray(g0, jnp.int32)[None, :]
    # unwind the (N - length) zero tail: apply (A^-1)^k via k's bits
    k = (N - lengths).astype(jnp.int32)
    reg = reg.astype(jnp.float32)
    for i in range(inv_pows.shape[0]):
        stepped = jnp.matmul(reg, jnp.asarray(inv_pows[i]).T,
                             precision=jax.lax.Precision.HIGHEST)
        stepped = (stepped.astype(jnp.int32) & 1).astype(jnp.float32)
        take = ((k >> i) & 1).astype(jnp.float32)[:, None]
        reg = take * stepped + (1.0 - take) * reg
    regi = reg.astype(jnp.uint32)
    crc = jnp.sum(regi << jnp.arange(32, dtype=jnp.uint32)[None, :],
                  axis=1, dtype=jnp.uint32)
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
