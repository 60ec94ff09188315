"""Constellation mapping / soft demapping — JAX, batched.

Replaces the reference's per-byte mapper LUTs (mapper11a.hpp + mapa_*.c)
and clamped soft-demap LUTs (demapper11a.hpp + dsp_demap.h) with direct
VPU arithmetic: the piecewise-linear max-log LLRs are a handful of abs/sub
ops, cheaper on TPU than any table gather.

Bit convention matches sora_tpu.phy.common (LSB-first groups per axis,
I bits then Q bits); soft outputs are positive for bit 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.phy import common as C

_LVL = {
    "bpsk": jnp.asarray(C._BPSK_LVL, dtype=jnp.float32),
    "qpsk": jnp.asarray(C._QPSK_LVL, dtype=jnp.float32),
    "qam16": jnp.asarray(C._QAM16_LVL, dtype=jnp.float32),
    "qam64": jnp.asarray(C._QAM64_LVL, dtype=jnp.float32),
}

NBPSC = {"bpsk": 1, "qpsk": 2, "qam16": 4, "qam64": 6}


def map_bits(bits: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """(..., n*nbpsc) bits -> (..., n) complex64 unit-power symbols."""
    lv = _LVL[modulation]
    b = bits.astype(jnp.int32)
    if modulation == "bpsk":
        return lv[b].astype(jnp.complex64)
    n = NBPSC[modulation]
    g = b.reshape(*b.shape[:-1], -1, n)
    h = n // 2
    weights = jnp.asarray([1 << (h - 1 - i) for i in range(h)])
    i_idx = jnp.sum(g[..., :h] * weights, axis=-1)
    q_idx = jnp.sum(g[..., h:] * weights, axis=-1)
    return lv[i_idx] + 1j * lv[q_idx]


def demap_soft(sym: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """(..., n) symbols -> (..., n*nbpsc) soft metrics (positive => 1)."""
    I = jnp.real(sym).astype(jnp.float32)
    Q = jnp.imag(sym).astype(jnp.float32)
    if modulation == "bpsk":
        return I[..., None].reshape(*sym.shape[:-1], -1)
    if modulation == "qpsk":
        out = jnp.stack([I, Q], axis=-1) * np.sqrt(2.0, dtype=np.float32)
    elif modulation == "qam16":
        f = np.float32(np.sqrt(10.0))
        out = jnp.stack(
            [I, 2 / f - jnp.abs(I), Q, 2 / f - jnp.abs(Q)], axis=-1) * f
    elif modulation == "qam64":
        f = np.float32(np.sqrt(42.0))
        out = jnp.stack(
            [I, 4 / f - jnp.abs(I), 2 / f - jnp.abs(jnp.abs(I) - 4 / f),
             Q, 4 / f - jnp.abs(Q), 2 / f - jnp.abs(jnp.abs(Q) - 4 / f)],
            axis=-1) * f
    else:
        raise ValueError(modulation)
    return out.reshape(*sym.shape[:-1], -1)
