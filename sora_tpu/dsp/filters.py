"""Streaming filter/correlator primitives — JAX, batched.

The reference's FIR/decimation/correlation bricks (TDownSample2 in
samples.hpp, pulse shaping RRC in pulse.hpp, CCA correlators in cca.hpp)
become dense batched ops: correlation against short patterns is an MXU
matmul over a window-unfolded view; decimation is a stride slice fused by
XLA.  Long-stream processing uses overlap-save block framing
(``frame_blocks``) so work shards over devices with only halo exchange —
the SURVEY §2.9/P8 sequence-parallel analogue.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def decimate2(x: jnp.ndarray, phase: int = 0) -> jnp.ndarray:
    """40 -> 20 Msps downsample (TDownSample2, samples.hpp:11-47)."""
    return x[..., phase::2]


def window_view(x: jnp.ndarray, width: int, stride: int = 1) -> jnp.ndarray:
    """(..., N) -> (..., nwin, width) sliding windows (gather-based)."""
    n = x.shape[-1]
    nwin = (n - width) // stride + 1
    idx = (jnp.arange(nwin) * stride)[:, None] + jnp.arange(width)[None, :]
    return x[..., idx]


def correlate(x: jnp.ndarray, pattern: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlation sum_k x[n+k] * conj(p[k]) for every offset n.

    Returns (..., N - len(p) + 1).  Implemented as a complex matmul over
    unfolded windows: 4 real MXU matmuls, no FFT needed for short patterns.
    """
    w = len(pattern)
    v = window_view(x, w)                         # (..., nwin, w)
    pr = jnp.real(pattern).astype(jnp.float32)
    pi = jnp.imag(pattern).astype(jnp.float32)
    vr = jnp.real(v)
    vi = jnp.imag(v)
    rr = vr @ pr + vi @ pi
    ri = vi @ pr - vr @ pi
    return rr + 1j * ri


def correlate_stream(x: jnp.ndarray, pattern: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`correlate` but O(N) memory: accumulates len(pattern)
    statically-shifted scaled copies instead of unfolding windows.  Use for
    long streams (packet search over the whole RX buffer) where the
    window-unfolded matmul would materialize an (N, W) tensor."""
    w = len(pattern)
    nwin = x.shape[-1] - w + 1
    acc = jnp.zeros(x.shape[:-1] + (nwin,), dtype=x.dtype)
    pc = np.conj(np.asarray(pattern))
    for k in range(w):
        acc = acc + x[..., k: k + nwin] * pc[k]
    return acc


def moving_sum(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Sliding-window sum over the last axis, output length N - width + 1.

    The CAccumulator/CMovingWindow analogue (dspalg.hpp:5-243).  Short
    windows use a log2(width) doubling tree of shifted adds — fully
    lane-parallel on the VPU, where a cumsum lowers to a sequential scan;
    long windows fall back to the cumsum difference.
    """
    if width <= 256 and (width & (width - 1)) == 0:
        # doubling tree: after round k, acc[i] = sum x[i .. i+2^k)
        acc = x
        span = 1
        while span < width:
            acc = acc[..., : acc.shape[-1] - span] + acc[..., span:]
            span *= 2
        return acc
    c = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zero, c], axis=-1)
    return c[..., width:] - c[..., :-width]


def fir(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR over the last axis, same length (zero prehistory)."""
    t = len(taps)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(t - 1, 0)])
    return correlate(xp, jnp.conj(taps[::-1]))


def fir_centered(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Zero-phase FIR over the last axis (group-delay compensated), same
    length.  Static shifted-add accumulation: O(N) memory, ntaps VPU adds,
    fully fused by XLA — the long-stream form (cf. correlate_stream)."""
    t = np.asarray(taps)
    half = (len(t) - 1) // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, len(t) - 1 - half)])
    acc = jnp.zeros_like(x)
    for k in range(len(t)):
        if abs(complex(t[k])) < 1e-12:
            continue
        acc = acc + xp[..., k: k + x.shape[-1]] * t[k]
    return acc


def frame_blocks(x: jnp.ndarray, block: int, halo: int) -> jnp.ndarray:
    """(N,) -> (nblk, block + 2*halo) overlap-save view, zero padded.

    Block i covers [i*block - halo, (i+1)*block + halo).  Downstream ops
    discard the halos; across shards the halo becomes a ppermute exchange
    (see sora_tpu.parallel.shard).
    """
    n = x.shape[-1]
    nblk = -(-n // block)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                 + [(halo, nblk * block - n + halo)])
    idx = (jnp.arange(nblk) * block)[:, None] + \
        jnp.arange(block + 2 * halo)[None, :]
    return xp[..., idx]


def resample_poly(x: jnp.ndarray, up: int, down: int,
                  taps: np.ndarray) -> jnp.ndarray:
    """Rational-rate polyphase resampler (TUpsample40MTo44M /
    TDownSample44_40 analogue, sampling.hpp).  taps: prototype low-pass
    designed at rate lcm.  Zero-phase: output sample k sits at input time
    k*down/up, so chained resamples stay aligned."""
    # zero-stuff by `up`, centered filter, take every `down`
    n = x.shape[-1]
    y = jnp.zeros(x.shape[:-1] + (n * up,), dtype=x.dtype)
    y = y.at[..., ::up].set(x)
    f = fir_centered(y, np.asarray(taps, dtype=np.float32))
    return f[..., ::down] * up
