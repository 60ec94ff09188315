"""Batched small FFTs as DFT matmuls — the TPU-idiomatic OFDM transform.

The reference computes 64/128-point fixed-point FFTs with a template
radix-4 SSE kernel and megabytes of twiddle LUTs
(kernel/core/inc/fft_r4dif.h + fft_lut_twiddle.h).  On TPU the right
design for N<=256 is a dense DFT matrix contraction: a batch of symbols
(nsym, 64) hits the MXU as two real matmuls per real/imag part, XLA fuses
scaling and windowing around it, and there is no twiddle traffic at all.
Cost for the 802.11 hot path (64-pt, 250 k symbols/s at 20 Msps) is far
below one MXU's roofline, so the transform disappears into the pipeline.

For large transforms (spectrum analysis, HwVeri's 32K FFT) use
``jax.numpy.fft`` which lowers to XLA's native FFT.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool, dtype=np.float32):
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    sgn = 1.0 if inverse else -1.0
    c = np.cos(ang).astype(dtype)
    s = (sgn * np.sin(ang)).astype(dtype)
    if inverse:
        c = c / n
        s = s / n
    return c, s


def dft(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """DFT over the last axis of a complex array via real MXU matmuls.

    Forward matches ``np.fft.fft``; inverse matches ``np.fft.ifft``
    (1/N scaling).
    """
    n = x.shape[-1]
    c, s = _dft_mats(n, inverse)
    c = jnp.asarray(c)
    s = jnp.asarray(s)
    xr = jnp.real(x)
    xi = jnp.imag(x)
    # (re + j im) @ (C + jS) = (re@C - im@S) + j(re@S + im@C)
    # HIGHEST precision: TPU matmul otherwise truncates inputs to bf16
    # (~8 mantissa bits), which costs ~30 dB of effective SNR — fatal for
    # 64-QAM equalization.  The 64-pt DFT is tiny; fp32 passes are free.
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
    yr = mm(xr, c) - mm(xi, s)
    yi = mm(xr, s) + mm(xi, c)
    return yr + 1j * yi


def fft64(x: jnp.ndarray) -> jnp.ndarray:
    """Batched 64-point FFT (last axis), the OFDM demod transform
    (reference: TFFT64, kernel/bb/Brick11/src/fft.hpp:110-140)."""
    assert x.shape[-1] == 64
    return dft(x, inverse=False)


def ifft64(x: jnp.ndarray) -> jnp.ndarray:
    """Batched 64-point IFFT (reference: TIFFTx, fft.hpp:9-108)."""
    assert x.shape[-1] == 64
    return dft(x, inverse=True)
