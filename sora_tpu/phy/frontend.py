"""On-device sample-rate front end: DC removal, decimation, resampling,
pulse shaping.

The reference RX graphs start at the radio rate — 40 Msps (Sora<->Sora) or
44 Msps (11b interop with commercial NICs) — and run an in-graph front end
before any demodulation:

* ``TDCRemoveEx<4>`` / ``TDCEstimator`` — DC offset removal
  (kernel/brick/inc/dc.hpp:48-166),
* ``TDownSample2`` — 40 -> 20 Msps for OFDM
  (kernel/bb/Brick11/src/samples.hpp:11-47),
* ``TDownSample44_40`` / ``TUpsample40MTo44M`` — 44 <-> 40 rational
  resampling (sampling.hpp:10-66, 44MTo40M.hpp),
* ``TMatchFilter`` / ``TPulseShaper`` — RRC matched filtering for DSSS
  (pulse.hpp:44-260),
* ``TSymTiming`` — decimation-phase selection by correlation peak
  tracking (symtiming.hpp:177).

TPU redesign: every stage is a batched tensor op fused into the RX jit —
DC removal is a mean-subtract, FIRs are static shifted-add accumulations
(O(N) memory, VPU-friendly, fully fusable by XLA), decimation is a stride
slice, and phase selection is a fold-energy argmax over all phases at once
instead of a per-sample tracking loop.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.dsp import filters as df


# =============================================================================
# Filter prototypes (recomputed at import — no LUT stock)
# =============================================================================


@lru_cache(maxsize=None)
def halfband_taps(ntaps: int = 23) -> np.ndarray:
    """Odd-length halfband low-pass (cutoff = fs/4): every other tap is
    exactly zero, so the polyphase decimator costs ~ntaps/2 MACs/sample."""
    assert ntaps % 2 == 1
    n = np.arange(ntaps) - (ntaps - 1) / 2
    h = np.sinc(n / 2.0) * np.hamming(ntaps)      # sinc zeroes the even taps
    return (h / h.sum()).astype(np.float32)


@lru_cache(maxsize=None)
def rrc_taps(beta: float = 0.5, sps: int = 4, span: int = 8) -> np.ndarray:
    """Root-raised-cosine prototype, unit energy (TPulseShaper /
    TMatchFilter coefficient tables, pulse.hpp:44-260 — recomputed)."""
    n = np.arange(-span * sps, span * sps + 1, dtype=np.float64)
    t = n / sps
    h = np.zeros_like(t)
    for i, ti in enumerate(t):
        if abs(ti) < 1e-9:
            h[i] = 1.0 - beta + 4 * beta / np.pi
        elif abs(abs(4 * beta * ti) - 1.0) < 1e-9:
            h[i] = (beta / np.sqrt(2)) * (
                (1 + 2 / np.pi) * np.sin(np.pi / (4 * beta))
                + (1 - 2 / np.pi) * np.cos(np.pi / (4 * beta)))
        else:
            h[i] = (np.sin(np.pi * ti * (1 - beta))
                    + 4 * beta * ti * np.cos(np.pi * ti * (1 + beta))) / (
                np.pi * ti * (1 - (4 * beta * ti) ** 2))
    return (h / np.sqrt(np.sum(h ** 2))).astype(np.float32)


@lru_cache(maxsize=None)
def _resample_taps(up: int, down: int, taps_per_phase: int = 10
                   ) -> np.ndarray:
    """Windowed-sinc prototype for a rational up/down resampler, designed
    at the zero-stuffed rate with cutoff min(1/up, 1/down) * Nyquist."""
    m = max(up, down)
    ntaps = taps_per_phase * m + 1
    n = np.arange(ntaps) - (ntaps - 1) / 2
    cutoff = 1.0 / m                               # fraction of Nyquist
    h = np.sinc(n * cutoff) * np.hamming(ntaps) * cutoff
    return (h / np.abs(np.fft.fft(h, 4096)).max()).astype(np.float32)


# =============================================================================
# Stages (all batched over leading axes, jit-safe)
# =============================================================================


@jax.jit
def dc_remove(x: jnp.ndarray) -> jnp.ndarray:
    """Per-stream DC removal over the processing window — the block analogue
    of TDCRemoveEx/TDCEstimator's IIR tracker (dc.hpp:48-166): the offset is
    a hardware constant, so the window mean estimates it with O(1/sqrt(N))
    error and one VPU reduction."""
    return x - jnp.mean(x, axis=-1, keepdims=True)


fir_centered = df.fir_centered


@partial(jax.jit, static_argnames=("phase", "filtered"))
def downsample2(x: jnp.ndarray, phase: int = 0,
                filtered: bool = True) -> jnp.ndarray:
    """40 -> 20 Msps (TDownSample2, samples.hpp:11-47) with an optional
    halfband anti-alias filter (the 52-carrier OFDM signal occupies
    +-8.3 MHz, so the out-of-band half contributes only noise)."""
    if filtered:
        x = fir_centered(x, halfband_taps())
    return x[..., phase::2]


@partial(jax.jit, static_argnames=("up", "down"))
def resample(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Rational-rate resample via the polyphase prototype (TUpsample40MTo44M
    / TDownSample44_40, sampling.hpp:10-66)."""
    return df.resample_poly(x, up, down, _resample_taps(up, down))


@jax.jit
def upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """20 -> 40 Msps halfband interpolation — the TX staging rate of the
    reference (its mod graphs emit 40 Msps waveforms for the RCB)."""
    n = x.shape[-1]
    y = jnp.zeros(x.shape[:-1] + (2 * n,), dtype=x.dtype)
    y = y.at[..., ::2].set(x)
    return fir_centered(y, 2.0 * halfband_taps())


# ------------------------------- OFDM (11a/n) -------------------------------


@partial(jax.jit, static_argnames=("phase",))
def ofdm_frontend_40m(x40: jnp.ndarray, phase: int = 0) -> jnp.ndarray:
    """Raw 40 Msps RX samples -> DC-free 20 Msps stream for the 11a/11n
    chains.  This is the in-chain front end the reference runs as
    TDownSample2 -> TDCRemoveEx before TCCA11a
    (fb11ademod_config.hpp:148-218)."""
    return downsample2(dc_remove(x40), phase=phase)


@jax.jit
def ofdm_frontend_44m(x44: jnp.ndarray) -> jnp.ndarray:
    """Raw 44 Msps RX samples -> 20 Msps stream: the 11a/11n
    commercial-NIC interop mode (CreateDemodGraph11a_44M,
    kernel/bb/umxsdrbrick/fb11ademod_config.hpp:221 — TDownSample44_40
    ahead of the standard graph).  10/11 polyphase resample to 40 Msps,
    then the usual halfband decimation."""
    return downsample2(resample(dc_remove(x44), 10, 11))


def ofdm_frontend(x: jnp.ndarray, input_rate: str) -> jnp.ndarray:
    """Dispatch the OFDM front end by input rate string ("20m" = already
    at chain rate, "40m" = Sora<->Sora radio rate, "44m" = NIC interop)."""
    if input_rate == "20m":
        return x
    if input_rate == "40m":
        return ofdm_frontend_40m(x)
    if input_rate == "44m":
        return ofdm_frontend_44m(x)
    raise ValueError(f"unknown OFDM input_rate {input_rate!r}")


@jax.jit
def ofdm_upsample_44m(x20: jnp.ndarray) -> jnp.ndarray:
    """20 Msps OFDM waveform -> 44 Msps TX staging: the TX half of the
    interop mode (CreateModGraph11a_44M + TUpsample40MTo44M,
    kernel/bb/umxsdrbrick/fb11amod_config.hpp:114-118)."""
    return resample(upsample2(x20), 11, 10)


# ------------------------------- DSSS (11b) ---------------------------------

_SPS44 = 4                 # 44 Msps / 11 MHz chips


@jax.jit
def chip_frontend_44m(x44: jnp.ndarray) -> jnp.ndarray:
    """44 Msps RX samples -> 11 Msps chips: DC removal, RRC matched filter,
    fold-energy decimation-phase selection (the vectorized TSymTiming,
    symtiming.hpp:177: after matched filtering the chip stream is
    cyclostationary with period sps, so per-phase mean power peaks at the
    chip centers — argmax replaces the per-sample tracking loop).

    Returns (B, N//4) complex64 chips."""
    y = fir_centered(dc_remove(x44), rrc_taps(sps=_SPS44))
    n4 = (y.shape[-1] // _SPS44) * _SPS44
    ph = y[..., :n4].reshape(*y.shape[:-1], n4 // _SPS44, _SPS44)
    score = jnp.sum(jnp.abs(ph) ** 2, axis=-2)          # (..., 4)
    best = jnp.argmax(score, axis=-1)                   # (...,)
    chips = jnp.take_along_axis(
        ph, best[..., None, None], axis=-1)[..., 0]
    return chips


@jax.jit
def chip_frontend_40m(x40: jnp.ndarray) -> jnp.ndarray:
    """40 Msps RX samples -> 11 Msps chips via 11/10 resample to 44 Msps
    then the 44 Msps chip front end (the 11b Sora<->Sora sampling mode,
    umxsdrbrick/main.cpp:19 + sampling.hpp:10-36)."""
    return chip_frontend_44m(resample(x40, 11, 10))


@partial(jax.jit, static_argnames=("sps",))
def pulse_shape_11b(chips: jnp.ndarray, sps: int = _SPS44) -> jnp.ndarray:
    """11 Msps chips -> 44 Msps RRC pulse-shaped waveform (TPulseShaper,
    pulse.hpp:44-146) — the TX-side counterpart of chip_frontend_44m."""
    n = chips.shape[-1]
    y = jnp.zeros(chips.shape[:-1] + (sps * n,), dtype=jnp.complex64)
    y = y.at[..., ::sps].set(chips.astype(jnp.complex64))
    # unit-energy RRC on both ends composes to a unit-gain raised cosine
    # at the chip centers (zero ISI), so chips survive the TX->RX pair
    # at unit amplitude
    return fir_centered(y, rrc_taps(sps=sps))


# --------------------------- TV whitespace (tvws) ---------------------------


@partial(jax.jit, static_argnames=("decim",))
def channelize(x: jnp.ndarray, f_norm: float, decim: int = 2
               ) -> jnp.ndarray:
    """Extract one channel from a wideband stream: complex mix to
    baseband, anti-alias lowpass, decimate — the umxistanbul channelized
    front end (tvws11a.hpp: the TV-whitespace variant inserts a frequency
    shift + channel filter ahead of the standard 11a graph,
    /root/reference/kernel/bb/umxistanbul/).

    x: (..., N) wideband complex stream; ``f_norm`` = channel center
    frequency / input sample rate; ``decim`` input samples per output
    sample (2 for a 40 Msps capture of 20 Msps channels).
    """
    assert decim >= 1 and (decim & (decim - 1)) == 0, \
        "channelize decimates by halfband stages: decim must be 2^k"
    n = x.shape[-1]
    osc = jnp.exp(-2j * jnp.pi * f_norm * jnp.arange(n, dtype=jnp.float32))
    y = dc_remove(x) * osc
    for _ in range(max(0, decim.bit_length() - 1)):
        y = downsample2(y)
    return y
