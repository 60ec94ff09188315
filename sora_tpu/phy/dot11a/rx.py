"""802.11a OFDM receiver — JAX, batched, jit-compiled.

TPU-first redesign of the reference RX brick graph
(kernel/bb/demod11/fb11ademod_config.hpp:148-218, diagram at :132-141):

* TCCA11a's per-sample carrier-sense state machine (cca.hpp:106-441)
  becomes *vectorized detection*: correlation scores for every offset at
  once, then argmax — no sequential scan over samples.
* The chain TFreqCompensation -> TFFT64 -> TChannelEqualization ->
  TPhaseCompensate/TPilotTrack (channel_11a.hpp, pilot.hpp) is one fused
  batched tensor program over all OFDM symbols of the frame at once: the
  FFT is a DFT matmul on the MXU, everything else is VPU elementwise.
* The rate demux TBB11aRxRateSel (PHY_11a.hpp:704-814) becomes per-rate
  jitted decode functions; the SIGNAL decode is shape-static so one small
  jit serves all frames.
* T11aViterbi's dedicated-core sliding decoder (viterbicore.h) becomes the
  batched/block-parallel decoder in sora_tpu.dsp.viterbi.

All entry points take a leading batch axis: the unit of work is a batch of
frame-bearing sample streams, which is what fills the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.dsp import crc as dcrc
from sora_tpu.dsp import fft as dfft
from sora_tpu.dsp import filters as df
from sora_tpu.dsp import mapping as dmap
from sora_tpu.dsp import scramble as dscr
from sora_tpu.dsp import viterbi as dvit
from sora_tpu.phy import common as C

_LTS_SYM = np.asarray(C.LTS_TIME_SYM, dtype=np.complex64)
_LTS_SIGN = np.zeros(64, dtype=np.float32)
_LTS_SIGN[C.OCC_BINS] = C.LTS_FREQ
_OCC_MASK = (_LTS_SIGN != 0)

MAX_PSDU = 2500           # bytes; reference MTU parity (PHY_11a.hpp:571)

# STS autocorrelation plateau quality below which the air is considered
# idle — the vectorized analogue of TCCA11a's no-energy early exit
# (cca.hpp:165-230, E_ERROR_CS_TIMEOUT).  Genuine preambles score ~1.0
# (>=0.96 measured down to ~10 dB SNR); the max over an 8192-sample noise
# window reaches ~0.45 (extreme-value statistics of the argmax).
CS_DET_THRESHOLD = 0.6


def max_symbols(rate: C.RateParam, max_psdu: int = MAX_PSDU) -> int:
    return -(-(16 + 8 * max_psdu + 6) // rate.ndbps)


# =============================================================================
# Synchronization (vectorized TCCA11a + T11aLTS front half)
# =============================================================================


@jax.jit
def synchronize(x: jnp.ndarray):
    """Packet detect + timing + coarse CFO for a batch of streams.

    x: (B, N) complex64.  Returns (lts1, coarse_cfo, detect_metric):
    lts1 (B,) int32 start of the first LTS repeat, coarse_cfo (B,) float32
    rad/sample, detect_metric (B,) float32 in [0, 1] (STS autocorrelation
    plateau quality — the CCA decision statistic).
    """
    B, N = x.shape
    ac = x[:, 16:] * jnp.conj(x[:, :-16])
    w = df.moving_sum(ac, 64)
    en = df.moving_sum(jnp.abs(x[:, :-16]) ** 2, 64).astype(jnp.float32)
    # energy gate (the vectorized cca_pwr_threshold, cca.hpp:165-230):
    # quiet regions would otherwise win the normalized-autocorrelation
    # argmax on noise-over-noise ratios
    gate = en > 0.05 * jnp.max(en, axis=-1, keepdims=True)
    m = jnp.where(gate, jnp.abs(w) / (en + 1e-9), 0.0)
    # restrict the STS search so a full preamble+SIGNAL still fits
    valid = m[:, : max(1, N - 480)]
    # first-plateau selection: a window may hold several frames; lock to
    # the EARLIEST preamble whose plateau reaches 90% of the window max
    # (the reference's per-sample CCA fires on the first too,
    # cca.hpp:165-230) — argmax on bool returns the first True
    mx = jnp.max(valid, axis=-1, keepdims=True)
    sts = jnp.argmax(valid >= 0.9 * mx, axis=-1)
    det = jnp.take_along_axis(valid, sts[:, None], axis=1)[:, 0]
    wsel = jnp.take_along_axis(w, sts[:, None], axis=1)[:, 0]
    cfo = jnp.angle(wsel).astype(jnp.float32) / 16.0
    # de-rotate and LTS cross-correlate
    ramp = jnp.exp(-1j * cfo[:, None] * jnp.arange(N, dtype=jnp.float32))
    y = x * ramp
    c = jnp.abs(df.correlate_stream(y, _LTS_SYM))
    c2 = c[:, :-64] + c[:, 64:]
    # only accept the LTS of THIS frame: within [sts, sts + 512) — the
    # preamble is 320 samples, so the first LTS repeat starts <= 480 in
    pos = jnp.arange(c2.shape[-1])[None, :]
    in_range = (pos >= sts[:, None]) & (pos < sts[:, None] + 512)
    c2 = jnp.where(in_range, c2, 0.0)
    lts1 = jnp.argmax(c2, axis=-1).astype(jnp.int32)
    return lts1, cfo, det


@partial(jax.jit, static_argnames=("n_frames", "det_threshold"))
def synchronize_multi(x: jnp.ndarray, n_frames: int,
                      det_threshold: float = CS_DET_THRESHOLD):
    """Packet detect for up to ``n_frames`` frames per stream — the
    re-arming RX loop of the reference (MAC11a_Receive decodes frame
    after frame from one stream, mac.cpp:190-280; CCA re-arms via
    Flush/Reset) recast as batched TOP-K detection: every preamble
    onset in the window becomes an independent decode candidate, all
    decoded in parallel.

    Onsets are rising edges of the STS plateau metric over an ABSOLUTE
    quality threshold (a relative-to-window-max rule would hide a weak
    frame next to a strong one), with edges within 240 samples of a
    prior hit suppressed (a plateau is ~100 samples of jittery highs;
    two real preambles are >= 320 samples apart).  ``det_threshold`` is
    that edge threshold — the same config knob as the single-frame
    carrier-sense gate (NodeConfig.detect_threshold), so a weak frame
    the single-frame path would decode is visible here too.

    x: (B, N) complex64.  Returns (lts1, cfo, det), each (B*n_frames,)
    candidate-major within stream (row b*n_frames + k = k-th onset of
    stream b); missing candidates have det = 0 so the carrier-sense
    gate drops them.
    """
    B, N = x.shape
    K = n_frames
    ac = x[:, 16:] * jnp.conj(x[:, :-16])
    w = df.moving_sum(ac, 64)
    en = df.moving_sum(jnp.abs(x[:, :-16]) ** 2, 64).astype(jnp.float32)
    gate = en > 0.05 * jnp.max(en, axis=-1, keepdims=True)
    m = jnp.where(gate, jnp.abs(w) / (en + 1e-9), 0.0)
    valid = m[:, : max(1, N - 480)]
    hit = valid >= det_threshold
    # suppress edges within 240 samples after a hit: prior[t] = number of
    # hits in [t-240, t-1] via a cumsum difference
    cs = jnp.cumsum(hit.astype(jnp.int32), axis=-1)
    prior = (jnp.pad(cs, ((0, 0), (1, 0)))[:, :-1]
             - jnp.pad(cs, ((0, 0), (241, 0)))[:, :-241])
    edge = hit & (prior == 0)
    eidx = jnp.cumsum(edge.astype(jnp.int32), axis=-1)
    total = eidx[:, -1]                                   # (B,)
    ks = jnp.arange(1, K + 1)[None, :, None]              # (1, K, 1)
    sts = jnp.argmax(eidx[:, None, :] == ks, axis=-1)     # (B, K)
    have = total[:, None] >= jnp.arange(1, K + 1)[None, :]
    det = jnp.take_along_axis(valid, sts.reshape(B, K), axis=1)
    det = jnp.where(have, det, 0.0)
    wsel = jnp.take_along_axis(w, sts, axis=1)
    cfo = jnp.angle(wsel).astype(jnp.float32) / 16.0      # (B, K)
    # per-candidate LTS lock on a SLICED segment: the LTS repeat of
    # candidate k lies within [sts_k, sts_k + 512), so correlating a
    # 768-sample window per candidate replaces a full-stream correlation
    # of the K-times-repeated batch (which is pure HBM traffic)
    seg = 768
    stsf = sts.reshape(B * K)
    cfof = cfo.reshape(B * K)
    xpad = jnp.pad(x, ((0, 0), (0, seg)))
    segs = jax.vmap(lambda row, starts: jax.vmap(
        lambda s: jax.lax.dynamic_slice(row, (s,), (seg,)))(starts))(
            xpad, sts)                               # (B, K, seg)
    y = segs.reshape(B * K, seg) * jnp.exp(
        -1j * cfof[:, None] * jnp.arange(seg, dtype=jnp.float32))
    c = jnp.abs(df.correlate_stream(y, _LTS_SYM))
    c2 = (c[:, :-64] + c[:, 64:])[:, :512]
    lts1 = stsf + jnp.argmax(c2, axis=-1).astype(jnp.int32)
    return lts1, cfof, det.reshape(B * K)


@jax.jit
def detect_only(x: jnp.ndarray):
    """Cheap carrier-sense pass: STS plateau metric + mean power per
    stream, *without* the LTS cross-correlation that dominates
    :func:`synchronize`.

    The live node polls this on every window and only pays for the full
    decode when it fires — the batched analogue of TCCA11a's
    no-energy/E_ERROR_CS_TIMEOUT early exit (cca.hpp:165-230).

    x: (B, N) complex64.  Returns (det (B,) float32, power (B,) float32).
    """
    ac = x[:, 16:] * jnp.conj(x[:, :-16])
    w = df.moving_sum(ac, 64)
    en = df.moving_sum(jnp.abs(x[:, :-16]) ** 2, 64).astype(jnp.float32)
    gate = en > 0.05 * jnp.max(en, axis=-1, keepdims=True)
    m = jnp.where(gate, jnp.abs(w) / (en + 1e-9), 0.0)
    det = jnp.max(m[:, : max(1, x.shape[1] - 480)], axis=-1)
    # peak 64-sample mean power, NOT the whole-window mean: on sparsely
    # occupied windows the window mean underestimates frame amplitude by
    # the occupancy factor, the AGC overshoots, and short frames clip on
    # the int8 wire (ADVICE r04) — the moving energy is already here
    power = (jnp.max(en, axis=-1) * (1.0 / 64.0)).astype(jnp.float32)
    return det, power


# =============================================================================
# Symbol extraction + equalization (LTS chanest, CFO comp, FFT, pilots)
# =============================================================================


def _pilot_slope(pv: jnp.ndarray, window: int = 8) -> jnp.ndarray:
    """Per-symbol subcarrier phase SLOPE (rad/subcarrier) from the
    polarity-corrected pilot values — the delta half of TPilotTrack's
    "subcarrier rotation = const_rotate + i * delta_rotate"
    (pilot.hpp:142-236, _build_coeff/_pilot_track).

    pv: (B, S, 4) pilots at subcarriers (-21, -7, 7, 21), expected-value
    corrected so an ideal channel gives 4 equal positive reals.

    The reference works per symbol with small instantaneous deltas; this
    batched form sees the WHOLE frame, over which a ±20 ppm sample-clock
    offset accumulates multiple radians at the edge pilots.  So the
    per-pilot phases are first unwrapped along the symbol axis (the
    symbol-to-symbol step is < 0.01 rad at any plausible SFO, so the
    wrapped difference is exact), then the slope is a least-squares fit
    over the 4 pilot positions (the pilot set is symmetric, so the
    common phase cancels from the fit), then a causal ``window``-symbol
    moving average plays the role of the reference's SFO_tracker IIR:
    drift changes slowly, noise doesn't.
    """
    theta = jnp.angle(pv)                                   # (B, S, 4)
    d = theta[:, 1:] - theta[:, :-1]
    d = jnp.mod(d + np.pi, 2 * np.pi) - np.pi
    theta_u = jnp.cumsum(
        jnp.concatenate([theta[:, :1], d], axis=1), axis=1)
    ksc = jnp.asarray(C.PILOT_SC.astype(np.float32))
    slope = jnp.sum(theta_u * ksc, axis=-1) / float(
        np.sum(C.PILOT_SC.astype(np.float64) ** 2))         # (B, S)
    S = slope.shape[1]
    w = min(window, S)
    cs = jnp.pad(jnp.cumsum(slope, axis=1), ((0, 0), (1, 0)))
    s_idx = np.arange(S)
    lo = np.maximum(0, s_idx + 1 - w)
    tot = cs[:, s_idx + 1] - cs[:, lo]
    return tot / jnp.asarray((s_idx + 1 - lo).astype(np.float32))


@partial(jax.jit, static_argnames=("nsym", "return_weights"))
def extract_symbols(x: jnp.ndarray, lts1: jnp.ndarray, cfo: jnp.ndarray,
                    nsym: int,
                    return_weights: bool = False):
    """Equalized data carriers for SIGNAL + nsym data symbols.

    x: (B, N); lts1/cfo from :func:`synchronize`.  Returns
    (eq (B, nsym+1, 48) complex64, snr_db (B,) float32).
    Index 0 of axis 1 is the SIGNAL symbol.
    """
    B, N = x.shape
    need = 128 + 80 * (nsym + 1)
    xp = jnp.pad(x, ((0, 0), (0, need)))

    def cut(row, start):
        return jax.lax.dynamic_slice(row, (start,), (need,))

    y = jax.vmap(cut)(xp, lts1)                       # (B, need)
    # coarse CFO first (the lag-64 fine estimate is only unambiguous to
    # ±156 kHz at 20 Msps; the lag-16 coarse one covers ±625 kHz), then
    # fine CFO from the LTS repeats of the coarse-corrected signal.
    n_idx = jnp.arange(need, dtype=jnp.float32)
    y = y * jnp.exp(-1j * cfo[:, None] * n_idx)
    fine = jnp.angle(jnp.sum(jnp.conj(y[:, :64]) * y[:, 64:128],
                             axis=-1)).astype(jnp.float32) / 64.0
    y = y * jnp.exp(-1j * fine[:, None] * n_idx)
    # channel estimate from the two LTS repeats
    L = 0.5 * (dfft.fft64(y[:, :64]) + dfft.fft64(y[:, 64:128]))
    H = L * jnp.asarray(_LTS_SIGN)                    # sign * |.| == /(±1)
    nvar = jnp.mean(jnp.abs(y[:, :64] - y[:, 64:128]) ** 2, axis=-1) / 2
    sig_p = jnp.mean(jnp.abs(H) ** 2, axis=-1) * (64.0 / 52.0)
    snr_db = 10.0 * jnp.log10(sig_p / (nvar + 1e-12) + 1e-12)
    # symbols: skip 16-sample CP each
    sym = y[:, 128:].reshape(B, nsym + 1, 80)[:, :, 16:]
    S = dfft.fft64(sym)                               # (B, nsym+1, 64)
    Hc = jnp.conj(H)[:, None, :]
    E = S * Hc / (jnp.abs(H[:, None, :]) ** 2 + 1e-12)
    # pilot-driven phase + slope tracking per symbol — the TPilotTrack
    # const + i*delta subcarrier rotation (pilot.hpp:142-236): a sample
    # clock offset (SFO) slides the FFT window linearly through the
    # frame, which in frequency is a per-subcarrier phase ramp growing
    # symbol by symbol; the 4 pilots measure both the common phase and
    # that ramp's slope every symbol
    pol = jnp.asarray(C.PILOT_POLARITY, dtype=jnp.float32)[
        jnp.arange(nsym + 1) % 127]
    pv = E[:, :, jnp.asarray(C.PILOT_BINS)] * \
        (jnp.asarray(C.PILOT_VAL, dtype=jnp.float32)[None, None, :]
         * pol[None, :, None])
    slope = _pilot_slope(pv)
    # de-ramp BEFORE the common-phase sum: at drift slope = pi/28 the raw
    # pilot sum 2(cos 21d + cos 7d) crosses zero and angle() would flip pi
    ksc = jnp.asarray(C.PILOT_SC.astype(np.float32))
    pvc = pv * jnp.exp(-1j * slope[:, :, None] * ksc[None, None, :])
    ph = jnp.angle(jnp.sum(pvc, axis=-1))
    kbin = jnp.asarray(((np.arange(64) + 32) % 64 - 32).astype(np.float32))
    E = E * jnp.exp(-1j * (ph[:, :, None]
                           + slope[:, :, None] * kbin[None, None, :]))
    eq = E[:, :, jnp.asarray(C.DATA_BINS)]
    # gain-normalize so demap soft scaling holds for any TX amplitude
    gain = jnp.mean(jnp.abs(eq[:, 0, :]), axis=-1) + 1e-12
    if return_weights:
        # per-subcarrier LLR confidence for the decode tail: the ZF
        # output's inverse noise amplification is |H_k|^2 (unit-mean
        # normalized) — under a dispersive channel, crushed subcarriers
        # contribute near-erasures instead of full-confidence garbage
        # (the reference's equal-weight demap LUTs, dsp_demap.h, throw
        # this information away)
        wgt = jnp.abs(H[:, jnp.asarray(C.DATA_BINS)]) ** 2
        wgt = wgt / (jnp.mean(wgt, axis=-1, keepdims=True) + 1e-20)
        return eq / gain[:, None, None], snr_db, wgt.astype(jnp.float32)
    return eq / gain[:, None, None], snr_db


# =============================================================================
# SIGNAL decode
# =============================================================================

# numpy, not jnp: module-level device arrays can't be embedded as
# constants when tracing on the axon backend (device->host copy is
# unimplemented there); numpy constants embed directly
_SIG_PERM = C.interleaver_permutation(48, 1)

# hard-decision disagreement bound for accepting the ML SIGNAL winner:
# a genuine frame at any SNR where its payload can still decode flips
# <=2-3 of the 48 coded bits (measured: <=2 at 4 dB, the 6 Mbps FCS
# floor); random noise sits >=8 flips from even the CLOSEST of the
# 32768 codewords (measured min 8, mean 10; the code's free distance
# is 10).  Mirrors the error-detection role of the reference's
# parity+tail check with a lower false-accept rate.
_SIG_MAX_DIST = 6


def _conv_encode_np(bits: np.ndarray) -> np.ndarray:
    """Rate-1/2 K=7 (133,171) encode, numpy, matching dsp.viterbi.encode:
    (M, T) -> (M, T, 2)."""
    M, T = bits.shape
    padded = np.pad(bits, ((0, 0), (6, 0)))
    outa = np.zeros_like(bits)
    outb = np.zeros_like(bits)
    for i in range(7):
        tap = padded[:, 6 - i: 6 - i + T]
        if (C.G0 >> (6 - i)) & 1:
            outa = outa ^ tap
        if (C.G1 >> (6 - i)) & 1:
            outb = outb ^ tap
    return np.stack([outa, outb], axis=-1)


@lru_cache(maxsize=None)
def _signal_ml_tables():
    """The COMPLETE valid-SIGNAL codebook: 8 rates x 4096 lengths =
    32768 messages, each conv-encoded to 48 coded bits.

    The SIGNAL symbol's whole information content is (rate, length) —
    reserved, parity and tail are determined — so its maximum-likelihood
    decode is a correlation against all 32768 codewords: ONE
    (B, 48) x (48, 32768) MXU matmul + argmax, replacing a 24-step
    sequential Viterbi scan (latency-bound on TPU: tiny per-step work,
    ~0.7 ms inside the fused pipeline) with ~50 us of matmul.  This is
    exact ML over the valid message set — strictly stronger than
    Viterbi, which also searches invalid messages.

    Returns (templates (32768, 48) float32 +-1 in deinterleaved soft
    order, rate_bits (32768,) int32; message m = rate_index * 4096 +
    length with rate_index over sorted RATES)."""
    n_len = 4096
    rates = sorted(C.RATES)
    rb = np.array([C.RATES[m].rate_bits for m in rates], np.int32)
    Mn = len(rates) * n_len
    bits = np.zeros((Mn, 24), np.uint8)
    ridx = np.arange(Mn) // n_len
    length = np.arange(Mn) % n_len
    rbits = rb[ridx]
    for i in range(4):                       # b0..b3: rate, MSB first
        bits[:, i] = (rbits >> (3 - i)) & 1
    for i in range(12):                      # b5..b16: length, LSB first
        bits[:, 5 + i] = (length >> i) & 1
    bits[:, 17] = bits[:, :17].sum(axis=1) & 1     # even parity
    coded = _conv_encode_np(bits).reshape(Mn, 48)
    return ((2.0 * coded - 1.0).astype(np.float32),
            rbits.astype(np.int32))


@jax.jit
def decode_signal(eq_sig: jnp.ndarray):
    """(B, 48) equalized SIGNAL carriers -> (rate_bits, length, ok) by
    exact ML over the valid-SIGNAL codebook (see _signal_ml_tables)."""
    soft = dmap.demap_soft(eq_sig, "bpsk")            # (B, 48)
    de = soft[:, _SIG_PERM]
    tmpl, rb = _signal_ml_tables()
    score = jnp.matmul(de, jnp.asarray(tmpl).T)       # (B, 32768)
    m = jnp.argmax(score, axis=-1)
    rate_bits = jnp.asarray(rb)[m]
    length = (m % 4096).astype(jnp.int32)
    hard = (de > 0).astype(jnp.uint8)
    cw = (jnp.asarray((tmpl > 0).astype(np.uint8)))[m]
    dist = jnp.sum(hard ^ cw, axis=-1)
    ok = (dist <= _SIG_MAX_DIST) & (length > 0)
    return rate_bits, length, ok


@jax.jit
def decode_signal_viterbi(eq_sig: jnp.ndarray):
    """The sequential-trellis SIGNAL decode (kept as the cross-check for
    the ML codebook path; same contract)."""
    soft = dmap.demap_soft(eq_sig, "bpsk")            # (B, 48)
    de = soft[:, _SIG_PERM]
    bits = dvit.decode_auto(de.reshape(-1, 24, 2), terminated=True,
                            blockwise=False)
    b = bits.astype(jnp.int32)
    rate_bits = (b[:, 0] << 3) | (b[:, 1] << 2) | (b[:, 2] << 1) | b[:, 3]
    parity = jnp.sum(b[:, :17], axis=-1) & 1
    parity_ok = parity == b[:, 17]
    length = jnp.sum(b[:, 5:17] << jnp.arange(12)[None, :], axis=-1)
    tail_ok = jnp.sum(b[:, 18:24], axis=-1) == 0
    known = jnp.isin(rate_bits, jnp.asarray(
        [r.rate_bits for r in C.RATES.values()]))
    ok = parity_ok & tail_ok & known & (length > 0)
    return rate_bits, length, ok


# =============================================================================
# DATA decode (per-rate, shape-static)
# =============================================================================


@lru_cache(maxsize=None)
def _rate_symbol_matrix(rate_mbps: int) -> np.ndarray:
    """(ncbps, 2*ndbps) per-symbol deinterleave+depuncture one-hot: the
    fixed-rate slice of the _auto_tables construction.  Gathers and
    scatters are near-scalar on TPU; one MXU matmul per symbol block
    replaces both (the T11aDeinterleave* LUT permutation +
    TDepuncture_* erasure insertion, deinterleaver.hpp / depuncturer.hpp
    collapsed into a single linear map)."""
    rate = C.RATES[rate_mbps]
    mats, _, _, _, _ = _auto_tables(1 << 20, 1 << 20)
    ri = _RATE_LIST.index(rate_mbps)
    off = _MOD_OFF[rate.modulation]
    return np.asarray(mats[ri][off: off + rate.ncbps])


@partial(jax.jit, static_argnames=("rate_mbps",))
def decode_data(eq: jnp.ndarray, length: jnp.ndarray, rate_mbps: int,
                weights: jnp.ndarray = None):
    """Decode data symbols for one rate.

    eq: (B, nsym_max, 48) equalized data carriers (SIGNAL already removed);
    length: (B,) PSDU byte counts from SIGNAL; weights: optional (B, 48)
    per-subcarrier LLR confidence from
    extract_symbols(return_weights=True).  Returns
    (psdu (B, MAX_PSDU) uint8, fcs_ok (B,) bool, nbits_used (B,)).
    """
    rate = C.RATES[rate_mbps]
    B, nsym_max, _ = eq.shape

    soft = dmap.demap_soft(eq, rate.modulation)       # (B, nsym, ncbps)
    if weights is not None:
        soft = soft * jnp.repeat(weights, rate.nbpsc, axis=-1)[:, None, :]
    # mask symbols beyond each frame's actual extent -> erasures
    nbits = 16 + 8 * length + 6
    nsym_actual = -(-nbits // rate.ndbps)
    symi = jnp.arange(nsym_max)[None, :]
    soft = jnp.where(symi[:, :, None] < nsym_actual[:, None, None],
                     soft, 0.0)
    # deinterleave + depuncture as ONE per-symbol matmul (MXU); punctured
    # slots are all-zero columns (erasures)
    ab = jnp.einsum("bsj,jk->bsk", soft,
                    jnp.asarray(_rate_symbol_matrix(rate_mbps)))
    t_steps = nsym_max * rate.ndbps
    bits = dvit.decode_auto(ab.reshape(B, t_steps, 2), terminated=True)
    psdu, fcs_ok = _finish_frame(bits, length, t_steps)
    return psdu, fcs_ok, nbits


def _finish_frame(bits: jnp.ndarray, length: jnp.ndarray, t_steps: int):
    """Shared frame tail: descramble (seed phase from the first 7 bits),
    pack PSDU bytes LSB-first, check the FCS on device.

    bits: (B, t_steps) decoded data bits; length: (B,) PSDU byte counts.
    Returns (psdu (B, MAX_PSDU) uint8, fcs_ok (B,) bool)."""
    B = bits.shape[0]
    match = jnp.all(
        jnp.asarray(dscr._PHASES_J[None, :, :7]) == bits[:, None, :7],
        axis=-1)
    phase = jnp.argmax(match, axis=-1)
    seq = jnp.asarray(dscr._PHASES_J)[phase]          # (B, 127)
    reps = -(-t_steps // 127)
    seq = jnp.tile(seq, (1, reps))[:, :t_steps]
    desc = bits ^ seq
    # PSDU bytes, LSB-first
    nbytes_max = (t_steps - 22) // 8
    payload = desc[:, 16: 16 + 8 * nbytes_max].reshape(B, nbytes_max, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    psdu = jnp.sum(payload * weights[None, None, :], axis=-1,
                   dtype=jnp.uint32).astype(jnp.uint8)
    psdu = jnp.pad(psdu, ((0, 0), (0, max(0, MAX_PSDU - nbytes_max))))
    psdu = psdu[:, :MAX_PSDU]
    # FCS check on device
    body_crc = dcrc.crc32_batch(psdu, length - 4)
    idx = jnp.clip(length[:, None] - 4 + jnp.arange(4)[None, :], 0,
                   MAX_PSDU - 1)
    fcs_bytes = jnp.take_along_axis(psdu, idx, axis=1).astype(jnp.uint32)
    rx_fcs = (fcs_bytes[:, 0] | (fcs_bytes[:, 1] << 8)
              | (fcs_bytes[:, 2] << 16) | (fcs_bytes[:, 3] << 24))
    fcs_ok = (body_crc == rx_fcs) & (length >= 4) & \
        (length <= jnp.uint32(MAX_PSDU))
    return psdu, fcs_ok


# =============================================================================
# Mixed-rate batched decode (runtime rate dispatch)
# =============================================================================
#
# The reference demuxes per frame at runtime through TBB11aRxRateSel
# (PHY_11a.hpp:704-814) — a per-sample branch.  The TPU formulation keeps
# one static program for ALL rates: demap every symbol under all four
# modulations (cheap VPU work), concatenate per symbol, and turn
# deinterleave + depuncture + modulation-select into ONE static gather
# table per rate, indexed by each frame's parsed rate.  The trellis length
# nsym(rate)*ndbps(rate) is within one symbol of the payload bit count for
# every rate, so a single Viterbi call (padded with erasures) decodes the
# whole mixed batch.

_RATE_LIST = sorted(C.RATES)                       # mbps, idx 0..7
_MOD_ORDER = ("bpsk", "qpsk", "qam16", "qam64")
_MOD_NBPSC = {"bpsk": 1, "qpsk": 2, "qam16": 4, "qam64": 6}
_MOD_OFF = {"bpsk": 0, "qpsk": 48, "qam16": 144, "qam64": 336}
_MOD_W = 624                                       # 48+96+192+288

# SIGNAL rate_bits (4 bits) -> rate index, 0 for invalid patterns
_BITS_TO_IDX = np.zeros(16, np.int32)
for _i, _m in enumerate(_RATE_LIST):
    _BITS_TO_IDX[C.RATES[_m].rate_bits] = _i


@lru_cache(maxsize=None)
def _auto_tables(max_psdu: int, nsym_cap: int = 1 << 30):
    """Static per-rate one-hot deinterleave+depuncture matrices for the
    mixed-rate decoder.

    ``nsym_cap`` bounds the per-rate symbol count by what the input window
    can physically hold ((N - preamble - SIGNAL) // 80) — a frame needing
    more symbols cannot decode from that window anyway, and without the
    cap every batch pays the 6 Mbps worst case (~500 symbols of extract +
    demap) regardless of window size.

    Key TPU insight: 802.11a symbol boundaries align with puncture-period
    boundaries for every rate, so deinterleave + depuncture + modulation
    select is the SAME (624 -> 2*ndbps) linear map for every symbol.  That
    turns the per-frame dynamic gather (near-scalar on TPU) into one
    static one-hot matmul per rate on the MXU; punctured slots are
    all-zero columns (erasures).

    Returns (mats tuple of (624, 2*ndbps_r) float32; nsym (8,) int per-rate
    symbol counts; ndbps (8,) int32; nsym_max int; T_max int)."""
    nsyms = tuple(min(max_symbols(C.RATES[m], max_psdu), nsym_cap)
                  for m in _RATE_LIST)
    nsym_max = max(nsyms)
    t_max = max(n * C.RATES[m].ndbps for n, m in zip(nsyms, _RATE_LIST))
    mats = []
    for ri, m in enumerate(_RATE_LIST):
        rate = C.RATES[m]
        perm = C.interleaver_permutation(rate.ncbps, rate.nbpsc)
        pa, pb = C.PUNCTURE[(rate.num, rate.den)]
        keep = np.stack([pa, pb], -1).reshape(-1)          # period (2p,)
        keepf = np.tile(keep, -(-2 * rate.ndbps // len(keep)))
        keepf = keepf[: 2 * rate.ndbps]
        # transmitted (A,B) slot j of one symbol holds punctured-stream
        # position q = rank of j among kept slots; it reads the demapped
        # soft value at interleaved position perm[q] of its modulation
        tx_slots = np.flatnonzero(keepf)                   # (ncbps,)
        P = np.zeros((_MOD_W, 2 * rate.ndbps), np.float32)
        P[_MOD_OFF[rate.modulation] + perm[np.arange(rate.ncbps)],
          tx_slots] = 1.0
        mats.append(P)
    return (tuple(mats), nsyms,
            np.array([C.RATES[m].ndbps for m in _RATE_LIST], np.int32),
            nsym_max, t_max)


@partial(jax.jit, static_argnames=("max_psdu", "input_rate", "n_frames",
                                   "n_decode", "det_threshold",
                                   "min_rate_mbps"))
def rx_pipeline_auto(x: jnp.ndarray, max_psdu: int = MAX_PSDU,
                     input_rate: str = "20m", n_frames: int = 1,
                     n_decode: int = 0,
                     det_threshold: float = CS_DET_THRESHOLD,
                     min_rate_mbps: int = 6):
    """Complete batched RX with per-frame runtime rate dispatch: a batch
    mixing all eight 802.11a rates decodes in ONE jit program.

    With ``n_frames > 1`` every stream yields up to that many decode
    candidates (one per detected preamble onset — the re-arming RX loop
    of mac.cpp:190-280), and all output arrays have B*n_frames rows,
    candidate-major within stream.  Saturated back-to-back traffic then
    decodes completely from one window instead of one-frame-per-window.

    ``n_decode`` (with ``n_frames > 1``) compacts the candidate set
    before the expensive tail: only the ``n_decode`` highest-det
    candidates of the WHOLE batch are extracted/demapped/Viterbi-decoded,
    so decode cost scales with frames present on the air, not with the
    B*K candidate slots — matching the reference's re-arming loop, which
    decodes exactly the frames it finds (mac.cpp:190-280).  Output rows
    then number ``n_decode`` and carry ``src`` (the original candidate
    row b*n_frames + k each slot came from); a batch holding more real
    frames than ``n_decode`` drops the weakest-det surplus.

    ``min_rate_mbps`` declares the slowest rate actually expected on
    the air (NodeConfig.min_rate_mbps): the per-rate symbol tables are
    capped at that rate's max_psdu airtime, so a batch does not pay the
    6 Mbps worst-case extract/demap (~500 symbols) when the traffic is
    all 24-54 Mbps.  Frames at a slower rate AND longer than the cap
    truncate (crc_fail); shorter ones still decode.

    x: (B, N) complex64 streams (raw 40 Msps with ``input_rate="40m"``).
    Returns the rx_pipeline dict plus rate_mbps int32 per row.
    """
    if input_rate != "20m":
        from sora_tpu.phy import frontend as fe
        x = fe.ofdm_frontend(x, input_rate)
    # static window capacity upper bound: extract_symbols needs
    # lts1 + 128 (LTS) + 80*(nsym+1) <= N, evaluated at the earliest
    # possible anchor lts1 = 0, i.e. nsym <= (N - 208) / 80.  Real
    # anchors sit >= 192 in, so this overestimates by <= 3 symbols —
    # harmless: the surplus symbols are erased by the length mask.
    nsym_win = max(1, (int(x.shape[1]) - 208) // 80)
    mr = max([r for r in _RATE_LIST if r <= min_rate_mbps] or [6])
    nsym_air = max_symbols(C.RATES[mr], max_psdu)
    mats, nsyms, ndbps_tab, nsym_max, t_max = _auto_tables(
        max_psdu, min(nsym_win, nsym_air))
    src = None
    n_cand = None
    if n_frames > 1:
        lts1, cfo, det = synchronize_multi(x, n_frames, det_threshold)
        # pre-compaction above-threshold candidate count: the node's
        # compaction_drop accounting (dropped surplus = n_cand minus
        # surviving cs_ok rows) — a silent top-k cap would otherwise
        # read as "decoded everything"
        n_cand = (det >= det_threshold).sum().astype(jnp.int32)
        if 0 < n_decode < x.shape[0] * n_frames:
            det, idx = jax.lax.top_k(det, n_decode)
            src = idx.astype(jnp.int32)
            lts1 = lts1[idx]
            cfo = cfo[idx]
            x = x[idx // n_frames]
        else:
            x = jnp.repeat(x, n_frames, axis=0)
    else:
        lts1, cfo, det = synchronize(x)
    eq, snr_db, wgt = extract_symbols(x, lts1, cfo, nsym_max,
                                      return_weights=True)
    out = auto_tail(eq, det, max_psdu, min(nsym_win, nsym_air),
                    det_threshold, lts1=lts1, n_samples=int(x.shape[1]),
                    weights=wgt)
    out.update({"snr_db": snr_db, "lts1": lts1, "cfo": cfo})
    if src is not None:
        out["src"] = src
    if n_cand is not None:
        out["n_cand"] = n_cand
    return out


@partial(jax.jit, static_argnames=("max_psdu", "nsym_cap",
                                   "det_threshold", "n_samples"))
def auto_tail(eq: jnp.ndarray, det: jnp.ndarray, max_psdu: int,
              nsym_cap: int, det_threshold: float = CS_DET_THRESHOLD,
              lts1: jnp.ndarray | None = None, n_samples: int = 0,
              weights: jnp.ndarray = None):
    """SIGNAL parse + mixed-rate data decode from equalized carriers —
    the shared back half of :func:`rx_pipeline_auto`, also driven
    batch-parallel by the sharded pipeline (parallel.shard).

    eq: (B, nsym_max+1, 48) equalized carriers (row 0 = SIGNAL);
    det: (B,) carrier-sense metric.
    """
    mats, nsyms, ndbps_tab, nsym_max, t_max = _auto_tables(max_psdu,
                                                           nsym_cap)
    B = eq.shape[0]
    rate_bits, length, sig_ok = decode_signal(eq[:, 0, :])
    length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
    rate_idx = jnp.asarray(_BITS_TO_IDX)[jnp.clip(rate_bits, 0, 15)]
    known = jnp.isin(rate_bits, jnp.asarray(
        [r.rate_bits for r in C.RATES.values()]))

    data = eq[:, 1:, :]                                # (B, nsym_max, 48)
    soft_cat = jnp.concatenate(
        [dmap.demap_soft(data, m) for m in _MOD_ORDER], axis=-1)
    if weights is not None:
        we = jnp.concatenate(
            [jnp.repeat(weights, _MOD_NBPSC[m], axis=-1)
             for m in _MOD_ORDER], axis=-1)            # (B, 624)
        soft_cat = soft_cat * we[:, None, :]
    # erase symbols beyond each frame's actual extent
    ndbps = jnp.asarray(ndbps_tab)[rate_idx]           # (B,)
    nbits = 16 + 8 * length + 6
    nsym_actual = (nbits + ndbps - 1) // ndbps
    symi = jnp.arange(nsym_max)[None, :, None]
    soft_cat = jnp.where(symi < nsym_actual[:, None, None], soft_cat, 0.0)
    # per-rate per-symbol one-hot matmul (MXU) replaces the dynamic
    # gather; the rate select folds INTO each matmul's input (frames of
    # other rates enter as zero rows) and the results accumulate into
    # one trellis tensor — no (n_rates, B, T, 2) stack materializes
    # (~100 MB of HBM traffic at the bench shape; measured +5%)
    onehot = (rate_idx[:, None]
              == jnp.arange(len(_RATE_LIST))[None, :]).astype(jnp.float32)
    ab = jnp.zeros((B, t_max, 2), jnp.float32)
    for ri, m in enumerate(_RATE_LIST):
        nd = C.RATES[m].ndbps
        sel = soft_cat[:, : nsyms[ri]] * onehot[:, ri, None, None]
        ab_r = jnp.einsum("bsj,jk->bsk", sel,
                          jnp.asarray(mats[ri])).reshape(
            B, nsyms[ri] * nd, 2)
        ab = ab.at[:, : nsyms[ri] * nd, :].add(ab_r)
    bits = dvit.decode_auto(ab, terminated=True)
    psdu, fcs_ok = _finish_frame(bits, length, t_max)

    cs_ok = det >= det_threshold
    ok = cs_ok & sig_ok & known & fcs_ok
    mbps = jnp.asarray(np.array(_RATE_LIST, np.int32))[rate_idx]
    out = {"psdu": psdu, "fcs_ok": fcs_ok.astype(jnp.uint8),
           "sig_ok": sig_ok.astype(jnp.uint8), "ok": ok.astype(jnp.uint8),
           "cs_ok": cs_ok.astype(jnp.uint8), "det": det,
           "rate_mbps": mbps, "length": length}
    if lts1 is not None and n_samples > 0:
        # frame extends past the window end: it cannot FCS here but WILL
        # decode from the next overlapping window — boundary accounting,
        # not a channel error (the stream-based reference never truncates)
        out["truncated"] = (lts1 + 128 + 80 * (nsym_actual + 1)
                            > n_samples).astype(jnp.uint8)
    return out


# =============================================================================
# Whole-chain pipeline (one jit program; the unit the driver/bench runs)
# =============================================================================


@partial(jax.jit, static_argnames=("rate_mbps", "max_psdu", "input_rate"))
def rx_pipeline(x: jnp.ndarray, rate_mbps: int, max_psdu: int = MAX_PSDU,
                input_rate: str = "20m"):
    """Complete batched RX for a known rate: sync -> chanest/equalize ->
    SIGNAL -> data decode -> FCS.

    x: (B, N) complex64 streams, one frame each.  With
    ``input_rate="40m"`` the streams are raw radio-rate samples (the dump
    payload) and the in-chain front end (DC removal + halfband decimation,
    sora_tpu.phy.frontend) runs on device first — matching the reference
    graph which starts at TDownSample2 -> TDCRemoveEx
    (fb11ademod_config.hpp:148-218).

    Returns a dict with psdu (B, MAX_PSDU) uint8, fcs_ok/sig_ok (B,) bool,
    length (B,) int32, snr_db (B,) float32.  This is the "forward step" of
    the framework — the analogue of the reference's MAC11a_Receive poll
    loop body (mac.cpp:190-280), fully fused under one jit.
    """
    if input_rate != "20m":
        from sora_tpu.phy import frontend as fe
        x = fe.ofdm_frontend(x, input_rate)
    rate = C.RATES[rate_mbps]
    # cap the trellis at what the window can physically hold (the
    # lts1 = 0 upper bound (N - 208) // 80 — see rx_pipeline_auto):
    # longer frames cannot decode from this window anyway
    nsym_win = max(1, (int(x.shape[1]) - 208) // 80)
    nsym = min(max_symbols(rate, max_psdu), nsym_win)
    lts1, cfo, det = synchronize(x)
    eq, snr_db, wgt = extract_symbols(x, lts1, cfo, nsym,
                                      return_weights=True)
    rate_bits, length, sig_ok = decode_signal(eq[:, 0, :])
    length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
    psdu, fcs_ok, nbits = decode_data(eq[:, 1:, :], length, rate_mbps,
                                      wgt)
    cs_ok = det > CS_DET_THRESHOLD
    ok = cs_ok & sig_ok & (rate_bits == rate.rate_bits) & fcs_ok
    nsym_actual = (nbits + rate.ndbps - 1) // rate.ndbps
    truncated = (lts1 + 128 + 80 * (nsym_actual + 1)
                 > int(x.shape[1])).astype(jnp.uint8)
    # booleans leave the device as uint8: the axon backend cannot
    # transfer bool arrays to the host
    return {"psdu": psdu, "fcs_ok": fcs_ok.astype(jnp.uint8),
            "sig_ok": sig_ok.astype(jnp.uint8), "ok": ok.astype(jnp.uint8),
            "cs_ok": cs_ok.astype(jnp.uint8), "det": det,
            "truncated": truncated,
            "length": length, "snr_db": snr_db, "lts1": lts1, "cfo": cfo}


# =============================================================================
# Host-facing API
# =============================================================================


@dataclass
class RxResult:
    ok: bool = False
    reason: str = "no_frame"
    rate_mbps: int = 0
    length: int = 0
    psdu: bytes = b""
    fcs_ok: bool = False
    start: int = -1
    cfo: float = 0.0
    snr_est_db: float = 0.0
    _debug: dict = field(default_factory=dict)


def demodulate(x, expect_rate: int | None = None,
               input_rate: str = "20m") -> RxResult:
    """Single-stream convenience wrapper (API-compatible with the golden
    model).  Hot paths should use the batched stages directly.

    ``input_rate="40m"`` accepts raw radio-rate samples (e.g. the untouched
    ``load_dump`` payload) and runs the device front end first."""
    from sora_tpu.util.xfer import device_complex

    xb = device_complex(np.asarray(x, dtype=np.complex64)[None, :])
    if input_rate != "20m":
        from sora_tpu.phy import frontend as fe
        xb = fe.ofdm_frontend(xb, input_rate)
    res = RxResult()
    lts1, cfo, det = synchronize(xb)
    res.start = int(lts1[0])
    res.cfo = float(cfo[0])
    if float(det[0]) < CS_DET_THRESHOLD:
        res.reason = "cs_timeout"       # E_ERROR_CS_TIMEOUT analogue
        return res
    # SIGNAL first (cheap, fixed shape)
    eq1, snr = extract_symbols(xb, lts1, cfo, 0)
    res.snr_est_db = float(snr[0])
    rate_bits, length, sig_ok = decode_signal(eq1[:, 0, :])
    sig_ok = sig_ok.astype(jnp.uint8)     # bool fetch unsupported on axon
    if not bool(sig_ok[0]):
        res.reason = "plcp_header_fail"
        return res
    rb = int(rate_bits[0])
    rate = C.RATE_BY_BITS[rb]
    res.rate_mbps = rate.mbps
    res.length = int(length[0])
    if expect_rate is not None and rate.mbps != expect_rate:
        res.reason = "unexpected_rate"
        return res
    if res.length > MAX_PSDU:
        res.reason = "oversize"
        return res
    nsym_actual = -(-(16 + 8 * res.length + 6) // rate.ndbps)
    if xb.shape[1] < res.start + 128 + 80 * (nsym_actual + 1):
        res.reason = "truncated"
        return res
    # compile-time diet: extract/decode at the smallest power-of-two
    # symbol count covering THIS frame (shape-bucketed jit cache) rather
    # than always the max_symbols(rate) worst case — an MTU-sized 6 Mbps
    # program is ~840 symbols and minutes of XLA compile on the axon
    # service, most of it wasted on short frames
    nsym = 32
    while nsym < nsym_actual:
        nsym *= 2
    nsym = min(nsym, max_symbols(rate))
    eq, _, wgt = extract_symbols(xb, lts1, cfo, nsym,
                                 return_weights=True)
    psdu, fcs_ok, _ = decode_data(eq[:, 1:, :], length.astype(jnp.int32),
                                  rate.mbps, wgt)
    res.psdu = bytes(np.asarray(psdu[0])[: res.length])
    res.fcs_ok = bool(fcs_ok.astype(jnp.uint8)[0])
    res.ok = res.fcs_ok
    res.reason = "frame_ok" if res.ok else "crc32_fail"
    return res
