"""802.11n HT 2x2 MIMO receiver — JAX, batched, jit-compiled.

TPU-first redesign of the reference 11n RX brick graph
(kernel/bb/demod11/fb11ndemod_config.hpp:142-206):

* TCCA11n's antenna-summed carrier sense (cca_11n.hpp:7) becomes
  vectorized detection over all offsets at once, exactly like the 11a
  chain.
* TMimoChannelEst (channel_11n.hpp:331-445) — per-subcarrier 2x2 H from
  the P-mapped HT-LTFs — is one einsum against P2^-1; the per-subcarrier
  matrix inversion the reference does with CSoraMatrix::inverse_scale
  (kernel/brick/inc/sora_matrix.h:53-444) is a closed-form 2x2 inverse in
  complex64, batched over (frame, subcarrier) so it lands on the VPU.
* TMrcCombine (PHY_11n.hpp:364) for the legacy-coded L-SIG/HT-SIG symbols
  is conj(H)-weighted summation over RX antennas.
* T11nDeinterleave*_S0/_S1 (deinterleaver_11n.hpp) and TStreamParser
  (streamparser.hpp:7-139) become static gather/scatter index arrays.
* T11nViterbiSig / the data Viterbi reuse the shared decoder
  (sora_tpu.dsp.viterbi, Pallas on TPU).

Batch convention: x is (B, 2, N) — B frames, 2 RX antennas each.
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
from sora_tpu.phy import dot11n_common as N
from sora_tpu.phy.dot11a.rx import CS_DET_THRESHOLD, MAX_PSDU

_LTS_SYM = np.asarray(C.LTS_TIME_SYM, dtype=np.complex64)
_LTS_SIGN = np.zeros(64, dtype=np.float32)
_LTS_SIGN[C.OCC_BINS] = C.LTS_FREQ

# window layout after the first LTS repeat (20 Msps samples)
_OFF_LSIG, _OFF_HTSIG1, _OFF_HTSIG2 = 128, 208, 288
_OFF_HTLTF1, _OFF_HTLTF2, _OFF_DATA = 448, 528, 608
_OFF_DATA_1SS = 528               # single HT-LTF: data starts 80 earlier

_SIG_PERM = C.interleaver_permutation(48, 1)

# HT-SIG CRC-8 as an affine map over GF(2): crc(b) = _CRC8_CONST ^ (M @ b)
# (dot11n_common.crc8_htsig is linear in the message given the all-ones
# init) — lets the CRC check run on-device as one (8, 34) matmul.
_CRC8_CONST = N.crc8_htsig(np.zeros(34, np.uint8))
_CRC8_MAT = np.stack([
    N.crc8_htsig(np.eye(34, dtype=np.uint8)[i]) ^ _CRC8_CONST
    for i in range(34)], axis=1)                              # (8, 34)


def num_symbols(mcs: int, psdu_len: int) -> int:
    return -(-(16 + 8 * psdu_len + 6) // N.mcs_param(mcs).ndbps)


def max_symbols(mcs: int, max_psdu: int = MAX_PSDU) -> int:
    return num_symbols(mcs, max_psdu)


# =============================================================================
# Synchronization (vectorized TCCA11n front end)
# =============================================================================


@jax.jit
def synchronize(x: jnp.ndarray):
    """Packet detect + timing + coarse CFO for a batch of 2-antenna streams.

    x: (B, 2, N) complex64.  Returns (lts1 (B,) int32 — start of the first
    legacy LTS repeat, cfo (B,) float32 rad/sample, det (B,) float32).
    """
    B, A, Nn = x.shape
    xf = x.reshape(B * A, Nn)
    ac = xf[:, 16:] * jnp.conj(xf[:, :-16])
    w = df.moving_sum(ac, 64).reshape(B, A, -1).sum(axis=1)
    en = df.moving_sum(jnp.abs(xf[:, :-16]) ** 2, 64).astype(
        jnp.float32).reshape(B, A, -1).sum(axis=1)
    gate = en > 0.05 * jnp.max(en, axis=-1, keepdims=True)
    m = jnp.where(gate, jnp.abs(w) / (en + 1e-9), 0.0)
    valid = m[:, : max(1, Nn - 900)]
    # plateau ONSET, not argmax: the HT-STF repeats the STS periodicity so
    # the global lag-16 plateau maximum can land mid-frame; the first
    # sample exceeding 90% of the plateau is strictly inside the legacy
    # STS (same guard as the golden model's sync)
    peak = jnp.max(valid, axis=-1, keepdims=True)
    onset = jnp.argmax(valid > 0.9 * peak, axis=-1)
    sts = jnp.minimum(onset + 16, valid.shape[-1] - 1)
    det = jnp.take_along_axis(valid, sts[:, None], axis=1)[:, 0]
    wsel = jnp.take_along_axis(w, sts[:, None], axis=1)[:, 0]
    cfo = jnp.angle(wsel).astype(jnp.float32) / 16.0
    ramp = jnp.exp(-1j * cfo[:, None, None]
                   * jnp.arange(Nn, dtype=jnp.float32))
    y = (x * ramp).reshape(B * A, Nn)
    c = jnp.abs(df.correlate_stream(y, _LTS_SYM)).reshape(B, A, -1).sum(1)
    c2 = c[:, :-64] + c[:, 64:]
    pos = jnp.arange(c2.shape[-1])[None, :]
    # the legacy LTS begins within ~320 samples of the STS plateau onset;
    # the window excludes the (LTS-like) HT-LTFs further into the frame
    inwin = (pos >= sts[:, None]) & (pos <= sts[:, None] + 320)
    c2 = jnp.where(inwin, c2, 0.0)
    lts1 = jnp.argmax(c2, axis=-1).astype(jnp.int32)
    return lts1, cfo, det


# =============================================================================
# Front end: CFO, legacy chanest, SIG symbols, MIMO chanest, MMSE detection
# =============================================================================


def _mrc_symbol(y: jnp.ndarray, Hleg: jnp.ndarray, off: int, pol_idx: int):
    """Legacy-coded symbol at window offset `off` -> (B, 48) equalized
    data carriers (TMrcCombine, PHY_11n.hpp:364 + pilot phase track)."""
    S = dfft.fft64(y[:, :, off + 16: off + 80])               # (B, 2, 64)
    num = jnp.sum(jnp.conj(Hleg) * S, axis=1)
    den = jnp.sum(jnp.abs(Hleg) ** 2, axis=1) + 1e-12
    E = num / den                                             # (B, 64)
    pv = E[:, jnp.asarray(C.PILOT_BINS)] * jnp.asarray(
        C.PILOT_VAL * C.PILOT_POLARITY[pol_idx], dtype=jnp.float32)
    E = E * jnp.exp(-1j * jnp.angle(jnp.sum(pv, axis=-1)))[:, None]
    return E[:, jnp.asarray(C.DATA_BINS)]


def _inv2x2(H: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) complex matrices (the
    CSoraMatrix::inverse_scale analogue, sora_matrix.h:53-444)."""
    det = H[..., 0, 0] * H[..., 1, 1] - H[..., 0, 1] * H[..., 1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12 + 0j, det)
    row0 = jnp.stack([H[..., 1, 1], -H[..., 0, 1]], axis=-1)
    row1 = jnp.stack([-H[..., 1, 0], H[..., 0, 0]], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


@partial(jax.jit, static_argnames=("nsym", "short_gi", "mmse",
                                   "return_weights"))
def extract_symbols(x: jnp.ndarray, lts1: jnp.ndarray, cfo: jnp.ndarray,
                    nsym: int, short_gi: bool = False, mmse: bool = True,
                    return_weights: bool = False):
    """Front end through MMSE detection for SIG + nsym HT data symbols.

    x: (B, 2, N).  Returns (sig_eq (B, 3, 48) — L-SIG/HT-SIG1/HT-SIG2
    equalized carriers gain-normalized, xd (B, nsym, 52, 2) MMSE-detected
    per-stream data carriers, snr_db (B,)).  ``short_gi`` reads
    72-sample data symbols (400 ns guard).
    """
    B, A, Nn = x.shape
    per = 72 if short_gi else 80
    gi = per - 64
    need = _OFF_DATA + per * nsym
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, need)))

    def cut(frame, start):
        return jax.lax.dynamic_slice(frame, (0, start), (A, need))

    y = jax.vmap(cut)(xp, lts1)                               # (B, 2, need)
    n_idx = jnp.arange(need, dtype=jnp.float32)
    y = y * jnp.exp(-1j * cfo[:, None, None] * n_idx)
    fine = jnp.angle(jnp.sum(jnp.conj(y[:, :, :64]) * y[:, :, 64:128],
                             axis=(-2, -1))).astype(jnp.float32) / 64.0
    y = y * jnp.exp(-1j * fine[:, None, None] * n_idx)

    # legacy per-antenna channel estimate (T11aLTS analogue)
    L = 0.5 * (dfft.fft64(y[:, :, :64]) + dfft.fft64(y[:, :, 64:128]))
    Hleg = L * jnp.asarray(_LTS_SIGN)                         # (B, 2, 64)
    nvar = jnp.mean(jnp.abs(y[:, :, :64] - y[:, :, 64:128]) ** 2,
                    axis=(-2, -1)) / 2
    sig_p = jnp.mean(jnp.abs(Hleg) ** 2, axis=(-2, -1)) * (64.0 / 52.0)
    snr_db = 10.0 * jnp.log10(sig_p / (nvar + 1e-12) + 1e-12)

    lsig = _mrc_symbol(y, Hleg, _OFF_LSIG, 0)
    ht1 = _mrc_symbol(y, Hleg, _OFF_HTSIG1, 1)
    ht2 = _mrc_symbol(y, Hleg, _OFF_HTSIG2, 2)
    gain = jnp.mean(jnp.abs(lsig), axis=-1, keepdims=True) + 1e-12
    sig_eq = jnp.stack([lsig, ht1, ht2], axis=1) / gain[:, None, :]

    # 2x2 MIMO channel estimate from the two P-mapped HT-LTFs
    # (TMimoChannelEst, channel_11n.hpp:331-445)
    Y = jnp.stack([dfft.fft64(y[:, :, _OFF_HTLTF1 + 16: _OFF_HTLTF1 + 80]),
                   dfft.fft64(y[:, :, _OFF_HTLTF2 + 16: _OFF_HTLTF2 + 80])],
                  axis=-1)                                    # (B,2,64,2ltf)
    # Y[b,a,k,n] = sum_i H[b,k,a,i] P2[i,n] Lseq[k]
    Ht = jnp.einsum("bakn,nm->bkam", Y,
                    jnp.asarray(N.P2_INV, dtype=jnp.complex64))
    lseq = np.where(N.HTLTF_FREQ == 0, 1.0, N.HTLTF_FREQ)
    lseq_full = np.ones(64, np.float32)
    lseq_full[N.HT_OCC_BINS] = lseq
    H = Ht / jnp.asarray(lseq_full)[None, :, None, None]      # (B,64,2,2)

    # Per-subcarrier MMSE detection weights W = (H^H H + s2 I)^-1 H^H,
    # unbiased by the diagonal of WH so constellation gain is exact.
    # At high SNR W -> the plain ZF inverse; near-singular H no longer
    # blows up the noise — beats the reference's ZF-only detector
    # (channel_11n.hpp:426-445, CSoraMatrix inverse_scale).  s2 is the
    # legacy-LTS noise estimate scaled to FFT-bin units (unnormalized
    # 64-point DFT: bin variance = 64x per-sample variance).
    s2 = jnp.where(mmse, 64.0 * nvar, 0.0).astype(
        jnp.complex64)[:, None, None, None]    # mmse=False: plain ZF
    eye2 = jnp.eye(2, dtype=jnp.complex64)

    def _mmse_w(Hs):
        Hh = jnp.conj(jnp.swapaxes(Hs, -1, -2))
        G = jnp.einsum("bkij,bkjl->bkil", Hh, Hs) + s2 * eye2
        W = jnp.einsum("bkij,bkjl->bkil", _inv2x2(G), Hh)
        WH = jnp.einsum("bkij,bkjl->bkil", W, Hs)
        d = jnp.stack([WH[..., 0, 0], WH[..., 1, 1]], axis=-1)
        return W, d + 1e-12                                   # (B,K,2,2),(B,K,2)

    Wd, dd = _mmse_w(H[:, jnp.asarray(N.HT_DATA_BINS)])       # (B,52,..)
    Wp, dp = _mmse_w(H[:, jnp.asarray(N.HT_PILOT_BINS)])      # (B,4,..)

    # Per-(subcarrier, stream) post-detection confidence for LLR
    # weighting in the decode tail: |diag(WH)|^2 / [W W^H]_ii is the
    # inverse noise amplification of the unbiased output (the common
    # sigma^2 factor drops out of relative weights).  Normalized to
    # unit mean so the decoder's soft-value scale is preserved; a
    # stream the channel crushed contributes near-erasures instead of
    # full-confidence garbage — information the reference's ZF+equal-
    # weight demap throws away (channel_11n.hpp:426-445, dsp_demap.h).
    ww = jnp.sum(jnp.abs(Wd) ** 2, axis=-1)                   # (B,52,2)
    wgt = (jnp.abs(dd) ** 2) / (ww + 1e-20)
    wgt = wgt / (jnp.mean(wgt, axis=(1, 2), keepdims=True) + 1e-20)
    wgt = wgt.astype(jnp.float32)

    # HT data symbols: FFT + per-subcarrier MMSE + pilot phase track
    if nsym == 0:
        xd = jnp.zeros((B, 0, 52, 2), dtype=jnp.complex64)
        if return_weights:
            return sig_eq, xd, snr_db, wgt
        return sig_eq, xd, snr_db
    sym = y[:, :, _OFF_DATA: _OFF_DATA + per * nsym].reshape(
        B, A, nsym, per)[:, :, :, gi:]
    S = dfft.fft64(sym)                                       # (B,2,nsym,64)
    Sd = jnp.transpose(S[:, :, :, jnp.asarray(N.HT_DATA_BINS)],
                       (0, 2, 3, 1))                          # (B,nsym,52,2)
    Sp = jnp.transpose(S[:, :, :, jnp.asarray(N.HT_PILOT_BINS)],
                       (0, 2, 3, 1))                          # (B,nsym,4,2)
    xd = jnp.einsum("bkij,bnkj->bnki", Wd, Sd) / dd[:, None]  # (B,nsym,52,2)
    xpil = jnp.einsum("bkij,bnkj->bnki", Wp, Sp) / dp[:, None]

    # phase + slope tracking from the HT pilots (TPilotTrack_11n,
    # pilot_11n.hpp:99 + the const/delta rotation of pilot.hpp:142-236).
    # An SFO window drift multiplies the received Y_k by exp(j*delta*k)
    # which commutes through the per-subcarrier detector, so every
    # stream's detected
    # pilot carries the same common-phase + per-subcarrier ramp.
    from sora_tpu.phy.dot11a.rx import _pilot_slope
    from sora_tpu.phy.dot11n.tx import _pilot_table
    expect = jnp.asarray(_pilot_table(nsym))                  # (nsym,2,4)
    # xpil is (B, nsym, pilot, stream) -> align to (nsym, stream, pilot)
    pvs = (jnp.transpose(xpil, (0, 1, 3, 2))
           * jnp.conj(expect.astype(jnp.complex64))[None])
    pv4 = jnp.sum(pvs, axis=2)                   # (B, nsym, 4) per pilot
    slope = _pilot_slope(pv4)
    # de-ramp before the common-phase sum (see phy.dot11a.rx: the raw
    # pilot sum crosses zero at drift slope = pi/28 and flips angle by pi)
    k4 = jnp.asarray(N.HT_PILOT_SC.astype(np.float32))
    ph = jnp.angle(jnp.sum(
        pv4 * jnp.exp(-1j * slope[:, :, None] * k4[None, None, :]),
        axis=-1))
    k52 = jnp.asarray(N.HT_DATA_SC.astype(np.float32))
    xd = xd * jnp.exp(-1j * (ph[:, :, None]
                             + slope[:, :, None] * k52[None, None, :])
                      )[:, :, :, None]
    if return_weights:
        return sig_eq, xd, snr_db, wgt
    return sig_eq, xd, snr_db


# =============================================================================
# SIG decode
# =============================================================================


@jax.jit
def decode_lsig(eq: jnp.ndarray):
    """(B, 48) L-SIG carriers -> (lsig_ok (B,) bool).  For HT mixed-mode
    the L-SIG only gates the frame (rate 6 Mbps spoof length); the real
    parameters come from HT-SIG.  Validity via the 11a valid-SIGNAL
    codebook (phy.dot11a.rx._signal_ml_tables): one MXU matmul + a
    hard-distance bound replaces the 24-step sequential Viterbi scan."""
    from sora_tpu.phy.dot11a.rx import _SIG_MAX_DIST, _signal_ml_tables

    soft = dmap.demap_soft(eq, "bpsk")
    de = soft[:, _SIG_PERM]
    tmpl, _rb = _signal_ml_tables()
    score = jnp.matmul(de, jnp.asarray(tmpl).T)
    m = jnp.argmax(score, axis=-1)
    hard = (de > 0).astype(jnp.uint8)
    cw = (jnp.asarray((tmpl > 0).astype(np.uint8)))[m]
    dist = jnp.sum(hard ^ cw, axis=-1)
    return (dist <= _SIG_MAX_DIST) & ((m % 4096) > 0)


@jax.jit
def decode_htsig(eq2: jnp.ndarray):
    """(B, 2, 48) HT-SIG1/2 carriers (QBPSK — constellation on the
    imaginary axis) -> (mcs (B,), length (B,), crc_ok (B,), sgi (B,))
    where sgi is HT-SIG bit 31 (the short-guard-interval flag)."""
    soft = jnp.imag(eq2).astype(jnp.float32)[:, :, _SIG_PERM]
    hs = soft.reshape(soft.shape[0], 96)
    bits = dvit.decode_auto(hs.reshape(-1, 48, 2), terminated=True,
                            blockwise=False).astype(jnp.int32)
    mcs = jnp.sum(bits[:, :7] << jnp.arange(7)[None, :], axis=-1)
    length = jnp.sum(bits[:, 8:24] << jnp.arange(16)[None, :], axis=-1)
    crc = (jnp.sum(jnp.asarray(_CRC8_MAT, jnp.int32)[None]
                   * bits[:, None, :34], axis=-1)
           + jnp.asarray(_CRC8_CONST, jnp.int32)[None]) & 1
    crc_ok = jnp.all(crc == bits[:, 34:42], axis=-1)
    tail_ok = jnp.sum(bits[:, 42:48], axis=-1) == 0
    return mcs, length, crc_ok & tail_ok, bits[:, 31]


# =============================================================================
# DATA decode (per-MCS, shape-static)
# =============================================================================


@lru_cache(maxsize=None)
def _mcs_symbol_matrix(mcs: int) -> np.ndarray:
    """(ncbps, 2*ndbps) per-symbol one-hot collapsing stream parse +
    per-stream HT deinterleave + depuncture into a single linear map
    (the fixed-MCS slice of the _auto_tables_n construction) — gathers
    and scatters are near-scalar on TPU, one MXU matmul per symbol
    block replaces them all."""
    m = N.MCS[mcs]
    mats, _, _, _, _ = _auto_tables_n(1 << 20, 1 << 20)
    ri = _MCS_LIST.index(mcs)
    off = _MOD_OFF_N[m.modulation]
    rows = [np.asarray(mats[ri][i * _STREAM_W + off:
                                i * _STREAM_W + off + m.ncbpss])
            for i in range(2)]
    return np.concatenate(rows, axis=0)          # (2*ncbpss, 2*ndbps)


_NBPSC = {"bpsk": 1, "qpsk": 2, "qam16": 4, "qam64": 6}


def _expand_weights(wgt: jnp.ndarray, nbpsc: int) -> jnp.ndarray:
    """(B, 52, 2) per-(subcarrier, stream) LLR weights -> (B, 2*52*nbpsc)
    per-soft-bit scale, stream-major then carrier-major (the demap
    concat layout of decode_data)."""
    w = jnp.repeat(jnp.transpose(wgt, (0, 2, 1)), nbpsc, axis=-1)
    return w.reshape(wgt.shape[0], -1)


@partial(jax.jit, static_argnames=("mcs", "max_psdu"))
def decode_data(xd: jnp.ndarray, length: jnp.ndarray, mcs: int,
                max_psdu: int = MAX_PSDU, weights: jnp.ndarray = None):
    """Decode MMSE-detected HT data symbols for one MCS.

    xd: (B, nsym_max, 52, 2) per-stream detected carriers; length: (B,)
    PSDU byte counts from HT-SIG; weights: optional (B, 52, 2) LLR
    confidence from extract_symbols(return_weights=True).  Returns
    (psdu (B, max_psdu) uint8, fcs_ok (B,) bool).
    """
    m = N.MCS[mcs]
    B, nsym_max = xd.shape[0], xd.shape[1]
    soft = jnp.concatenate(
        [dmap.demap_soft(xd[:, :, :, i], m.modulation) for i in range(2)],
        axis=-1)                                   # (B, nsym, 2*ncbpss)
    if weights is not None:
        soft = soft * _expand_weights(weights, _NBPSC[m.modulation]
                                      )[:, None, :]
    nbits = 16 + 8 * length + 6
    nsym_actual = -(-nbits // m.ndbps)
    symi = jnp.arange(nsym_max)[None, :]
    soft = jnp.where(symi[:, :, None] < nsym_actual[:, None, None],
                     soft, 0.0)
    ab = jnp.einsum("bsj,jk->bsk", soft,
                    jnp.asarray(_mcs_symbol_matrix(mcs)))
    t_steps = nsym_max * m.ndbps
    bits = dvit.decode_auto(ab.reshape(B, t_steps, 2), terminated=True)
    return _finish_frame(bits, length, t_steps, max_psdu)


def _finish_frame(bits: jnp.ndarray, length: jnp.ndarray, t_steps: int,
                  max_psdu: int):
    """Shared frame tail: descramble (seed phase from the first 7 bits),
    pack PSDU bytes LSB-first, check the FCS on device."""
    B = bits.shape[0]
    match = jnp.all(jnp.asarray(dscr._PHASES_J[None, :, :7])
                    == bits[:, None, :7], axis=-1)
    phase = jnp.argmax(match, axis=-1)
    seq = jnp.asarray(dscr._PHASES_J)[phase]
    reps = -(-t_steps // 127)
    seq = jnp.tile(seq, (1, reps))[:, :t_steps]
    desc = bits ^ seq

    nbytes_max = (t_steps - 22) // 8
    payload = desc[:, 16: 16 + 8 * nbytes_max].reshape(B, nbytes_max, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    psdu = jnp.sum(payload * weights[None, None, :], axis=-1,
                   dtype=jnp.uint32).astype(jnp.uint8)
    psdu = jnp.pad(psdu, ((0, 0), (0, max(0, max_psdu - nbytes_max))))
    psdu = psdu[:, :max_psdu]
    body_crc = dcrc.crc32_batch(psdu, length - 4)
    idx = jnp.clip(length[:, None] - 4 + jnp.arange(4)[None, :], 0,
                   max_psdu - 1)
    fcs_bytes = jnp.take_along_axis(psdu, idx, axis=1).astype(jnp.uint32)
    rx_fcs = (fcs_bytes[:, 0] | (fcs_bytes[:, 1] << 8)
              | (fcs_bytes[:, 2] << 16) | (fcs_bytes[:, 3] << 24))
    fcs_ok = (body_crc == rx_fcs) & (length >= 4) & \
        (length <= jnp.uint32(max_psdu))
    return psdu, fcs_ok


# =============================================================================
# Whole-chain pipeline (one jit program per MCS)
# =============================================================================


@partial(jax.jit, static_argnames=("mcs", "max_psdu", "short_gi",
                                   "mmse", "weighted"))
def rx_pipeline(x: jnp.ndarray, mcs: int, max_psdu: int = MAX_PSDU,
                short_gi: bool = False, mmse: bool = True,
                weighted: bool = True):
    """Complete batched 2x2 HT RX for a known MCS.

    x: (B, 2, N) complex64.  Returns dict with psdu (B, max_psdu) uint8,
    ok/fcs_ok/sig_ok (B,) uint8, mcs/length (B,) int32, snr_db, lts1, cfo.
    ``short_gi`` decodes 400 ns-guard data symbols and requires HT-SIG
    bit 31 to agree.
    """
    per = 72 if short_gi else 80
    nsym_win = max(1, (int(x.shape[-1]) - _OFF_DATA) // per)
    nsym = min(max_symbols(mcs, max_psdu), nsym_win)
    lts1, cfo, det = synchronize(x)
    sig_eq, xd, snr_db, wgt = extract_symbols(x, lts1, cfo, nsym,
                                              short_gi, mmse,
                                              return_weights=True)
    lsig_ok = decode_lsig(sig_eq[:, 0])
    mcs_rx, length, htsig_ok, sgi_rx = decode_htsig(sig_eq[:, 1:])
    length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
    psdu, fcs_ok = decode_data(xd, length, mcs, max_psdu,
                               wgt if weighted else None)
    sig_ok = lsig_ok & htsig_ok
    cs_ok = det >= CS_DET_THRESHOLD
    ok = (cs_ok & sig_ok & (mcs_rx == mcs) & fcs_ok
          & (sgi_rx == (1 if short_gi else 0)))
    return {"psdu": psdu, "fcs_ok": fcs_ok.astype(jnp.uint8),
            "sig_ok": sig_ok.astype(jnp.uint8), "ok": ok.astype(jnp.uint8),
            "cs_ok": cs_ok.astype(jnp.uint8), "det": det,
            "mcs": mcs_rx.astype(jnp.int32), "length": length,
            "snr_db": snr_db, "lts1": lts1, "cfo": cfo}


# =============================================================================
# Single-spatial-stream path (MCS 0-7, Table 20-30)
# =============================================================================
#
# The reference supported 2-stream HT only (MCS 8-10); a complete HT
# station also speaks the single-stream set.  Nsts = 1 degenerates the
# MIMO machinery: ONE HT-LTF (so data starts 80 samples earlier), a
# (2 RX x 1) channel column, and maximal-ratio combining instead of the
# 2x2 inverse — the same shapes as the legacy-coded SIG symbols.


@partial(jax.jit, static_argnames=("nsym", "short_gi",
                                   "return_weights"))
def extract_symbols_1ss(x: jnp.ndarray, lts1: jnp.ndarray,
                        cfo: jnp.ndarray, nsym: int,
                        short_gi: bool = False,
                        return_weights: bool = False):
    """Front end for single-stream HT frames.  x: (B, 2, N).
    Returns (sig_eq (B, 3, 48), xd (B, nsym, 52), snr_db (B,)[, wgt
    (B, 52) per-subcarrier MRC confidence for LLR weighting])."""
    B, A, Nn = x.shape
    per = 72 if short_gi else 80
    gi = per - 64
    need = _OFF_DATA_1SS + per * nsym
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, need)))

    def cut(frame, start):
        return jax.lax.dynamic_slice(frame, (0, start), (A, need))

    y = jax.vmap(cut)(xp, lts1)
    n_idx = jnp.arange(need, dtype=jnp.float32)
    y = y * jnp.exp(-1j * cfo[:, None, None] * n_idx)
    fine = jnp.angle(jnp.sum(jnp.conj(y[:, :, :64]) * y[:, :, 64:128],
                             axis=(-2, -1))).astype(jnp.float32) / 64.0
    y = y * jnp.exp(-1j * fine[:, None, None] * n_idx)

    L = 0.5 * (dfft.fft64(y[:, :, :64]) + dfft.fft64(y[:, :, 64:128]))
    Hleg = L * jnp.asarray(_LTS_SIGN)
    nvar = jnp.mean(jnp.abs(y[:, :, :64] - y[:, :, 64:128]) ** 2,
                    axis=(-2, -1)) / 2
    sig_p = jnp.mean(jnp.abs(Hleg) ** 2, axis=(-2, -1)) * (64.0 / 52.0)
    snr_db = 10.0 * jnp.log10(sig_p / (nvar + 1e-12) + 1e-12)

    lsig = _mrc_symbol(y, Hleg, _OFF_LSIG, 0)
    ht1 = _mrc_symbol(y, Hleg, _OFF_HTSIG1, 1)
    ht2 = _mrc_symbol(y, Hleg, _OFF_HTSIG2, 2)
    gain = jnp.mean(jnp.abs(lsig), axis=-1, keepdims=True) + 1e-12
    sig_eq = jnp.stack([lsig, ht1, ht2], axis=1) / gain[:, None, :]

    if nsym == 0:
        z = jnp.zeros((B, 0, 52), jnp.complex64)
        if return_weights:
            return sig_eq, z, snr_db, jnp.ones((B, 52), jnp.float32)
        return sig_eq, z, snr_db

    # (2 x 1) channel column from the single HT-LTF
    lseq_full = np.ones(64, np.float32)
    lseq_full[N.HT_OCC_BINS] = np.where(N.HTLTF_FREQ == 0, 1.0,
                                        N.HTLTF_FREQ)
    Yl = dfft.fft64(y[:, :, _OFF_HTLTF1 + 16: _OFF_HTLTF1 + 80])
    H = Yl * jnp.asarray(lseq_full)[None, None, :]        # (B, 2, 64)

    sym = y[:, :, _OFF_DATA_1SS: _OFF_DATA_1SS + per * nsym].reshape(
        B, A, nsym, per)[:, :, :, gi:]
    S = dfft.fft64(sym)                                   # (B,2,nsym,64)
    num = jnp.sum(jnp.conj(H)[:, :, None, :] * S, axis=1)
    den = jnp.sum(jnp.abs(H) ** 2, axis=1)[:, None, :] + 1e-12
    E = num / den                                         # (B,nsym,64)

    # pilot phase + slope track (PSI1 rotation, eq 20-59)
    from sora_tpu.phy.dot11a.rx import _pilot_slope
    k = np.arange(nsym)
    expect = (N.PSI1[(np.arange(4)[None, :] + k[:, None]) % 4]
              * C.PILOT_POLARITY[(3 + k) % 127][:, None]
              ).astype(np.float32)                        # (nsym, 4)
    pv = E[:, :, jnp.asarray(N.HT_PILOT_BINS)] * jnp.asarray(expect)[None]
    slope = _pilot_slope(pv)
    k4 = jnp.asarray(N.HT_PILOT_SC.astype(np.float32))
    ph = jnp.angle(jnp.sum(
        pv * jnp.exp(-1j * slope[:, :, None] * k4[None, None, :]),
        axis=-1))
    k52 = jnp.asarray(N.HT_DATA_SC.astype(np.float32))
    E = E[:, :, jnp.asarray(N.HT_DATA_BINS)] * jnp.exp(
        -1j * (ph[:, :, None] + slope[:, :, None] * k52[None, None, :]))
    if return_weights:
        # post-MRC inverse noise amplification = the combining gain
        # sum_a |H_ak|^2 itself (E is unbiased); unit-mean normalized
        wgt = den[:, 0, jnp.asarray(N.HT_DATA_BINS)]
        wgt = wgt / (jnp.mean(wgt, axis=-1, keepdims=True) + 1e-20)
        return sig_eq, E, snr_db, wgt.astype(jnp.float32)
    return sig_eq, E, snr_db


@lru_cache(maxsize=None)
def _mcs1_symbol_matrix(mcs: int) -> np.ndarray:
    """(ncbpss, 2*ndbps) per-symbol one-hot collapsing the stream-0 HT
    deinterleave + depuncture into one linear map (the Nss=1 slice of
    the _auto_tables_n construction)."""
    m = N.MCS1[mcs]
    perm = N.ht_interleaver_permutation(m.nbpsc, 0)
    pa, pb = N.puncture_pattern(m.num, m.den)
    keep = np.stack([pa, pb], -1).reshape(-1)
    keepf = np.tile(keep, -(-2 * m.ndbps // len(keep)))[: 2 * m.ndbps]
    tx_slots = np.flatnonzero(keepf)                   # (ncbpss,)
    P = np.zeros((m.ncbpss, 2 * m.ndbps), np.float32)
    P[perm[np.arange(m.ncbpss)], tx_slots] = 1.0
    return P


@partial(jax.jit, static_argnames=("mcs", "max_psdu"))
def decode_data_1ss(xd: jnp.ndarray, length: jnp.ndarray, mcs: int,
                    max_psdu: int = MAX_PSDU,
                    weights: jnp.ndarray = None):
    """xd: (B, nsym_max, 52) MRC-combined carriers -> (psdu, fcs_ok).
    weights: optional (B, 52) per-subcarrier LLR confidence."""
    m = N.MCS1[mcs]
    B, nsym_max = xd.shape[0], xd.shape[1]
    soft = dmap.demap_soft(xd, m.modulation)       # (B, nsym, ncbpss)
    if weights is not None:
        soft = soft * jnp.repeat(weights, _NBPSC[m.modulation],
                                 axis=-1)[:, None, :]
    nbits = 16 + 8 * length + 6
    nsym_actual = -(-nbits // m.ndbps)
    symi = jnp.arange(nsym_max)[None, :]
    soft = jnp.where(symi[:, :, None] < nsym_actual[:, None, None],
                     soft, 0.0)
    ab = jnp.einsum("bsj,jk->bsk", soft,
                    jnp.asarray(_mcs1_symbol_matrix(mcs)))
    t_steps = nsym_max * m.ndbps
    bits = dvit.decode_auto(ab.reshape(B, t_steps, 2), terminated=True)
    return _finish_frame(bits, length, t_steps, max_psdu)


@partial(jax.jit, static_argnames=("mcs", "max_psdu", "short_gi"))
def rx_pipeline_1ss(x: jnp.ndarray, mcs: int, max_psdu: int = MAX_PSDU,
                    short_gi: bool = False):
    """Complete batched single-stream HT RX for a known MCS 0-7.
    x: (B, 2, N) complex64 (2 RX antennas, MRC)."""
    per = 72 if short_gi else 80
    nsym_win = max(1, (int(x.shape[-1]) - _OFF_DATA_1SS) // per)
    nsym = min(max_symbols(mcs, max_psdu), nsym_win)
    lts1, cfo, det = synchronize(x)
    sig_eq, xd, snr_db, wgt = extract_symbols_1ss(
        x, lts1, cfo, nsym, short_gi, return_weights=True)
    lsig_ok = decode_lsig(sig_eq[:, 0])
    mcs_rx, length, htsig_ok, sgi_rx = decode_htsig(sig_eq[:, 1:])
    length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
    psdu, fcs_ok = decode_data_1ss(xd, length, mcs, max_psdu, wgt)
    sig_ok = lsig_ok & htsig_ok
    cs_ok = det >= CS_DET_THRESHOLD
    ok = (cs_ok & sig_ok & (mcs_rx == mcs) & fcs_ok
          & (sgi_rx == (1 if short_gi else 0)))
    return {"psdu": psdu, "fcs_ok": fcs_ok.astype(jnp.uint8),
            "sig_ok": sig_ok.astype(jnp.uint8), "ok": ok.astype(jnp.uint8),
            "cs_ok": cs_ok.astype(jnp.uint8), "det": det,
            "mcs": mcs_rx.astype(jnp.int32), "length": length,
            "snr_db": snr_db, "lts1": lts1, "cfo": cfo}


_MCS1_LIST = sorted(N.MCS1)                        # 0..7


@lru_cache(maxsize=None)
def _auto_tables_1ss(max_psdu: int, nsym_cap: int = 1 << 30):
    """Per-MCS one-hot (676 -> 2*ndbps) matrices for the single-stream
    mixed-MCS decoder (the Nss=1 sibling of _auto_tables_n)."""
    nsyms = tuple(min(max_symbols(mc, max_psdu), nsym_cap)
                  for mc in _MCS1_LIST)
    nsym_max = max(nsyms)
    t_max = max(n * N.MCS1[mc].ndbps for n, mc in zip(nsyms, _MCS1_LIST))
    mats = []
    for mc in _MCS1_LIST:
        m = N.MCS1[mc]
        perm = N.ht_interleaver_permutation(m.nbpsc, 0)
        pa, pb = N.puncture_pattern(m.num, m.den)
        keep = np.stack([pa, pb], -1).reshape(-1)
        keepf = np.tile(keep, -(-2 * m.ndbps // len(keep)))[: 2 * m.ndbps]
        tx_slots = np.flatnonzero(keepf)
        P = np.zeros((_STREAM_W, 2 * m.ndbps), np.float32)
        P[_MOD_OFF_N[m.modulation] + perm[np.arange(m.ncbpss)],
          tx_slots] = 1.0
        mats.append(P)
    return (tuple(mats), nsyms,
            np.array([N.MCS1[mc].ndbps for mc in _MCS1_LIST], np.int32),
            nsym_max, t_max)


@partial(jax.jit, static_argnames=("max_psdu",))
def rx_pipeline_auto_1ss(x: jnp.ndarray, max_psdu: int = MAX_PSDU):
    """Complete batched single-stream HT RX with runtime MCS dispatch:
    a batch mixing MCS 0-7 decodes in ONE jit program.  x: (B, 2, N)."""
    nsym_win = max(1, (int(x.shape[-1]) - _OFF_DATA_1SS) // 80)
    mats, nsyms, ndbps_tab, nsym_max, t_max = _auto_tables_1ss(max_psdu,
                                                               nsym_win)
    lts1, cfo, det = synchronize(x)
    sig_eq, xd, snr_db, wgt = extract_symbols_1ss(
        x, lts1, cfo, nsym_max, return_weights=True)
    B = sig_eq.shape[0]
    lsig_ok = decode_lsig(sig_eq[:, 0])
    mcs_rx, length, htsig_ok, sgi_rx = decode_htsig(sig_eq[:, 1:])
    length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
    # the mixed-MCS program decodes 800 ns-guard symbols; an SGI frame
    # must not false-accept here (route it to the short_gi pipelines)
    known = ((mcs_rx >= _MCS1_LIST[0]) & (mcs_rx <= _MCS1_LIST[-1])
             & (sgi_rx == 0))
    mcs_idx = jnp.clip(mcs_rx, 0, len(_MCS1_LIST) - 1)

    soft_cat = jnp.concatenate(
        [dmap.demap_soft(xd, mod) for mod in _MOD_ORDER], axis=-1)
    we = jnp.concatenate(
        [jnp.repeat(wgt, _NBPSC[mod], axis=-1) for mod in _MOD_ORDER],
        axis=-1)                                   # (B, 676)
    soft_cat = soft_cat * we[:, None, :]
    ndbps = jnp.asarray(ndbps_tab)[mcs_idx]
    nbits = 16 + 8 * length + 6
    nsym_actual = (nbits + ndbps - 1) // ndbps
    symi = jnp.arange(nsym_max)[None, :, None]
    soft_cat = jnp.where(symi < nsym_actual[:, None, None], soft_cat, 0.0)
    onehot = (mcs_idx[:, None]
              == jnp.arange(len(_MCS1_LIST))[None, :]).astype(jnp.float32)
    ab = jnp.zeros((B, t_max, 2), jnp.float32)
    for ri, mc in enumerate(_MCS1_LIST):
        nd = N.MCS1[mc].ndbps
        sel = soft_cat[:, : nsyms[ri]] * onehot[:, ri, None, None]
        ab_r = jnp.einsum("bsj,jk->bsk", sel,
                          jnp.asarray(mats[ri])).reshape(
            B, nsyms[ri] * nd, 2)
        ab = ab.at[:, : nsyms[ri] * nd, :].add(ab_r)
    bits = dvit.decode_auto(ab, terminated=True)
    psdu, fcs_ok = _finish_frame(bits, length, t_max, max_psdu)

    sig_ok = lsig_ok & htsig_ok
    cs_ok = det >= CS_DET_THRESHOLD
    ok = cs_ok & sig_ok & known & fcs_ok
    return {"psdu": psdu, "fcs_ok": fcs_ok.astype(jnp.uint8),
            "sig_ok": sig_ok.astype(jnp.uint8), "ok": ok.astype(jnp.uint8),
            "cs_ok": cs_ok.astype(jnp.uint8), "det": det,
            "mcs": mcs_rx.astype(jnp.int32), "length": length,
            "snr_db": snr_db, "lts1": lts1, "cfo": cfo}


# =============================================================================
# Mixed-MCS batched decode (runtime MCS dispatch)
# =============================================================================
#
# Mirrors phy.dot11a.rx.rx_pipeline_auto: demap every HT symbol under all
# four modulations per spatial stream, concatenate, and collapse
# stream-parse + deinterleave + depuncture + modulation-select into ONE
# static gather table per MCS, indexed by each frame's HT-SIG MCS — the
# batched TBB11nMRSelect (PHY_11n.hpp:290).

_MCS_LIST = sorted(N.MCS)                          # 8..15, idx 0..7
_MOD_ORDER = ("bpsk", "qpsk", "qam16", "qam64")
_MOD_OFF_N = {"bpsk": 0, "qpsk": 52, "qam16": 156, "qam64": 364}
_STREAM_W = 676                                    # 52+104+208+312


@lru_cache(maxsize=None)
def _auto_tables_n(max_psdu: int, nsym_cap: int = 1 << 30):
    """Static per-MCS one-hot matrices collapsing stream-parse +
    deinterleave + depuncture + modulation-select for ONE HT symbol.

    HT symbol boundaries align with puncture-period boundaries for every
    MCS, so the map from a symbol's concatenated soft vector (2 streams x
    676) to its (ndbps, 2) trellis slots is the same linear map for every
    symbol — one static (1352 -> 2*ndbps) one-hot matmul per MCS on the
    MXU instead of a per-frame dynamic gather (near-scalar on TPU).
    Punctured slots are all-zero columns (erasures).  ``nsym_cap`` bounds
    symbols by the input window's physical capacity (see
    phy.dot11a.rx._auto_tables).

    Returns (mats tuple of (1352, 2*ndbps) float32; nsym (8,) per-MCS
    symbol counts; ndbps (8,) int32; nsym_max; T_max)."""
    nsyms = tuple(min(max_symbols(mc, max_psdu), nsym_cap)
                  for mc in _MCS_LIST)
    nsym_max = max(nsyms)
    t_max = max(n * N.MCS[mc].ndbps for n, mc in zip(nsyms, _MCS_LIST))
    sym_w = 2 * _STREAM_W
    mats = []
    for ri, mc in enumerate(_MCS_LIST):
        m = N.MCS[mc]
        ncbps = 2 * m.ncbpss
        sp = N.stream_parse_indices(ncbps, m.nbpsc)        # (2, ncbpss)
        inv_stream = np.zeros(ncbps, np.int64)
        inv_pos = np.zeros(ncbps, np.int64)
        for i in range(2):
            inv_stream[sp[i]] = i
            inv_pos[sp[i]] = np.arange(m.ncbpss)
        perm2 = np.stack([N.ht_interleaver_permutation(m.nbpsc, i)
                          for i in range(2)])              # (2, ncbpss)
        pa, pb = N.puncture_pattern(m.num, m.den)
        keep = np.stack([pa, pb], -1).reshape(-1)
        keepf = np.tile(keep, -(-2 * m.ndbps // len(keep)))[: 2 * m.ndbps]
        tx_slots = np.flatnonzero(keepf)                   # (ncbps,)
        q = np.arange(ncbps)
        i_s = inv_stream[q]
        k = inv_pos[q]
        src = i_s * _STREAM_W + _MOD_OFF_N[m.modulation] + perm2[i_s, k]
        P = np.zeros((sym_w, 2 * m.ndbps), np.float32)
        P[src, tx_slots] = 1.0
        mats.append(P)
    return (tuple(mats), nsyms,
            np.array([N.MCS[mc].ndbps for mc in _MCS_LIST], np.int32),
            nsym_max, t_max)


@partial(jax.jit, static_argnames=("max_psdu", "min_mcs"))
def rx_pipeline_auto(x: jnp.ndarray, max_psdu: int = MAX_PSDU,
                     min_mcs: int = 8):
    """Complete batched 2x2 HT RX with per-frame runtime MCS dispatch: a
    batch mixing MCS 8-15 decodes in ONE jit program.

    ``min_mcs`` declares the slowest MCS actually expected on the air
    (NodeConfig.min_rate_mbps's HT analogue): the per-MCS symbol tables
    cap at that MCS's max_psdu airtime, so a batch does not pay the
    MCS8 worst case when the traffic is all high-MCS.  Frames at a
    slower MCS AND longer than the cap truncate (crc_fail).

    x: (B, 2, N) complex64.  Returns the rx_pipeline dict (mcs is the
    per-frame parsed MCS).
    """
    nsym_win = max(1, (int(x.shape[-1]) - _OFF_DATA) // 80)
    nsym_air = max_symbols(max(8, min(15, min_mcs)), max_psdu)
    nsym_win = min(nsym_win, nsym_air)
    mats, nsyms, ndbps_tab, nsym_max, t_max = _auto_tables_n(max_psdu,
                                                             nsym_win)
    lts1, cfo, det = synchronize(x)
    sig_eq, xd, snr_db, wgt = extract_symbols(x, lts1, cfo, nsym_max,
                                              return_weights=True)
    out = auto_tail(sig_eq, xd, det, max_psdu, nsym_win, weights=wgt)
    out.update({"snr_db": snr_db, "lts1": lts1, "cfo": cfo})
    return out


@partial(jax.jit, static_argnames=("max_psdu", "nsym_cap",
                                   "det_threshold"))
def auto_tail(sig_eq: jnp.ndarray, xd: jnp.ndarray, det: jnp.ndarray,
              max_psdu: int, nsym_cap: int,
              det_threshold: float = CS_DET_THRESHOLD,
              weights: jnp.ndarray = None):
    """L-SIG/HT-SIG parse + mixed-MCS ZF decode from detected symbols —
    the shared back half of :func:`rx_pipeline_auto`, also driven
    batch-parallel by the sharded pipeline (parallel.shard).  ``ok`` is
    gated on the carrier-sense metric like the 11a chain (TCCA11n's
    decision statistic, cca_11n.hpp:7)."""
    mats, nsyms, ndbps_tab, nsym_max, t_max = _auto_tables_n(max_psdu,
                                                             nsym_cap)
    B = sig_eq.shape[0]
    lsig_ok = decode_lsig(sig_eq[:, 0])
    mcs_rx, length, htsig_ok, sgi_rx = decode_htsig(sig_eq[:, 1:])
    length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
    known = ((mcs_rx >= _MCS_LIST[0]) & (mcs_rx <= _MCS_LIST[-1])
             & (sgi_rx == 0))
    mcs_idx = jnp.clip(mcs_rx - _MCS_LIST[0], 0, len(_MCS_LIST) - 1)

    # demap all modulations per spatial stream, concat per symbol
    streams = []
    for i in range(2):
        streams.append(jnp.concatenate(
            [dmap.demap_soft(xd[:, :, :, i], mod) for mod in _MOD_ORDER],
            axis=-1))                              # (B, nsym, 676)
    soft_cat = jnp.stack(streams, axis=2)          # (B, nsym, 2, 676)
    if weights is not None:
        we = jnp.concatenate(
            [jnp.repeat(jnp.transpose(weights, (0, 2, 1)),
                        _NBPSC[mod], axis=-1) for mod in _MOD_ORDER],
            axis=-1)                               # (B, 2, 676)
        soft_cat = soft_cat * we[:, None]
    ndbps = jnp.asarray(ndbps_tab)[mcs_idx]
    nbits = 16 + 8 * length + 6
    nsym_actual = (nbits + ndbps - 1) // ndbps
    symi = jnp.arange(nsym_max)[None, :, None, None]
    soft_cat = jnp.where(symi < nsym_actual[:, None, None, None],
                         soft_cat, 0.0)
    soft_sym = soft_cat.reshape(B, nsym_max, 2 * _STREAM_W)
    # per-MCS per-symbol one-hot matmul (MXU); the MCS select folds into
    # each matmul's input and results accumulate (no (8, B, T, 2) stack)
    onehot = (mcs_idx[:, None]
              == jnp.arange(len(_MCS_LIST))[None, :]).astype(jnp.float32)
    ab = jnp.zeros((B, t_max, 2), jnp.float32)
    for ri, mc in enumerate(_MCS_LIST):
        nd = N.MCS[mc].ndbps
        sel = soft_sym[:, : nsyms[ri]] * onehot[:, ri, None, None]
        ab_r = jnp.einsum("bsj,jk->bsk", sel,
                          jnp.asarray(mats[ri])).reshape(
            B, nsyms[ri] * nd, 2)
        ab = ab.at[:, : nsyms[ri] * nd, :].add(ab_r)
    bits = dvit.decode_auto(ab, terminated=True)
    psdu, fcs_ok = _finish_frame(bits, length, t_max, max_psdu)

    sig_ok = lsig_ok & htsig_ok
    cs_ok = det >= det_threshold
    ok = cs_ok & sig_ok & known & fcs_ok
    return {"psdu": psdu, "fcs_ok": fcs_ok.astype(jnp.uint8),
            "sig_ok": sig_ok.astype(jnp.uint8), "ok": ok.astype(jnp.uint8),
            "cs_ok": cs_ok.astype(jnp.uint8),
            "mcs": mcs_rx.astype(jnp.int32), "length": length, "det": det}


# =============================================================================
# Host-facing API
# =============================================================================


@dataclass
class RxResult:
    ok: bool = False
    reason: str = "no_frame"
    mcs: int = -1
    length: int = 0
    psdu: bytes = b""
    fcs_ok: bool = False
    start: int = -1
    cfo: float = 0.0
    snr_est_db: float = 0.0
    _debug: dict = field(default_factory=dict)


def demodulate(x, expect_mcs: int | None = None) -> RxResult:
    """Single-frame convenience wrapper (API-compatible with the golden
    model's demodulate).  x: (2, nsamples) at 20 Msps."""
    from sora_tpu.util.xfer import device_complex

    xb = device_complex(np.asarray(x, dtype=np.complex64)[None])
    res = RxResult()
    if xb.ndim != 3 or xb.shape[1] != 2 or xb.shape[2] < 900:
        return res
    lts1, cfo, det = synchronize(xb)
    res.start = int(lts1[0])
    res.cfo = float(cfo[0])
    if float(det[0]) < CS_DET_THRESHOLD:
        res.reason = "cs_timeout"       # E_ERROR_CS_TIMEOUT analogue
        return res
    sig_eq, _, snr = extract_symbols(xb, lts1, cfo, 0)
    res.snr_est_db = float(snr[0])
    lsig_ok = decode_lsig(sig_eq[:, 0]).astype(jnp.uint8)
    if not bool(lsig_ok[0]):
        res.reason = "plcp_header_fail"
        return res
    mcs_rx, length, htsig_ok, sgi_rx = decode_htsig(sig_eq[:, 1:])
    if not bool(htsig_ok.astype(jnp.uint8)[0]):
        res.reason = "htsig_fail"
        return res
    sgi = bool(int(np.asarray(sgi_rx)[0]))
    mcs, res.length = int(mcs_rx[0]), int(length[0])
    res.mcs = mcs
    if mcs not in N.MCS and mcs not in N.MCS1:
        res.reason = "htsig_fail"
        return res
    if expect_mcs is not None and mcs != expect_mcs:
        res.reason = "unexpected_mcs"
        return res
    if res.length > MAX_PSDU:
        res.reason = "oversize"
        return res
    one_ss = mcs in N.MCS1
    off_data = _OFF_DATA_1SS if one_ss else _OFF_DATA
    per = 72 if sgi else 80
    nsym_actual = num_symbols(mcs, res.length)
    if x.shape[1] < res.start + off_data + per * nsym_actual:
        res.reason = "truncated"
        return res
    nsym = max_symbols(mcs)
    if one_ss:
        _, xd, _, wgt = extract_symbols_1ss(xb, lts1, cfo, nsym, sgi,
                                            return_weights=True)
        psdu, fcs_ok = decode_data_1ss(
            xd, jnp.asarray([res.length], jnp.int32), mcs, weights=wgt)
    else:
        _, xd, _, wgt = extract_symbols(xb, lts1, cfo, nsym, sgi,
                                        return_weights=True)
        psdu, fcs_ok = decode_data(
            xd, jnp.asarray([res.length], jnp.int32), mcs, weights=wgt)
    res.psdu = bytes(np.asarray(psdu[0])[: res.length])
    res.fcs_ok = bool(fcs_ok.astype(jnp.uint8)[0])
    res.ok = res.fcs_ok
    res.reason = "frame_ok" if res.ok else "crc32_fail"
    return res
