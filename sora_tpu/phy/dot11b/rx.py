"""802.11b DSSS receiver — JAX, batched, jit-compiled.

Reference graph (fb11bdemod_config.hpp:92-142): TEnergyDetect ->
TSymTiming/TBarkerSync -> TBB11bDespread -> TDBPSKDemap/TDQPSKDemap |
TCCK*Decoder -> TDesc741 descramble -> TBB11bPlcpParser (CRC16) ->
frame sink (FCS).  The reference hunts timing and the SFD with per-sample
state machines; here every stage is computed for ALL candidate positions
at once and selected with argmax/argmin — the two-phase vectorized
detection scheme of SURVEY §7.

All-rates batched decode with a static configured rate (like the 11a
pipeline): PLCP always decodes at 1 Mbps; the data section decodes at
``rate_mbps`` and the frame is flagged not-ok if the SIGNAL field
disagrees.  ``demodulate`` (host wrapper) auto-dispatches on the parsed
SIGNAL like the reference's TBB11bRxRateSel (PHY_11b.hpp:378).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.dsp import crc as dcrc
from sora_tpu.dsp import filters as df
from sora_tpu.phy import dot11b_common as B

_SFD = np.array([(B.SFD_LONG >> i) & 1 for i in range(16)], np.uint8)
_SFD_S = np.array([(B.SFD_SHORT >> i) & 1 for i in range(16)], np.uint8)
_SFD_LIMIT = B.SYNC_BITS + 64           # search window for the SFD
_PLCP_SYMS = B.SYNC_BITS + 16 + 48      # 1 Mbps symbols before data


# =============================================================================
# GF(2) affine CRC-16 (PLCP header check without a bit-serial scan)
# =============================================================================


@lru_cache(maxsize=None)
def _crc16_affine():
    """CRC-16/PLCP over 32 bits is affine over GF(2): crc_bits = b @ M ^ c0.
    M: (32, 16) uint8, c0: (16,) uint8 (LSB-first crc bits as transmitted,
    matching plcp_header_bits)."""
    def crc_bits(bits32):
        v = B.crc16_plcp(np.asarray(bits32, np.uint8))
        return np.array([(v >> i) & 1 for i in range(16)], np.uint8)

    c0 = crc_bits(np.zeros(32, np.uint8))
    M = np.zeros((32, 16), np.uint8)
    for i in range(32):
        e = np.zeros(32, np.uint8)
        e[i] = 1
        M[i] = crc_bits(e) ^ c0
    return M.astype(np.float32), c0


def _crc16_check(hdr: jnp.ndarray) -> jnp.ndarray:
    """hdr: (B, 48) bits -> (B,) bool CRC pass."""
    M, c0 = _crc16_affine()
    acc = jnp.matmul(hdr[:, :32].astype(jnp.float32), jnp.asarray(M),
                     precision=jax.lax.Precision.HIGHEST)
    want = (acc.astype(jnp.int32) % 2) ^ jnp.asarray(c0.astype(np.int32))
    return jnp.all(want == hdr[:, 32:48].astype(jnp.int32), axis=1)


# =============================================================================
# Stages
# =============================================================================


def _descramble(bits: jnp.ndarray, prev7: jnp.ndarray | None = None
                ) -> jnp.ndarray:
    """Feedforward self-sync descrambler out_i = b_i ^ b_{i-4} ^ b_{i-7}
    over the last axis (TDesc741, scramble.hpp).  prev7: (B, 7) register
    prehistory (zeros if None)."""
    if prev7 is None:
        prev7 = jnp.zeros(bits.shape[:-1] + (7,), bits.dtype)
    bp = jnp.concatenate([prev7, bits], axis=-1)
    return bp[..., 7:] ^ bp[..., 3:-4] ^ bp[..., :-7]


def synchronize(x: jnp.ndarray, search: int = 2300):
    """Packet onset + chip-phase timing: find the FIRST energy burst, then
    Barker-correlate and fold the magnitudes modulo 11 over the ``search``
    chips after it (the TEnergyDetect -> TSymTiming peak-tracking chain,
    cca.hpp:13 + symtiming.hpp:177 — but over all phases at once).

    Locking to the first burst (not the global fold maximum) lets a frame
    sit ANYWHERE in the window — the live node feeds overlapping windows
    whose frames are mid-stream — and mirrors the 11a chain's
    first-plateau selection.

    Returns (corr (B, nsym_tot) symbol correlations anchored at the sync,
    t0 (B,) chip offset of the first sync symbol, c full correlations).
    """
    c = df.correlate_stream(x, B.BARKER.astype(np.complex64))
    return synchronize_from_corr(x, c, search)


def synchronize_from_corr(x: jnp.ndarray, c: jnp.ndarray,
                          search: int = 2300):
    """Back half of :func:`synchronize` given the precomputed Barker
    correlation ``c`` — the sharded pipeline computes c with (dp, sp)
    chip-rate halos (parallel.shard) and runs this batch-parallel."""
    n = c.shape[-1]
    # first-burst onset: 128-chip moving energy, earliest >= 50% of peak
    en = df.moving_sum(jnp.abs(x[:, :n]) ** 2, 128).astype(jnp.float32)
    onset = jnp.argmax(en >= 0.5 * jnp.max(en, axis=-1, keepdims=True),
                       axis=-1).astype(jnp.int32)             # (B,)
    onset = jnp.minimum(onset, max(0, n - search))
    hn = min(search, n) - min(search, n) % 11
    # contiguous dynamic slices instead of take_along_axis gathers:
    # row-indexed gathers lower to near-scalar scatter/gather loops on
    # TPU, a dynamic_slice + strided reshape is a plain vector copy
    head = jnp.abs(jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st,), (hn,)))(
            c, onset))
    folds = head.reshape(x.shape[0], -1, 11).sum(axis=1)
    t0 = onset + jnp.argmax(folds, axis=1).astype(jnp.int32)  # (B,)
    nsym_tot = (n - 10) // 11
    span = 11 * nsym_tot
    cpad = jnp.pad(c, ((0, 0), (0, span)))
    corr = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st,), (span,)))(
            cpad, t0).reshape(x.shape[0], nsym_tot, 11)[:, :, 0]
    return corr, t0, c


@jax.jit
def detect_only(x: jnp.ndarray):
    """Cheap DSSS carrier sense for the live node's gating pass — the
    TEnergyDetect + TBarkerSync front half (cca.hpp:13, symtiming.hpp:12)
    without the full symbol-timing/PLCP machinery.

    Barker-correlate the chip stream and fold |corr|^2 modulo the 11-chip
    symbol period: during a real preamble one fold phase concentrates the
    energy (det -> ~11), over noise all phases are equal (det -> ~1).
    Returns (det (B,) float32, power (B,) float32).  Gate at det >~ 2.

    x: (B, N) complex64 chips at 11 Msps.
    """
    c = jnp.abs(df.correlate_stream(x, B.BARKER.astype(np.complex64))) ** 2
    n = c.shape[-1] - c.shape[-1] % 11
    folds = c[:, :n].reshape(x.shape[0], -1, 11).sum(axis=1)    # (B, 11)
    det = 11.0 * jnp.max(folds, axis=-1) / (jnp.sum(folds, axis=-1) + 1e-9)
    # peak 64-chip mean power (not the whole-window mean): keeps the
    # node's AGC honest on sparsely occupied windows (ADVICE r04)
    en = df.moving_sum(jnp.abs(x) ** 2, 64).astype(jnp.float32)
    power = (jnp.max(en, axis=-1) * (1.0 / 64.0)).astype(jnp.float32)
    return det.astype(jnp.float32), power


def _dbpsk_bits(corr: jnp.ndarray) -> jnp.ndarray:
    """Differential BPSK over successive Barker correlations; the first
    symbol (no reference) is taken as a sync one."""
    d = corr[:, 1:] * jnp.conj(corr[:, :-1])
    bits = (jnp.real(d) < 0).astype(jnp.uint8)
    one = jnp.ones(bits.shape[:-1] + (1,), jnp.uint8)
    return jnp.concatenate([one, bits], axis=-1)


def _find_pattern(desc: jnp.ndarray, pat_bits: np.ndarray,
                  sync_bit: int):
    """First offset where the descrambled 1 Mbps stream matches the
    16-bit pattern AND the 8 preceding bits all equal ``sync_bit`` (1 =
    the long SYNC's scrambled ones, 0 = the short SYNC's zeros): the
    XOR-distance is one matmul over all offsets (TSFDSync analogue,
    sfd_sync.hpp:12-134), and the sync-prefix guard rejects garbage bits
    decoded before the true sync (timing can lock a few symbols early)
    that occasionally alias the pattern.  Returns (pos (B,), found (B,))."""
    descf = desc.astype(jnp.float32)
    w = df.window_view(descf, 16)                       # (B, nw, 16)
    pat = pat_bits.astype(np.float32)
    dist = jnp.matmul(w, jnp.asarray(1.0 - 2.0 * pat),
                      precision=jax.lax.Precision.HIGHEST) + pat.sum()
    dist = dist[:, :_SFD_LIMIT]
    hit = dist.astype(jnp.int32) == 0
    # sum8[t] = number of ones in desc[t .. t+7]
    sum8 = df.moving_sum(descf, 8)
    ones_before = jnp.pad(sum8, ((0, 0), (8, 0)))[:, :dist.shape[1]]
    hit = hit & (ones_before.astype(jnp.int32) == 8 * sync_bit)
    pos = jnp.argmax(hit, axis=1).astype(jnp.int32)     # first valid hit
    return pos, jnp.any(hit, axis=1)


def find_sfd(desc: jnp.ndarray):
    """Long-preamble SFD (preceded by descrambled ones)."""
    return _find_pattern(desc, _SFD, 1)


def parse_plcp_short(corr: jnp.ndarray, bits: jnp.ndarray,
                     desc: jnp.ndarray):
    """Short-preamble PLCP (Clause 18.2.5; preamble_type 1 of
    PHY_11b.hpp:26): the reversed SFD follows descrambled ZEROS, and the
    48 header bits ride 24 DQPSK symbols at 2 Mbps.

    corr: (B, nsym) symbol correlations; bits: raw 1 Mbps decisions;
    desc: their descramble.  Returns dict with found/signal/service/
    length_us/crc_ok/data_sym0/prev7 (raw-bit descrambler prehistory
    for the data section)."""
    Bsz = bits.shape[0]
    pos, found = _find_pattern(desc, _SFD_S, 0)
    hs = pos + 16                                  # first header symbol
    idx = hs[:, None] - 1 + jnp.arange(25)[None, :]
    cs = jnp.take_along_axis(corr, jnp.clip(idx, 0, corr.shape[1] - 1), 1)
    d = cs[:, 1:] * jnp.conj(cs[:, :-1])
    q = jnp.round(jnp.angle(d) / (jnp.pi / 2)).astype(jnp.int32) % 4
    demap = jnp.asarray(np.array([[0, 0], [0, 1], [1, 1], [1, 0]],
                                 np.uint8))
    raw = demap[q].reshape(Bsz, 48)                # raw scrambled bits
    idx7 = hs[:, None] - 7 + jnp.arange(7)[None, :]
    prev7h = jnp.take_along_axis(bits,
                                 jnp.clip(idx7, 0, bits.shape[1] - 1), 1)
    hdr = _descramble(raw, prev7h)
    p2 = jnp.asarray(1 << np.arange(16, dtype=np.int64), jnp.int32)
    signal = jnp.sum(hdr[:, 0:8].astype(jnp.int32) * p2[None, :8], axis=1)
    service = jnp.sum(hdr[:, 8:16].astype(jnp.int32) * p2[None, :8],
                      axis=1)
    length_us = jnp.sum(hdr[:, 16:32].astype(jnp.int32) * p2[None, :],
                        axis=1)
    return {"found": found, "signal": signal, "service": service,
            "length_us": length_us, "crc_ok": _crc16_check(hdr),
            "data_sym0": hs + 24, "prev7": raw[:, -7:]}


def parse_plcp(desc: jnp.ndarray, pos: jnp.ndarray):
    """Extract + check the 48-bit PLCP header after the SFD at `pos`.

    Returns dict with signal (B,), length_us (B,), service (B,),
    crc_ok (B,), hdr_start (B,).
    """
    hdr_start = pos + 16
    idx = hdr_start[:, None] + jnp.arange(48)[None, :]
    hdr = jnp.take_along_axis(desc, jnp.clip(idx, 0, desc.shape[1] - 1), 1)
    p2 = jnp.asarray(1 << np.arange(16, dtype=np.int64), jnp.int32)
    signal = jnp.sum(hdr[:, 0:8].astype(jnp.int32) * p2[None, :8], axis=1)
    service = jnp.sum(hdr[:, 8:16].astype(jnp.int32) * p2[None, :8], axis=1)
    length_us = jnp.sum(hdr[:, 16:32].astype(jnp.int32) * p2[None, :],
                        axis=1)
    return {"signal": signal, "service": service, "length_us": length_us,
            "crc_ok": _crc16_check(hdr), "hdr_start": hdr_start}


def _parse_plcp_both(corr: jnp.ndarray, bits: jnp.ndarray,
                     desc: jnp.ndarray):
    """Auto-detected long/short PLCP parse: run both locators and select
    per frame — the runtime preamble_type dispatch (PHY_11b.hpp:26).
    Returns the merged header dict plus data_sym0 (first data symbol),
    prev7 (raw-bit descrambler prehistory), preamble (0 long, 1 short)."""
    pos_l, found_l = find_sfd(desc)
    pl = parse_plcp(desc, pos_l)
    sp = parse_plcp_short(corr, bits, desc)
    use_s = sp["found"] & ~found_l
    hdr_end_l = pl["hdr_start"] + 48
    idx7 = hdr_end_l[:, None] - 7 + jnp.arange(7)[None, :]
    prev7_l = jnp.take_along_axis(bits,
                                  jnp.clip(idx7, 0, bits.shape[1] - 1), 1)
    sel = lambda s_val, l_val: jnp.where(use_s, s_val, l_val)
    return {"found": found_l | sp["found"],
            "signal": sel(sp["signal"], pl["signal"]),
            "service": sel(sp["service"], pl["service"]),
            "length_us": sel(sp["length_us"], pl["length_us"]),
            "crc_ok": jnp.where(use_s, sp["crc_ok"], pl["crc_ok"]),
            "data_sym0": sel(sp["data_sym0"], hdr_end_l),
            "prev7": jnp.where(use_s[:, None], sp["prev7"], prev7_l),
            "preamble": use_s.astype(jnp.uint8)}


def _data_nbits(rate_mbps: float, length_us: jnp.ndarray,
                service: jnp.ndarray) -> jnp.ndarray:
    if rate_mbps == 5.5:
        nbits = (11 * length_us) // 2
    else:
        nbits = int(rate_mbps) * length_us
    if rate_mbps == 11:
        nbits = nbits - jnp.where((service & 0x80) != 0, 8, 0)
    return nbits


def _decode_psk(c: jnp.ndarray, data_chip0: jnp.ndarray, nsym: int,
                rate_mbps: float):
    """1/2 Mbps data: slice symbol correlations from the full correlation
    stream at the data chips, differential demod (TDBPSKDemap/TDQPSKDemap,
    barkerspread.hpp:314)."""
    span = 11 * (nsym + 1)
    cpad = jnp.pad(c, ((0, 0), (11, span)))
    cs = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st,), (span,)))(
            cpad, jnp.maximum(data_chip0, 0)
        ).reshape(c.shape[0], nsym + 1, 11)[:, :, 0]   # ref + nsym
    d = cs[:, 1:] * jnp.conj(cs[:, :-1])
    if rate_mbps == 1:
        return (jnp.real(d) < 0).astype(jnp.uint8)
    ang = jnp.angle(d)
    q = jnp.round(ang / (jnp.pi / 2)).astype(jnp.int32) % 4
    demap = jnp.asarray(np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.uint8))
    return demap[q].reshape(q.shape[0], -1)


def _decode_cck(x: jnp.ndarray, c: jnp.ndarray, data_chip0: jnp.ndarray,
                nsym: int, rate_mbps: float):
    """CCK 5.5/11: correlator bank over the codebook (one MXU matmul per
    batch — TCCK5P5Decoder/TCCK11Decoder, cck.hpp:210,784), winner argmax,
    differential phi1 recovered lag-1-parallel from the winning scores."""
    book = (B.cck55_codebook() if rate_mbps == 5.5
            else B.cck11_codebook()).astype(np.complex64)
    nbps = 4 if rate_mbps == 5.5 else 8
    span = 8 * nsym
    xpad = jnp.pad(x, ((0, 0), (0, span)))
    sym = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st,), (span,)))(
            xpad, jnp.maximum(data_chip0, 0)
        ).reshape(x.shape[0], nsym, 8)
    bookc = jnp.asarray(np.conj(book).T)                 # (8, ncw)
    sc = jnp.einsum("bsc,cw->bsw", sym, bookc)
    iw = jnp.argmax(jnp.abs(sc), axis=2)                 # (B, nsym)
    top = jnp.take_along_axis(sc, iw[:, :, None], 2)[:, :, 0]
    phi = jnp.angle(top)                                 # (B, nsym)
    # reference phase: the last PLCP Barker symbol correlation
    ref_idx = jnp.clip(data_chip0 - 11, 0, c.shape[1] - 1)
    ref = jnp.take_along_axis(c, ref_idx[:, None], 1)[:, 0]
    prev = jnp.concatenate([jnp.angle(ref)[:, None], phi[:, :-1]], axis=1)
    dphi = phi - prev - (jnp.arange(nsym) % 2) * jnp.pi
    qd = jnp.round(dphi / (jnp.pi / 2)).astype(jnp.int32) % 4
    demap = jnp.asarray(np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.uint8))
    d01 = demap[qd]                                      # (B, nsym, 2)
    if rate_mbps == 5.5:
        cw_bits = jnp.stack([iw & 1, (iw >> 1) & 1], axis=2)
    else:
        cw_bits = jnp.stack([(iw >> k) & 1 for k in range(6)], axis=2)
    bits = jnp.concatenate([d01, cw_bits.astype(jnp.uint8)], axis=2)
    return bits.reshape(x.shape[0], nsym * nbps)


# =============================================================================
# Full pipeline
# =============================================================================


@partial(jax.jit, static_argnames=("rate_mbps", "max_psdu"))
def rx_pipeline(x: jnp.ndarray, rate_mbps: float, max_psdu: int = 256):
    """Complete batched 802.11b RX at a configured data rate.

    x: (B, N) complex64 chips at 11 Msps.  Returns dict with psdu
    (B, max_psdu) uint8, ok/fcs_ok/plcp_ok (B,) uint8, length (B,) int32
    bytes, signal (B,) int32, t0 (B,) int32.
    """
    Bsz = x.shape[0]
    corr, t0, c = synchronize(x)
    bits = _dbpsk_bits(corr)                     # 1 Mbps raw bits
    desc = _descramble(bits)
    plcp = _parse_plcp_both(corr, bits, desc)
    found = plcp["found"]
    sig_rate_ok = plcp["signal"] == B.SIGNAL_BYTE[rate_mbps]
    nbits = _data_nbits(rate_mbps, plcp["length_us"], plcp["service"])
    nbytes = jnp.clip(nbits // 8, 0, max_psdu).astype(jnp.int32)

    data_chip0 = t0 + 11 * plcp["data_sym0"]
    max_bits = max_psdu * 8
    if rate_mbps in (1, 2):
        nsym = max_bits if rate_mbps == 1 else max_bits // 2
        raw = _decode_psk(c, data_chip0, nsym, rate_mbps)
    else:
        nbps = 4 if rate_mbps == 5.5 else 8
        raw = _decode_cck(x, c, data_chip0, max_bits // nbps, rate_mbps)
    data = _descramble(raw, plcp["prev7"])
    p2 = jnp.asarray((1 << np.arange(8)).astype(np.int32))
    psdu = jnp.sum(data.reshape(Bsz, max_psdu, 8).astype(jnp.int32)
                   * p2[None, None, :], axis=2).astype(jnp.uint8)

    body_crc = dcrc.crc32_batch(psdu, jnp.maximum(nbytes - 4, 0))
    fidx = jnp.clip(nbytes[:, None] - 4 + jnp.arange(4)[None, :], 0,
                    max_psdu - 1)
    fcs_bytes = jnp.take_along_axis(psdu, fidx, 1).astype(jnp.uint32)
    rx_fcs = (fcs_bytes[:, 0] | (fcs_bytes[:, 1] << 8)
              | (fcs_bytes[:, 2] << 16) | (fcs_bytes[:, 3] << 24))
    fcs_ok = (body_crc == rx_fcs) & (nbytes >= 4)
    plcp_ok = found & plcp["crc_ok"]
    ok = plcp_ok & sig_rate_ok & fcs_ok
    return {"psdu": psdu, "ok": ok.astype(jnp.uint8),
            "fcs_ok": fcs_ok.astype(jnp.uint8),
            "plcp_ok": plcp_ok.astype(jnp.uint8),
            "sig_rate_ok": sig_rate_ok.astype(jnp.uint8),
            "length": nbytes, "signal": plcp["signal"],
            "length_us": plcp["length_us"], "t0": t0,
            "preamble": plcp["preamble"],
            # chip-stream position of the first data chip: a stable
            # frame anchor for cross-window dedup in the live node
            "data_chip0": data_chip0.astype(jnp.int32)}


@partial(jax.jit, static_argnames=("max_psdu",))
def rx_pipeline_auto(x: jnp.ndarray, max_psdu: int = 256):
    """Complete batched 802.11b RX with per-frame runtime rate dispatch:
    a batch mixing all four DSSS rates decodes in ONE jit program.

    The reference demuxes per frame at runtime through TBB11bRxRateSel
    (PHY_11b.hpp:378-463).  The TPU formulation is the same one-hot
    treatment as the 11a/11n auto pipelines: decode the data section
    under ALL four rates (the 1/2 Mbps Barker paths are gathers +
    differential demod, the CCK paths one codebook einsum each — all
    cheap next to the shared synchronize correlation), then select each
    frame's raw bit stream by its parsed SIGNAL byte.  Descramble,
    byte-pack and FCS then run once on the selected stream, so the
    whole batch stays on device with no host round trip — unlike the
    two-phase host dispatcher this replaces in the live node.

    x: (B, N) complex64 chips at 11 Msps.  Returns the rx_pipeline dict
    plus rate_mbps (B,) float32.
    """
    c = df.correlate_stream(x, B.BARKER.astype(np.complex64))
    return auto_tail(x, c, max_psdu)


@partial(jax.jit, static_argnames=("max_psdu",))
def auto_tail(x: jnp.ndarray, c: jnp.ndarray, max_psdu: int = 256):
    """Mixed-rate decode from the precomputed Barker correlation — the
    shared back half of :func:`rx_pipeline_auto`, driven batch-parallel
    by the sharded DSSS pipeline (parallel.shard.rx_pipeline_sharded_11b)
    after its halo-exchanged correlation front."""
    Bsz = x.shape[0]
    corr, t0, c = synchronize_from_corr(x, c)
    bits = _dbpsk_bits(corr)
    desc = _descramble(bits)
    plcp = _parse_plcp_both(corr, bits, desc)
    found = plcp["found"]
    signal = plcp["signal"]

    data_chip0 = t0 + 11 * plcp["data_sym0"]
    max_bits = max_psdu * 8
    rates = (1, 2, 5.5, 11)
    raws, nbits_r = [], []
    for rate in rates:
        if rate in (1, 2):
            nsym = max_bits if rate == 1 else max_bits // 2
            raws.append(_decode_psk(c, data_chip0, nsym, rate))
        else:
            nbps = 4 if rate == 5.5 else 8
            raws.append(_decode_cck(x, c, data_chip0, max_bits // nbps,
                                    rate))
        nbits_r.append(_data_nbits(rate, plcp["length_us"],
                                   plcp["service"]))
    sel = jnp.stack(raws)                          # (4, B, max_bits)
    onehot = jnp.stack([signal == B.SIGNAL_BYTE[r] for r in rates])
    raw = jnp.sum(sel * onehot[:, :, None].astype(jnp.uint8), axis=0)
    known = jnp.any(onehot, axis=0)
    nbits = jnp.sum(jnp.stack(nbits_r) * onehot.astype(jnp.int32), axis=0)
    nbytes = jnp.clip(nbits // 8, 0, max_psdu).astype(jnp.int32)
    mbps = jnp.sum(jnp.asarray([r for r in rates], jnp.float32)[:, None]
                   * onehot.astype(jnp.float32), axis=0)

    data = _descramble(raw, plcp["prev7"])
    p2 = jnp.asarray((1 << np.arange(8)).astype(np.int32))
    psdu = jnp.sum(data.reshape(Bsz, max_psdu, 8).astype(jnp.int32)
                   * p2[None, None, :], axis=2).astype(jnp.uint8)

    body_crc = dcrc.crc32_batch(psdu, jnp.maximum(nbytes - 4, 0))
    fidx = jnp.clip(nbytes[:, None] - 4 + jnp.arange(4)[None, :], 0,
                    max_psdu - 1)
    fcs_bytes = jnp.take_along_axis(psdu, fidx, 1).astype(jnp.uint32)
    rx_fcs = (fcs_bytes[:, 0] | (fcs_bytes[:, 1] << 8)
              | (fcs_bytes[:, 2] << 16) | (fcs_bytes[:, 3] << 24))
    fcs_ok = (body_crc == rx_fcs) & (nbytes >= 4)
    plcp_ok = found & plcp["crc_ok"]
    ok = plcp_ok & known & fcs_ok
    return {"psdu": psdu, "ok": ok.astype(jnp.uint8),
            "fcs_ok": fcs_ok.astype(jnp.uint8),
            "plcp_ok": plcp_ok.astype(jnp.uint8),
            "rate_mbps": mbps, "length": nbytes,
            "signal": signal, "length_us": plcp["length_us"], "t0": t0,
            "preamble": plcp["preamble"],
            "data_chip0": data_chip0.astype(jnp.int32)}


@partial(jax.jit, static_argnames=("max_psdu",))
def rx_plcp(x: jnp.ndarray, max_psdu: int = 256):
    """PLCP-only pass (rate-independent): returns signal/length/crc_ok so a
    host dispatcher can pick the data-rate pipeline — the TBB11bRxRateSel
    two-phase analogue.  Long/short preamble auto-detected."""
    corr, t0, _ = synchronize(x)
    bits = _dbpsk_bits(corr)
    desc = _descramble(bits)
    plcp = _parse_plcp_both(corr, bits, desc)
    return {"signal": plcp["signal"], "length_us": plcp["length_us"],
            "preamble": plcp["preamble"],
            "plcp_ok": (plcp["found"] & plcp["crc_ok"]).astype(jnp.uint8)}


# =============================================================================
# Host-facing single-frame API (mirrors golden/dot11b_np.demodulate)
# =============================================================================


@dataclass
class RxResult:
    ok: bool = False
    reason: str = "no_frame"
    rate_mbps: float = 0.0
    length_us: int = 0
    psdu: bytes = b""
    fcs_ok: bool = False


def demodulate(x, max_psdu: int = 2048) -> RxResult:
    """Decode one frame from a host chip-rate stream, auto-dispatching the
    data rate from the parsed SIGNAL field."""
    from sora_tpu.util.xfer import device_complex

    res = RxResult()
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[None, :]
    # minimum span: the SHORT PLCP (56 sync + 16 SFD + 24 header symbols)
    # plus a little data — a long-only bound would reject short-preamble
    # frames below ~2200 chips
    if x.shape[1] < 11 * (B.SYNC_BITS_SHORT + 16 + 24 + 8):
        return res
    xd = device_complex(x.astype(np.complex64))
    head = jax.device_get(rx_plcp(xd, max_psdu=max_psdu))
    if not bool(head["plcp_ok"][0]):
        res.reason = "plcp_header_fail"
        return res
    sig = int(head["signal"][0])
    if sig not in B.RATE_BY_SIGNAL:
        res.reason = "bad_signal"
        return res
    rate = B.RATE_BY_SIGNAL[sig]
    res.rate_mbps = rate
    res.length_us = int(head["length_us"][0])
    out = jax.device_get(rx_pipeline(xd, rate, max_psdu=max_psdu))
    n = int(out["length"][0])
    res.psdu = bytes(np.asarray(out["psdu"][0][:n], np.uint8))
    res.fcs_ok = bool(out["fcs_ok"][0])
    res.ok = bool(out["ok"][0])
    res.reason = "frame_ok" if res.ok else "crc32_fail"
    return res
