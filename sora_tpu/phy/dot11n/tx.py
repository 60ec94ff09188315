"""802.11n HT 2x2 transmitter — JAX, batched, jit-compiled.

Mirror of the reference 11n mod graph (fb11nmod_config.hpp; bricks
TBB11nSrc -> scramble -> encode -> TStreamParser -> T11nInterleave*_S0/S1
-> TSigMap11n/T11nAddPilot -> TCSD -> IFFT, preambles LSrc/HTSrc,
preamble11n.hpp) as one fused tensor program per batch: the stream parser
and the per-stream interleavers are static gathers/scatters, the cyclic
shift is a static frequency-domain phasor, and both spatial streams IFFT
together on the MXU.

The legacy + HT preamble (L-STF/L-LTF/L-SIG/HT-SIG/HT-STF/HT-LTFs)
depends only on (mcs, psdu_len), so it is baked as a program constant via
the numpy golden model — like the reference's preamble tables
(_b_htltf.h/_b_htstf.h/_b_htsig.h).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.dsp import fft as dfft
from sora_tpu.dsp import mapping as dmap
from sora_tpu.dsp import viterbi as dvit
from sora_tpu.phy import common as C
from sora_tpu.phy import dot11n_common as N


def num_symbols(mcs: int, psdu_len: int) -> int:
    return -(-(16 + 8 * psdu_len + 6) // N.mcs_param(mcs).ndbps)


def waveform_len(mcs: int, psdu_len: int, short_gi: bool = False) -> int:
    """Samples @20 Msps: preamble(+SIGs) + (64+gi) per data symbol (720
    preamble for single-stream MCS 0-7 — one HT-LTF; 800 for 2-stream
    MCS 8-15; gi = 8 with ``short_gi``)."""
    pre = 720 if mcs in N.MCS1 else 800
    return pre + (72 if short_gi else 80) * num_symbols(mcs, psdu_len)


@lru_cache(maxsize=None)
def _preamble_const(mcs: int, psdu_len: int,
                    short_gi: bool = False) -> np.ndarray:
    """(2, 800) complex64: everything before the first data symbol."""
    from sora_tpu.golden import dot11n_np as G

    nsym = num_symbols(mcs, psdu_len)
    lsig = G._lsig_bits(mcs, psdu_len, nsym)
    htsig = N.htsig_bits(mcs, psdu_len, short_gi=short_gi)
    chains = []
    for ant in range(2):
        parts = [G._legacy_preamble(ant)]
        parts.append(G._legacy_symbol(
            G._legacy_data_freq(G._encode_legacy_symbolbits(lsig), 0), ant))
        parts.append(G._legacy_symbol(G._legacy_data_freq(
            G._encode_legacy_symbolbits(htsig[:24]), 1, qbpsk=True), ant))
        parts.append(G._legacy_symbol(G._legacy_data_freq(
            G._encode_legacy_symbolbits(htsig[24:]), 2, qbpsk=True), ant))
        fstf = np.zeros(len(N.HT_SC_IDX), np.complex128)
        fstf[(C.SC_IDX + 28)] = C.STS_FREQ
        parts.append(G._ht_symbol(fstf, ant))
        for n in range(2):
            parts.append(G._ht_symbol(N.P2[ant, n] * N.HTLTF_FREQ, ant))
        chains.append(np.concatenate(parts))
    return np.stack(chains).astype(np.complex64)


def _puncture_gather(m: N.McsParam, ncoded: int) -> np.ndarray:
    pa, pb = N.puncture_pattern(m.num, m.den)
    keep = np.stack([pa, pb], -1).reshape(-1)
    reps = -(-ncoded // len(keep))
    return np.flatnonzero(np.tile(keep, reps)[:ncoded])


@lru_cache(maxsize=None)
def _pilot_table(nsym: int) -> np.ndarray:
    """(nsym, 2, 4) float32 pilot values per data symbol and stream."""
    k = np.arange(nsym)
    pol = C.PILOT_POLARITY[(3 + k) % 127]                    # (nsym,)
    psi = N.PSI2[:, ((np.arange(4)[None, :] + k[:, None]) % 4)]
    # psi: (2, nsym, 4) -> (nsym, 2, 4)
    return (np.transpose(psi, (1, 0, 2))
            * pol[:, None, None]).astype(np.float32)


@lru_cache(maxsize=None)
def _csd_phasor() -> np.ndarray:
    """(2, 64) frequency-domain HT cyclic-shift phasor per stream."""
    f = np.ones((2, 64), np.complex64)
    for i in range(2):
        f[i, N.HT_OCC_BINS] = np.exp(
            -2j * np.pi * N.HT_SC_IDX * N.CSD_HT[i] / N.NFFT)
    return f


@lru_cache(maxsize=None)
def _preamble_const_1ss(mcs: int, psdu_len: int,
                        short_gi: bool = False) -> np.ndarray:
    """(720,) complex64 single-chain preamble (golden helper)."""
    from sora_tpu.golden import dot11n_np as G

    return G._preamble_1ss(mcs, psdu_len, num_symbols(mcs, psdu_len),
                           short_gi).astype(np.complex64)


@lru_cache(maxsize=None)
def _pilot_table_1ss(nsym: int) -> np.ndarray:
    """(nsym, 4) float32 pilot values per data symbol, Nsts = 1
    (PSI1 rotation x polarity, eq 20-59)."""
    k = np.arange(nsym)
    return (N.PSI1[(np.arange(4)[None, :] + k[:, None]) % 4]
            * C.PILOT_POLARITY[(3 + k) % 127][:, None]).astype(np.float32)


def _modulate_1ss(psdu: jnp.ndarray, mcs: int, psdu_len: int,
                  scrambler_seed: int,
                  short_gi: bool = False) -> jnp.ndarray:
    """Single-spatial-stream HT TX (MCS 0-7): (B, L) -> (B, 1, nsamp)."""
    m = N.MCS1[mcs]
    B = psdu.shape[0]
    nsym = num_symbols(mcs, psdu_len)
    nbits = nsym * m.ndbps

    bits = jnp.zeros((B, nbits), dtype=jnp.uint8)
    pb = jnp.unpackbits(psdu.astype(jnp.uint8), axis=-1, bitorder="little")
    bits = bits.at[:, 16: 16 + 8 * psdu_len].set(pb)
    scr = C.scrambler_sequence(nbits, scrambler_seed)[None, :]
    scrambled = bits ^ jnp.asarray(scr)
    tail0 = 16 + 8 * psdu_len
    scrambled = scrambled.at[:, tail0: tail0 + 6].set(0)
    coded = dvit.encode(scrambled)
    tx = coded[:, jnp.asarray(_puncture_gather(m, 2 * nbits))]
    blocks = tx.reshape(B, nsym, m.ncbpss)
    perm = N.ht_interleaver_permutation(m.nbpsc, 0)
    inter = jnp.zeros_like(blocks)
    inter = inter.at[:, :, jnp.asarray(perm)].set(blocks)
    data = dmap.map_bits(inter.reshape(B, -1), m.modulation)
    X = jnp.zeros((B, nsym, 64), dtype=jnp.complex64)
    X = X.at[:, :, jnp.asarray(N.HT_DATA_BINS)].set(
        data.reshape(B, nsym, N.NSD))
    pil = jnp.asarray(_pilot_table_1ss(nsym)).astype(jnp.complex64)
    X = X.at[:, :, jnp.asarray(N.HT_PILOT_BINS)].set(
        jnp.broadcast_to(pil[None], (B, nsym, 4)))
    gi = 8 if short_gi else 16
    t = dfft.ifft64(X) * np.float32(64.0 / np.sqrt(56.0))
    syms = jnp.concatenate([t[..., -gi:], t], axis=-1)       # GI
    body = syms.reshape(B, 1, nsym * (64 + gi))
    pre = jnp.broadcast_to(
        jnp.asarray(_preamble_const_1ss(mcs, psdu_len, short_gi)
                    )[None, None, :], (B, 1, 720))
    return jnp.concatenate([pre, body], axis=-1)


@partial(jax.jit, static_argnames=("mcs", "psdu_len", "short_gi"))
def modulate(psdu: jnp.ndarray, mcs: int, psdu_len: int,
             scrambler_seed: int = 0x5D,
             short_gi: bool = False) -> jnp.ndarray:
    """(B, psdu_len) uint8 -> (B, nss_tx, nsamp) complex64: one 20 Msps
    waveform per TX chain ((B, 2, n) for MCS 8-15, (B, 1, n) for the
    single-stream MCS 0-7).  ``short_gi`` = 400 ns data-symbol guard."""
    if mcs in N.MCS1:
        return _modulate_1ss(psdu, mcs, psdu_len, scrambler_seed,
                             short_gi)
    m = N.MCS[mcs]
    B = psdu.shape[0]
    nsym = num_symbols(mcs, psdu_len)
    nbits = nsym * m.ndbps
    ncbps = 2 * m.ncbpss

    bits = jnp.zeros((B, nbits), dtype=jnp.uint8)
    pb = jnp.unpackbits(psdu.astype(jnp.uint8), axis=-1, bitorder="little")
    bits = bits.at[:, 16: 16 + 8 * psdu_len].set(pb)
    scr = C.scrambler_sequence(nbits, scrambler_seed)[None, :]
    scrambled = bits ^ jnp.asarray(scr)
    tail0 = 16 + 8 * psdu_len
    scrambled = scrambled.at[:, tail0: tail0 + 6].set(0)
    coded = dvit.encode(scrambled)
    tx = coded[:, jnp.asarray(_puncture_gather(m, 2 * nbits))]
    blocks = tx.reshape(B, nsym, ncbps)

    sp = N.stream_parse_indices(ncbps, m.nbpsc)              # (2, ncbpss)
    X = jnp.zeros((B, nsym, 2, 64), dtype=jnp.complex64)
    for i in range(2):
        sbits = blocks[:, :, jnp.asarray(sp[i])]             # (B,nsym,ncbpss)
        perm = N.ht_interleaver_permutation(m.nbpsc, i)
        inter = jnp.zeros_like(sbits)
        inter = inter.at[:, :, jnp.asarray(perm)].set(sbits)
        data = dmap.map_bits(inter.reshape(B, -1), m.modulation)
        X = X.at[:, :, i, jnp.asarray(N.HT_DATA_BINS)].set(
            data.reshape(B, nsym, N.NSD))
    pil = jnp.asarray(_pilot_table(nsym)).astype(jnp.complex64)
    X = X.at[:, :, :, jnp.asarray(N.HT_PILOT_BINS)].set(
        jnp.broadcast_to(pil[None], (B, nsym, 2, 4)))
    X = X * jnp.asarray(_csd_phasor())[None, None, :, :]
    gi = 8 if short_gi else 16
    t = dfft.ifft64(X) * np.float32(64.0 / np.sqrt(56.0) / np.sqrt(2.0))
    syms = jnp.concatenate([t[..., -gi:], t], axis=-1)       # GI
    body = jnp.swapaxes(syms, 1, 2).reshape(B, 2, nsym * (64 + gi))
    pre = jnp.broadcast_to(
        jnp.asarray(_preamble_const(mcs, psdu_len, short_gi))[None],
        (B, 2, 800))
    return jnp.concatenate([pre, body], axis=-1)
