"""802.11a OFDM transmitter — JAX, batched, jit-compiled.

Mirror of the reference mod graph (kernel/bb/demod11/fb11amod_config.hpp:
75-112: TBB11aSrc -> T11aSc -> TConvEncode -> T11aInterleave -> TMap11a ->
T11aAddPilot -> TIFFTx -> ...) as one fused tensor program: scrambling is
an XOR with a gathered periodic sequence, encoding is 7 static-shift XORs,
interleaving a static scatter, mapping a table lookup, and the IFFT a DFT
matmul on the MXU.  A whole batch of frames modulates in one jit call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.dsp import fft as dfft
from sora_tpu.dsp import mapping as dmap
from sora_tpu.dsp import scramble as dscr
from sora_tpu.dsp import viterbi as dvit
from sora_tpu.phy import common as C

_PREAMBLE = np.asarray(C.PREAMBLE_TIME, dtype=np.complex64)


def _puncture_gather(rate: C.RateParam, ncoded: int) -> np.ndarray:
    pa, pb = C.PUNCTURE[(rate.num, rate.den)]
    keep = np.stack([pa, pb], -1).reshape(-1)
    reps = -(-ncoded // len(keep))
    return np.flatnonzero(np.tile(keep, reps)[:ncoded])


def num_symbols(rate_mbps: int, psdu_len: int) -> int:
    r = C.RATES[rate_mbps]
    return -(-(16 + 8 * psdu_len + 6) // r.ndbps)


def waveform_len(rate_mbps: int, psdu_len: int) -> int:
    """Samples @20 Msps: 320 preamble + 80 SIGNAL + 80 per data symbol."""
    return 320 + 80 * (1 + num_symbols(rate_mbps, psdu_len))


@partial(jax.jit, static_argnames=("rate_mbps", "psdu_len"))
def modulate(psdu: jnp.ndarray, rate_mbps: int, psdu_len: int,
             scrambler_seed: int = 0x5D) -> jnp.ndarray:
    """(B, psdu_len) uint8 -> (B, nsamp) complex64 @ 20 Msps, unit power.

    psdu_len is static (one compiled program per frame size class; pad
    frames up to a class size and set SIGNAL length accordingly on the
    batch host side if classing is desired).
    """
    rate = C.RATES[rate_mbps]
    B = psdu.shape[0]
    nsym = num_symbols(rate_mbps, psdu_len)
    nbits = nsym * rate.ndbps

    # --- SIGNAL symbol ------------------------------------------------------
    sig = np.zeros(24, dtype=np.uint8)
    for i in range(4):
        sig[i] = (rate.rate_bits >> (3 - i)) & 1
    for i in range(12):
        sig[5 + i] = (psdu_len >> i) & 1
    sig[17] = sig[:17].sum() & 1
    sig_coded = np.zeros(48, np.uint8)
    # rate-1/2 encode of 24 static bits — do it in numpy at trace time
    s = 0
    for i, bit in enumerate(sig):
        sig_coded[2 * i] = C.CONV_OUT_A[s, bit]
        sig_coded[2 * i + 1] = C.CONV_OUT_B[s, bit]
        s = C.CONV_NEXT[s, bit]
    sig_inter = np.zeros(48, np.uint8)
    sig_inter[C.interleaver_permutation(48, 1)] = sig_coded
    sig_freq = np.zeros(64, np.complex64)
    sig_freq[C.DATA_BINS] = np.asarray(
        C.map_bits(sig_inter, "bpsk"), np.complex64)
    sig_freq[C.PILOT_BINS] = (C.PILOT_VAL * C.PILOT_POLARITY[0]).astype(
        np.complex64)

    # --- DATA bits ----------------------------------------------------------
    bits = jnp.zeros((B, nbits), dtype=jnp.uint8)
    pb = jnp.unpackbits(psdu.astype(jnp.uint8), axis=-1, bitorder="little")
    bits = bits.at[:, 16: 16 + 8 * psdu_len].set(pb)
    scr = dscr.sequence(nbits, scrambler_seed)[None, :]
    scrambled = bits ^ scr
    tail0 = 16 + 8 * psdu_len
    scrambled = scrambled.at[:, tail0: tail0 + 6].set(0)
    coded = dvit.encode(scrambled)                    # (B, 2*nbits)
    tx = coded[:, jnp.asarray(_puncture_gather(rate, 2 * nbits))]
    # interleave per symbol (static scatter)
    perm = C.interleaver_permutation(rate.ncbps, rate.nbpsc)
    blocks = tx.reshape(B, nsym, rate.ncbps)
    inter = jnp.zeros_like(blocks)
    inter = inter.at[:, :, jnp.asarray(perm)].set(blocks)
    # map to constellation
    data = dmap.map_bits(inter.reshape(B, -1), rate.modulation)
    data = data.reshape(B, nsym, 48)

    # --- OFDM symbols -------------------------------------------------------
    X = jnp.zeros((B, nsym, 64), dtype=jnp.complex64)
    X = X.at[:, :, jnp.asarray(C.DATA_BINS)].set(data)
    pol = jnp.asarray(C.PILOT_POLARITY, dtype=jnp.float32)[
        (1 + jnp.arange(nsym)) % 127]
    pilots = (jnp.asarray(C.PILOT_VAL, dtype=jnp.float32)[None, :]
              * pol[:, None]).astype(jnp.complex64)
    X = X.at[:, :, jnp.asarray(C.PILOT_BINS)].set(
        jnp.broadcast_to(pilots[None], (B, nsym, 4)))
    allX = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(sig_freq)[None, None, :],
                          (B, 1, 64)), X], axis=1)
    t = dfft.ifft64(allX) * np.float32(64.0 / np.sqrt(52.0))
    syms = jnp.concatenate([t[:, :, -16:], t], axis=-1)   # add GI
    body = syms.reshape(B, -1)
    pre = jnp.broadcast_to(jnp.asarray(_PREAMBLE)[None, :], (B, 320))
    return jnp.concatenate([pre, body], axis=-1)
