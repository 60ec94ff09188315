"""802.11b DSSS transmitter — JAX, batched, jit-compiled.

Reference graph (kernel/bb/demod11/fb11bmod_config.hpp; bricks
TBB11bSrc -> TSc741 -> {TBB11bDBPSKSpread | TBB11bDQPSKSpread |
TCCK5Encode | TCCK11Encode}, PHY_11b.hpp / barkerspread.hpp / cck.hpp):
a byte-at-a-time LUT scrambler feeding per-symbol spreaders.

TPU redesign — every stage is batch-parallel, no per-bit loop:

* The self-synchronizing scrambler (1/(1+z^-4+z^-7) over GF(2),
  scramble.hpp TSc741) is linear, and its impulse response is the
  127-periodic m-sequence of x^7+x^4+1.  Scrambling therefore equals an
  XOR-convolution with that periodic sequence: a stride-127 prefix-XOR
  (cumsum mod 2) followed by one 127-tap correlation (an MXU matmul).
* Differential phase chains (DBPSK/DQPSK/CCK phi1) are cumulative sums of
  per-symbol phase increments — `jnp.cumsum`, an associative scan.
* Barker spreading is an outer product; CCK encoding is a codebook gather
  rotated by the phi1 phasor.

The PLCP preamble + header depend only on (rate, psdu_len), both static,
so they are baked as program constants via the numpy golden model
(golden/dot11b_np.py) — matching the reference, which also precomputes
its preamble LUTs (preamble11a.c / _b_* tables).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.golden import dot11b_np as G
from sora_tpu.phy import dot11b_common as B

# =============================================================================
# Scrambler as m-sequence XOR-convolution
# =============================================================================


@lru_cache(maxsize=None)
def _impulse_response_period() -> np.ndarray:
    """127-periodic impulse response hp of the TX scrambler 1/(1+z^-4+z^-7).

    h_0 = 1 (feed-through); h_i = h_{i-4} ^ h_{i-7}.  x^7+x^4+1 is
    primitive, so h is exactly 127-periodic from index 0 (asserted)."""
    n = 4 * 127
    h = np.zeros(n, np.uint8)
    h[0] = 1
    for i in range(1, n):
        a = h[i - 4] if i >= 4 else 0
        b = h[i - 7] if i >= 7 else 0
        h[i] = a ^ b
    assert np.array_equal(h[:127], h[127:254]), "h must be 127-periodic"
    return h[:127]


def scramble_tx(bits: jnp.ndarray, seed: int) -> jnp.ndarray:
    """Batched feedback scrambler: (B, n) uint8 -> (B, n) uint8.

    s = (h (*) b) xor c  where (*) is GF(2) convolution with the periodic
    impulse response and c is the (static-seed) zero-input response.
    """
    Bsz, n = bits.shape
    hp = _impulse_response_period().astype(np.float32)       # (127,)
    # G_t = b_t ^ G_{t-127}: stride-127 prefix XOR via cumsum over rows
    ncols = -(-n // 127)
    bp = jnp.pad(bits.astype(jnp.int32), ((0, 0), (0, ncols * 127 - n)))
    g = jnp.cumsum(bp.reshape(Bsz, ncols, 127), axis=1) % 2   # (B,ncols,127)
    g = g.reshape(Bsz, ncols * 127)[:, :n].astype(jnp.float32)
    # s_i = XOR_p hp[p] & G_{i-p}: 127-tap correlation, one matmul
    gp = jnp.pad(g, ((0, 0), (126, 0)))
    idx = jnp.arange(n)[:, None] + jnp.arange(127)[None, :]
    w = gp[:, idx]                                           # (B, n, 127)
    acc = jnp.matmul(w, jnp.asarray(hp[::-1].copy()),
                     precision=jax.lax.Precision.HIGHEST)
    s = (acc.astype(jnp.int32) % 2).astype(jnp.uint8)
    c = G._scramble_continue(_seed_bits(seed), np.zeros(n, np.uint8))
    return s ^ jnp.asarray(c.astype(np.uint8))


def _seed_bits(seed: int) -> np.ndarray:
    """7 'previously transmitted' bits whose register image equals seed
    (reg[i] = bit transmitted i+1 steps ago)."""
    return np.array([(seed >> i) & 1 for i in range(7)][::-1], np.uint8)


# =============================================================================
# Static PLCP (preamble + header) waveform
# =============================================================================


@lru_cache(maxsize=None)
def _plcp_const(rate_mbps: float, psdu_len: int, preamble: str = "long"):
    """(plcp chips complex64, phi0 float, data scrambler seed int).

    Long-preamble PLCP: 128 sync + 16 SFD + 48 header bits, scrambled
    from seed 0x6C, DBPSK/Barker at 1 Mbps (Clause 18.2.3; reference
    PHY_11b.hpp TBB11bSrc + fb11bmod_config).  Short: 56 zero-sync +
    reversed SFD at 1 Mbps, header at 2 Mbps DQPSK from seed 0x1B
    (Clause 18.2.5; the preamble_type contract of PHY_11b.hpp:26).
    """
    if preamble == "short":
        pre = np.concatenate([
            np.zeros(B.SYNC_BITS_SHORT, np.uint8),
            np.array([(B.SFD_SHORT >> i) & 1 for i in range(16)],
                     np.uint8),
        ])
        hdr = G.plcp_header_bits(rate_mbps, psdu_len)
        plcp = B.scramble_11b(np.concatenate([pre, hdr]),
                              seed=B.SCRAMBLER_SEED_SHORT)
        ph_pre = G._dbpsk_phases(plcp[:len(pre)])
        ph_hdr = G._dqpsk_phases(plcp[len(pre):].reshape(-1, 2),
                                 ph_pre[-1])
        phases = np.concatenate([ph_pre, ph_hdr])
    else:
        pre = np.concatenate([
            np.ones(B.SYNC_BITS, np.uint8),
            np.array([(B.SFD_LONG >> i) & 1 for i in range(16)],
                     np.uint8),
        ])
        hdr = G.plcp_header_bits(rate_mbps, psdu_len)
        plcp = B.scramble_11b(np.concatenate([pre, hdr]))
        phases = G._dbpsk_phases(plcp)
    chips = (np.exp(1j * phases[:, None]) * B.BARKER[None, :]).reshape(-1)
    seed = 0
    for i in range(7):
        seed |= int(plcp[-1 - i]) << i
    return chips.astype(np.complex64), float(phases[-1]), seed


# =============================================================================
# Data-section modulators (batched)
# =============================================================================

_DQPSK_TBL = np.array([0.0, np.pi / 2, 3 * np.pi / 2, np.pi], np.float32)
# ^ indexed by d0*2 + d1 (DQPSK_PHASE with (1,0)->3pi/2, (1,1)->pi)
_CCK_TBL = np.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2], np.float32)
# ^ indexed by d0*2 + d1 (CCK_DIBIT_PHASE)


def _bits_device(psdu: jnp.ndarray) -> jnp.ndarray:
    """(B, L) uint8 -> (B, 8L) bits, LSB first."""
    Bsz, L = psdu.shape
    sh = (psdu[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return sh.reshape(Bsz, L * 8).astype(jnp.uint8)


def _modulate_data(s: jnp.ndarray, rate_mbps: float, phi0: float
                   ) -> jnp.ndarray:
    """Scrambled data bits (B, n) -> chips (B, nchips) complex64."""
    Bsz, n = s.shape
    if rate_mbps == 1:
        dphi = jnp.pi * s.astype(jnp.float32)
        phi = phi0 + jnp.cumsum(dphi, axis=1)
        chips = jnp.exp(1j * phi)[:, :, None] * \
            jnp.asarray(B.BARKER.astype(np.complex64))[None, None, :]
        return chips.reshape(Bsz, -1)
    if rate_mbps == 2:
        di = s.reshape(Bsz, -1, 2).astype(jnp.int32)
        dphi = jnp.asarray(_DQPSK_TBL)[di[:, :, 0] * 2 + di[:, :, 1]]
        phi = phi0 + jnp.cumsum(dphi, axis=1)
        chips = jnp.exp(1j * phi)[:, :, None] * \
            jnp.asarray(B.BARKER.astype(np.complex64))[None, None, :]
        return chips.reshape(Bsz, -1)
    nbps = 4 if rate_mbps == 5.5 else 8
    g = s.reshape(Bsz, -1, nbps).astype(jnp.int32)
    nsym = g.shape[1]
    dphi = jnp.asarray(_DQPSK_TBL)[g[:, :, 0] * 2 + g[:, :, 1]]
    dphi = dphi + (jnp.arange(nsym) % 2) * jnp.pi     # extra pi, odd symbols
    phi1 = phi0 + jnp.cumsum(dphi, axis=1)            # (B, nsym)
    if rate_mbps == 5.5:
        book = B.cck55_codebook().astype(np.complex64)      # (4, 8)
        iw = g[:, :, 2] + 2 * g[:, :, 3]
    else:
        book = B.cck11_codebook().astype(np.complex64)      # (64, 8)
        iw = (g[:, :, 2] + 2 * g[:, :, 3] + 4 * g[:, :, 4] +
              8 * g[:, :, 5] + 16 * g[:, :, 6] + 32 * g[:, :, 7])
    cw = jnp.asarray(book)[iw]                        # (B, nsym, 8)
    chips = cw * jnp.exp(1j * phi1)[:, :, None]
    return chips.reshape(Bsz, -1)


# =============================================================================
# Full TX
# =============================================================================


def waveform_len(rate_mbps: float, psdu_len: int,
                 preamble: str = "long") -> int:
    nbits = psdu_len * 8
    if preamble == "short":
        plcp = (B.SYNC_BITS_SHORT + 16 + 24) * 11
    else:
        plcp = (B.SYNC_BITS + 16 + 48) * 11
    if rate_mbps == 1:
        return plcp + nbits * 11
    if rate_mbps == 2:
        return plcp + (nbits // 2) * 11
    nbps = 4 if rate_mbps == 5.5 else 8
    return plcp + (nbits // nbps) * 8


@partial(jax.jit, static_argnames=("rate_mbps", "psdu_len", "preamble"))
def modulate(psdu: jnp.ndarray, rate_mbps: float, psdu_len: int,
             preamble: str = "long") -> jnp.ndarray:
    """Batched 802.11b modulator: (B, psdu_len) uint8 -> (B, nchips)
    complex64 at 11 Msps chip rate, long or short preamble.

    Matches golden/dot11b_np.modulate bit-exactly (tested)."""
    plcp, phi0, seed = _plcp_const(rate_mbps, psdu_len, preamble)
    bits = _bits_device(psdu)
    s = scramble_tx(bits, seed)
    data = _modulate_data(s, rate_mbps, phi0)
    Bsz = psdu.shape[0]
    pre = jnp.broadcast_to(jnp.asarray(plcp)[None, :], (Bsz, len(plcp)))
    return jnp.concatenate([pre, data], axis=1)
