"""K=7 (133,171) Viterbi decoder in JAX — the hot kernel of the 802.11a RX.

Reference design: kernel/bb/Brick11/src/viterbicore.h keeps 64 path
metrics in 4 SSE vub registers, does BranchACS with branch-metric LUTs and
`smin`, stores the survivor bit in the metric LSB, and runs a sliding
traceback every 256 bits with 24+ bits of lookahead, on a dedicated core.

TPU design: the trellis has the classic butterfly structure — the two
predecessors of state ``s`` are ``2*(s%32)`` and ``2*(s%32)+1`` and the
input bit is ``s>>5`` (see sora_tpu.phy.common.BFLY_*).  The ACS step is
therefore a reshape + broadcast-add + min over a (batch, 32, 2, 2) tensor:
pure VPU work with **no gathers**.  Sequential dependence is only over
time, so throughput comes from batching:

* `decode` — exact full-trellis decode, `lax.scan` over time, vectorized
  over an arbitrary batch of frames.
* `decode_blocks` — trellis parallelism: chop the bit-stream into blocks
  with warmup/cooldown overlap, decode all blocks as one big batch, and
  keep each block's middle.  The overlap plays the role of the reference's
  bounded traceback depth (256/lookahead 24): path memory of the K=7 code
  dies off in ~5*K steps, so 64-128 steps of warmup give a decode that is
  bit-identical to the sequential one with overwhelming probability.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sora_tpu.phy import common as C

# (32, 2, 2) [u, pred j, input b] -> +1 where the emitted bit is 1, else -1
_SGN_A = (2.0 * C.BFLY_OUT_A - 1.0).astype(np.float32)
_SGN_B = (2.0 * C.BFLY_OUT_B - 1.0).astype(np.float32)
# per-(j, b) sign rows, shape (1, 32) each, kept as numpy: they fold into
# the compiled program as constants
_SGN = {(j, b): (_SGN_A[None, :, j, b], _SGN_B[None, :, j, b])
        for j in (0, 1) for b in (0, 1)}


def _acs_step(pm: jnp.ndarray, soft_t: jnp.ndarray):
    """One add-compare-select step.

    pm: (B, 64) path metrics; soft_t: (B, 2) A/B soft values
    (positive => coded bit 1).  Returns (pm_next, decisions (B, 64) bool,
    True = the odd predecessor won).

    Layout note: everything stays (B, 32/64) — lanes hold states, strided
    slices split even/odd predecessors.  The obvious (B, 32, 2, 2)
    formulation with argmin over a size-2 axis takes Mosaic ~300 s to
    compile on TPU; this form compiles in ~2 s and runs identically.
    """
    sa = soft_t[:, :1]
    sb = soft_t[:, 1:]
    pmA = pm[:, 0::2]                                   # pred 2u
    pmB = pm[:, 1::2]                                   # pred 2u+1
    outs = []
    decs = []
    for b in (0, 1):
        a0, b0 = _SGN[(0, b)]
        a1, b1 = _SGN[(1, b)]
        candA = pmA - (a0 * sa + b0 * sb)
        candB = pmB - (a1 * sa + b1 * sb)
        outs.append(jnp.minimum(candA, candB))
        decs.append(candA > candB)
    pm_next = jnp.concatenate(outs, axis=1)             # states u+32b
    pm_next = pm_next - pm_next[:, :1]                  # cheap renorm
    dec = jnp.concatenate(decs, axis=1)
    return pm_next, dec


@partial(jax.jit, static_argnames=("terminated",))
def decode(soft_ab: jnp.ndarray, terminated: bool = True) -> jnp.ndarray:
    """Exact Viterbi decode.

    soft_ab: (..., T, 2) float soft metrics (positive => coded bit 1;
    0 = erasure).  Returns (..., T) uint8 decoded input bits.
    ``terminated=True`` assumes the encoder ends in state 0 (the 802.11
    tail bits); otherwise the best end state is used.
    """
    lead = soft_ab.shape[:-2]
    T = soft_ab.shape[-2]
    s = soft_ab.reshape(-1, T, 2).astype(jnp.float32)
    B = s.shape[0]

    pm0 = jnp.full((B, 64), 1e9, dtype=jnp.float32).at[:, 0].set(0.0)

    def fwd(pm, soft_t):
        pm_next, dec = _acs_step(pm, soft_t)
        return pm_next, dec

    pm_final, decs = jax.lax.scan(fwd, pm0, jnp.swapaxes(s, 0, 1))
    # decs: (T, B, 64)
    if terminated:
        s_end = jnp.zeros((B,), dtype=jnp.int32)
    else:
        s_end = jnp.argmin(pm_final, axis=-1).astype(jnp.int32)

    def bwd(state, dec_t):
        bit = (state >> 5).astype(jnp.uint8)
        d = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0]
        prev = 2 * (state & 31) + d.astype(jnp.int32)
        return prev, bit

    _, bits_rev = jax.lax.scan(bwd, s_end, decs, reverse=True)
    bits = jnp.swapaxes(bits_rev, 0, 1)                  # (B, T)
    return bits.reshape(*lead, T)


@partial(jax.jit, static_argnames=("block", "overlap", "terminated"))
def decode_blocks(soft_ab: jnp.ndarray, block: int = 512, overlap: int = 96,
                  terminated: bool = True) -> jnp.ndarray:
    """Trellis-parallel decode: batch over overlapping blocks.

    Equivalent to :func:`decode` except survivor paths are only tracked
    ``overlap`` steps across block boundaries (>= 96 ≈ 14*K makes
    disagreement with the exact decode vanishingly rare at useful SNR —
    the same argument behind the reference's traceback depth 256 with
    lookahead 24, viterbi.hpp:186-213).

    soft_ab: (..., T, 2); T is padded up to a block multiple internally.
    """
    lead = soft_ab.shape[:-2]
    T = soft_ab.shape[-2]
    s = soft_ab.reshape(-1, T, 2).astype(jnp.float32)
    B = s.shape[0]
    nblk = -(-T // block)
    Tpad = nblk * block
    # pad tail with erasures; pad overlap margins with erasures too
    s = jnp.pad(s, ((0, 0), (overlap, Tpad - T + overlap), (0, 0)))
    # windows: block i covers [i*block - overlap, (i+1)*block + overlap)
    # in padded coords: [i*block, i*block + block + 2*overlap)
    win = block + 2 * overlap
    idx = (jnp.arange(nblk) * block)[:, None] + jnp.arange(win)[None, :]
    wins = s[:, idx, :]                                  # (B, nblk, win, 2)
    wins = wins.reshape(B * nblk, win, 2)

    pm0 = jnp.zeros((B * nblk, 64), dtype=jnp.float32)
    # block 0 starts in state 0 like the sequential decode
    known_start = jnp.full((64,), 1e9, dtype=jnp.float32).at[0].set(0.0)
    first = (jnp.arange(B * nblk) % nblk) == 0
    pm0 = jnp.where(first[:, None], known_start[None, :], pm0)

    pm_final, decs = jax.lax.scan(
        lambda pm, st: _acs_step(pm, st), pm0, jnp.swapaxes(wins, 0, 1))

    if terminated:
        # only the last block ends in a known state
        last = (jnp.arange(B * nblk) % nblk) == (nblk - 1)
        # the terminal state of the *unpadded* stream is 0, but the last
        # block may carry tail erasure padding after it: with zero-cost
        # erasures state 0 stays optimal among continuations of state 0,
        # so argmin restricted by `last` to 0 is safe.
        s_end = jnp.where(last, 0, jnp.argmin(pm_final, axis=-1))
        s_end = s_end.astype(jnp.int32)
    else:
        s_end = jnp.argmin(pm_final, axis=-1).astype(jnp.int32)

    def bwd(state, dec_t):
        bit = (state >> 5).astype(jnp.uint8)
        d = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0]
        prev = 2 * (state & 31) + d.astype(jnp.int32)
        return prev, bit

    _, bits_rev = jax.lax.scan(bwd, s_end, decs, reverse=True)
    bits = jnp.swapaxes(bits_rev, 0, 1)                  # (B*nblk, win)
    bits = bits.reshape(B, nblk, win)[:, :, overlap: overlap + block]
    bits = bits.reshape(B, Tpad)[:, :T]
    return bits.reshape(*lead, T)


def decode_auto(soft_ab: jnp.ndarray, terminated: bool = True,
                blockwise: bool = True) -> jnp.ndarray:
    """Backend dispatcher: the Pallas kernel on TPU, the XLA scan decoder
    elsewhere.  Dispatch happens at trace time (both paths are jittable).

    With ``blockwise`` the TPU path uses overlapping 512-step windows
    (throughput mode); otherwise a single exact window spanning T.
    """
    backend = jax.default_backend()
    if backend == "tpu":
        from sora_tpu.ops import viterbi_pallas as vp
        T = soft_ab.shape[-2]
        if blockwise and T > 1024:
            # long streams amortize the overlap better with 1024-bit
            # blocks (89% vs 80% useful steps; measured ~+15% on v5e)
            if T >= 4096:
                return vp.decode_blocks(soft_ab, block=1024, overlap=64,
                                        bt=768, terminated=terminated)
            return vp.decode_blocks(soft_ab, block=512, overlap=64,
                                    terminated=terminated)
        block = -(-T // 8) * 8
        return vp.decode_blocks(soft_ab, block=block, overlap=0,
                                terminated=terminated)
    if blockwise and soft_ab.shape[-2] > 1024:
        return decode_blocks(soft_ab, block=512, overlap=96,
                             terminated=terminated)
    return decode(soft_ab, terminated=terminated)


def encode(bits: jnp.ndarray) -> jnp.ndarray:
    """Rate-1/2 convolutional encode (batched): (..., T) -> (..., 2T).

    TPU formulation: the two output streams are parities of sliding 7-bit
    windows, i.e. mod-2 correlations of the input with the generator taps —
    computed with XOR-reductions over static shifts, no scan.
    """
    lead = bits.shape[:-1]
    T = bits.shape[-1]
    b = bits.reshape(-1, T).astype(jnp.uint8)
    padded = jnp.pad(b, ((0, 0), (6, 0)))
    # window w[t] = [x_t, x_{t-1}, ..., x_{t-6}]; taps g MSB = newest bit
    outa = jnp.zeros_like(b)
    outb = jnp.zeros_like(b)
    for i in range(7):
        tap = padded[:, 6 - i: 6 - i + T]
        if (C.G0 >> (6 - i)) & 1:
            outa = outa ^ tap
        if (C.G1 >> (6 - i)) & 1:
            outb = outb ^ tap
    out = jnp.stack([outa, outb], axis=-1).reshape(-1, 2 * T)
    return out.reshape(*lead, 2 * T)
