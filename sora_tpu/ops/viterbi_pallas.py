"""Pallas TPU kernel: block-parallel K=7 Viterbi decode (radix-2 trellis).

This is the speed-of-light path for the RX hot loop, replacing the
XLA-scan decoder in sora_tpu.dsp.viterbi (which spends multiple
microseconds of loop overhead per trellis step).  Design:

* The coded stream is pre-framed into overlapping windows outside the
  kernel (same scheme as dsp.viterbi.decode_blocks: `overlap` warmup
  steps on each side, keep the middle `block` bits).
* Layout inside the kernel: **states on sublanes, rows on lanes** —
  path metrics are a (64, Bt) f32 tile, so every lane is a decode window
  and the ACS runs on full VPU tiles.
* **Radix-2 trellis collapsing**: two input bits per ACS iteration.  The
  64-state K=7 trellis is sequential over time, so the per-iteration
  *latency* (not FLOPs) bounds throughput; fusing two trellis steps
  halves the iteration count for ~2x the (tiny) per-iteration vector
  work.  Each target state t has four 2-step predecessors
  s = 4*(t & 15) + j, j in 0..3, consuming input bits
  b1 = (t>>4)&1 then b2 = t>>5 and emitting four coded bits whose signs
  are compile-time tables built from iota.
* The whole trellis walk happens inside one kernel invocation: the
  forward ACS writes a 2-bit decision per pair-step into a VMEM scratch
  (win/2, 64, Bt) int8, then the in-kernel traceback walks it backwards
  with a one-hot sublane select.  Decisions never touch HBM — the
  kernel's only output is the decoded middle bits.

Reference counterpart: the SSE trellis of viterbicore.h:269-556 (16
states per vub register, BranchACS + smin, bounded traceback every 256
bits).  The overlap margin here plays the role of its traceback depth +
lookahead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sora_tpu.phy import common as C


def _kernel(soft_ref, pm0_ref, pmf_ref, bits_ref, dec_ref, *, win, block,
            overlap, bt):
    """One tile: decode Bt windows of `win` steps, emit middle `block` bits.

    soft_ref: (1, 4, win//2, Bt) f32 — planes (A@even t, B@even t,
    A@odd t, B@odd t); pm0_ref: (1, 64, Bt) f32 initial metrics;
    pmf_ref: (1, 64, Bt) f32 terminal metric bias; bits_ref:
    (1, block, Bt) int8 out; dec_ref: (win//2, 64, Bt) int8 scratch.
    """
    half = win // 2

    def _parity(v, g):
        p = jnp.zeros_like(v)
        for i in range(7):
            if (g >> i) & 1:
                p = p ^ ((v >> i) & 1)
        return p

    # Radix-2 branch-sign tables from iota (pallas kernels cannot capture
    # array constants): predecessor s = 4u + j reaches target
    # t = (b2<<5) | (b1<<4) | u via registers reg1 = (b1<<6) | s and
    # reg2 = (b2<<6) | (b1<<5) | (s>>1); each emits (A, B) = parity(reg & G).
    u = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    sgn = {}                      # (j, b1, b2) -> [sA1, sB1, sA2, sB2]
    for j in range(4):
        s = 4 * u + j
        for b1 in (0, 1):
            reg1 = (b1 << 6) | s
            s1 = (b1 << 5) | (s >> 1)
            for b2 in (0, 1):
                reg2 = (b2 << 6) | s1
                sgn[(j, b1, b2)] = [
                    (2 * _parity(reg1, C.G0) - 1).astype(jnp.float32),
                    (2 * _parity(reg1, C.G1) - 1).astype(jnp.float32),
                    (2 * _parity(reg2, C.G0) - 1).astype(jnp.float32),
                    (2 * _parity(reg2, C.G1) - 1).astype(jnp.float32)]

    # Quarter deinterleave as a fixed permutation matmul: row 16j + u of
    # R selects state 4u + j (Mosaic has no strided sublane slice, but a
    # (64,64)x(64,Bt) matmul is ~free on the MXU).
    ri = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
    perm = 4 * (ri % 16) + ri // 16
    R = (ci == perm).astype(jnp.float32)

    def fwd(m, pm):
        s4 = [soft_ref[0, p, pl.ds(m, 1), :] for p in range(4)]  # (1, Bt)
        pm_q = jnp.dot(R, pm, preferred_element_type=jnp.float32)
        groups = []
        decs = []
        for b2 in (0, 1):
            for b1 in (0, 1):
                cand = []
                for j in range(4):
                    sg = sgn[(j, b1, b2)]
                    bm = (sg[0] * s4[0] + sg[1] * s4[1]
                          + sg[2] * s4[2] + sg[3] * s4[3])
                    cand.append(pm_q[16 * j: 16 * (j + 1), :] - bm)
                m01 = jnp.minimum(cand[0], cand[1])
                # decision arithmetic in i32 (Mosaic vectors support only
                # i16/i32 adds); narrowed to i8 at the scratch store
                d01 = (cand[0] > cand[1]).astype(jnp.int32)
                m23 = jnp.minimum(cand[2], cand[3])
                d23 = (cand[2] > cand[3]).astype(jnp.int32) + 2
                take23 = m01 > m23
                groups.append(jnp.minimum(m01, m23))
                decs.append(jnp.where(take23, d23, d01))
        pm_next = jnp.concatenate(groups, axis=0)        # rows t
        pm_next = pm_next - pm_next[0:1, :]
        dec_ref[m] = jnp.concatenate(decs, axis=0).astype(jnp.int8)
        return pm_next

    pm_final = jax.lax.fori_loop(0, half, fwd, pm0_ref[0])

    # best end state per window (argmin over sublanes); pmf_ref biases the
    # terminal metrics (1e9 off-state-0 for terminated last windows)
    pm_final = pm_final + pmf_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
    mn = jnp.min(pm_final, axis=0, keepdims=True)
    s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                    axis=0, keepdims=True)               # (1, Bt)

    # Traceback in 4-pair chunks (8 decoded bits) so bit stores are
    # sublane-aligned (int8 vector stores need 8-aligned row offsets).
    def bwd_chunk(c, state):
        m0 = 4 * (half // 4 - 1 - c)
        rows = [None] * 8
        for k in range(3, -1, -1):
            m = m0 + k
            dec_m = dec_ref[m]                           # (64, Bt)
            oh = iota == state
            d = jnp.max(jnp.where(oh, dec_m.astype(jnp.int32), 0),
                        axis=0, keepdims=True)
            rows[2 * k] = ((state >> 4) & 1).astype(jnp.int8)   # b1
            rows[2 * k + 1] = (state >> 5).astype(jnp.int8)     # b2
            state = 4 * (state & 15) + d
        chunk_bits = jnp.concatenate(rows, axis=0)       # (8, Bt)
        t0 = 2 * m0
        off = jnp.maximum(t0 - overlap, 0)

        @pl.when(jnp.logical_and(t0 >= overlap, t0 < overlap + block))
        def _():
            bits_ref[0, pl.ds(pl.multiple_of(off, 8), 8), :] = chunk_bits

        return state

    s0 = s_end.astype(jnp.int32)
    jax.lax.fori_loop(0, half // 4, bwd_chunk, s0)


@partial(jax.jit,
         static_argnames=("block", "overlap", "bt", "terminated",
                          "interpret"))
def decode_blocks(soft_ab: jnp.ndarray, block: int = 512, overlap: int = 96,
                  bt: int = 256, terminated: bool = False,
                  interpret: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of dsp.viterbi.decode_blocks, Pallas-accelerated.

    soft_ab: (..., T, 2) float soft metrics (positive => coded bit 1).
    Returns (..., T) uint8 decoded bits.  Decode windows run `overlap`
    warmup steps on both sides; the first window of each stream starts
    pinned in state 0 (the encoder reset state); with ``terminated`` the
    last window of each stream also ends pinned in state 0 (802.11 tail
    bits).
    """
    assert block % 8 == 0 and overlap % 8 == 0, \
        "traceback chunking needs 8-aligned block/overlap"
    lead = soft_ab.shape[:-2]
    T = soft_ab.shape[-2]
    s = soft_ab.reshape(-1, T, 2).astype(jnp.float32)
    B = s.shape[0]
    nblk = -(-T // block)
    Tpad = nblk * block
    win = block + 2 * overlap
    s = jnp.pad(s, ((0, 0), (overlap, Tpad - T + overlap), (0, 0)))
    idx = (jnp.arange(nblk) * block)[:, None] + jnp.arange(win)[None, :]
    wins = s[:, idx, :]                               # (B, nblk, win, 2)
    R = B * nblk
    # pad rows to a tile multiple
    Rpad = -(-R // bt) * bt
    wins = wins.reshape(R, win, 2)
    wins = jnp.pad(wins, ((0, Rpad - R), (0, 0), (0, 0)))
    # kernel layout: (tiles, 4, win//2, bt) — planes (A even, B even,
    # A odd, B odd) so each radix-2 iteration is four plain dynamic row
    # loads
    wk = wins.reshape(Rpad // bt, bt, win // 2, 2, 2)
    wk = jnp.transpose(wk, (0, 3, 4, 2, 1)).reshape(
        Rpad // bt, 4, win // 2, bt)
    # initial metrics: uniform, except the first window of each stream
    # starts pinned in state 0
    row = jnp.arange(Rpad)
    states = jnp.arange(64)[:, None]
    first = (row % nblk == 0) & (row < R)
    pm0 = jnp.where((states != 0) & first[None, :],
                    1e9, 0.0).astype(jnp.float32)     # (64, Rpad)
    pm0 = jnp.transpose(pm0.reshape(64, Rpad // bt, bt), (1, 0, 2))
    if terminated:
        last = (row % nblk == nblk - 1) & (row < R)
    else:
        last = jnp.zeros_like(row, dtype=bool)
    pmf = jnp.where((states != 0) & last[None, :],
                    1e9, 0.0).astype(jnp.float32)
    pmf = jnp.transpose(pmf.reshape(64, Rpad // bt, bt), (1, 0, 2))

    kernel = partial(_kernel, win=win, block=block, overlap=overlap, bt=bt)
    bits = pl.pallas_call(
        kernel,
        grid=(Rpad // bt,),
        in_specs=[
            pl.BlockSpec((1, 4, win // 2, bt), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad // bt, block, bt), jnp.int8),
        scratch_shapes=[pltpu.VMEM((win // 2, 64, bt), jnp.int8)],
        interpret=interpret,
    )(wk, pm0, pmf)
    # (tiles, block, bt) -> (Rpad, block) -> (B, Tpad) -> (B, T)
    bits = jnp.transpose(bits, (0, 2, 1)).reshape(Rpad, block)[:R]
    bits = bits.reshape(B, nblk * block)[:, :T].astype(jnp.uint8)
    return bits.reshape(*lead, T)
