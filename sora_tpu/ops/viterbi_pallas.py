"""Pallas TPU kernel: block-parallel K=7 Viterbi decode.

This is the speed-of-light path for the RX hot loop, replacing the
XLA-scan decoder in sora_tpu.dsp.viterbi (which spends multiple
microseconds of loop overhead per trellis step).  Design:

* The coded stream is pre-framed into overlapping windows outside the
  kernel (same scheme as dsp.viterbi.decode_blocks: `overlap` warmup
  steps on each side, keep the middle `block` bits).
* Layout inside the kernel: **states on sublanes, rows on lanes** —
  path metrics are an (64, Bt) f32 tile, so the even/odd predecessor
  split pm[0::2]/pm[1::2] is a sublane-strided access (cheap on the VPU)
  and every lane is a decode window.
* The whole trellis walk happens inside one kernel invocation: the
  forward ACS writes per-step decisions into a VMEM scratch (win, 64, Bt)
  int8, then the in-kernel traceback walks it backwards with a one-hot
  sublane select.  Decisions never touch HBM — the kernel's only output
  is the decoded middle bits.

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

    soft_ref: (1, 2, win, Bt) f32 (A/B planes); pm0_ref: (1, 64, Bt) f32
    initial metrics; pmf_ref: (1, 64, Bt) f32 terminal metric bias;
    bits_ref: (1, block, Bt) int8 out; dec_ref: (win, 64, Bt) int8 scratch.
    """
    # Branch-sign tables computed in-kernel from iota (pallas kernels
    # cannot capture array constants): for predecessor 2u+j and input b
    # the 7-bit encoder register is v = 2u + j + 64b, emitted bits are
    # parity(v & G); sign = +1 when the emitted bit is 1.
    u2 = 2 * jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)

    def _parity(v, g):
        p = jnp.zeros_like(v)
        for i in range(7):
            if (g >> i) & 1:
                p = p ^ ((v >> i) & 1)
        return p

    sga, sgb = {}, {}
    for j in (0, 1):
        for b in (0, 1):
            v = u2 + j + 64 * b
            sga[(j, b)] = (2 * _parity(v, C.G0) - 1).astype(jnp.float32)
            sgb[(j, b)] = (2 * _parity(v, C.G1) - 1).astype(jnp.float32)

    # Even/odd deinterleave as a fixed permutation matmul: Mosaic has no
    # strided sublane slice, but a (64,64)x(64,Bt) matmul is ~free on the
    # MXU.  Row i of R selects state 2i (i<32) or 2(i-32)+1 (i>=32).
    ri = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
    perm = jnp.where(ri < 32, 2 * ri, 2 * (ri - 32) + 1)
    R = (ci == perm).astype(jnp.float32)

    def fwd(t, pm):
        sa = soft_ref[0, 0, pl.ds(t, 1), :]           # (1, Bt)
        sb = soft_ref[0, 1, pl.ds(t, 1), :]
        pm_eo = jnp.dot(R, pm, preferred_element_type=jnp.float32)
        pme = pm_eo[0:32, :]                          # (32, Bt) even preds
        pmo = pm_eo[32:64, :]
        halves = []
        decs = []
        for b in (0, 1):
            cand_e = pme - (sga[(0, b)] * sa + sgb[(0, b)] * sb)
            cand_o = pmo - (sga[(1, b)] * sa + sgb[(1, b)] * sb)
            halves.append(jnp.minimum(cand_e, cand_o))
            decs.append((cand_e > cand_o).astype(jnp.int8))
        pm_next = jnp.concatenate(halves, axis=0)     # (64, Bt)
        pm_next = pm_next - pm_next[0:1, :]
        dec_ref[t] = jnp.concatenate(decs, axis=0)
        return pm_next

    pm_final = jax.lax.fori_loop(0, win, fwd, pm0_ref[0])

    # best end state per window (argmin over sublanes); pmf_ref biases the
    # terminal metrics (1e9 off-state-0 for terminated last windows)
    pm_final = pm_final + pmf_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
    mn = jnp.min(pm_final, axis=0, keepdims=True)
    s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                    axis=0, keepdims=True)            # (1, Bt)

    # Traceback in 8-step chunks so bit stores are sublane-aligned (int8
    # vector stores need statically-aligned row offsets).
    def bwd_chunk(c, state):
        t0 = 8 * (win // 8 - 1 - c)
        rows = [None] * 8
        for k in range(7, -1, -1):
            t = t0 + k
            dec_t = dec_ref[t]                        # (64, Bt)
            oh = iota == state
            d = jnp.max(jnp.where(oh, dec_t.astype(jnp.int32), 0),
                        axis=0, keepdims=True)
            rows[k] = (state >> 5).astype(jnp.int8)   # (1, Bt)
            state = 2 * (state & 31) + d
        chunk_bits = jnp.concatenate(rows, axis=0)    # (8, Bt)
        off = jnp.maximum(t0 - overlap, 0)

        @pl.when(jnp.logical_and(t0 >= overlap, t0 < overlap + block))
        def _():
            bits_ref[0, pl.ds(pl.multiple_of(off, 8), 8), :] = chunk_bits

        return state

    s0 = s_end.astype(jnp.int32)
    jax.lax.fori_loop(0, win // 8, bwd_chunk, s0)


@partial(jax.jit,
         static_argnames=("block", "overlap", "bt", "terminated",
                          "interpret"))
def decode_blocks(soft_ab: jnp.ndarray, block: int = 512, overlap: int = 96,
                  bt: int = 128, terminated: bool = False,
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
    # kernel layout: (tiles, 2, win, bt) — separate A/B planes so the
    # per-step read is a plain dynamic row load
    wk = jnp.transpose(wins.reshape(Rpad // bt, bt, win, 2), (0, 3, 2, 1))
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
            pl.BlockSpec((1, 2, win, bt), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad // bt, block, bt), jnp.int8),
        scratch_shapes=[pltpu.VMEM((win, 64, bt), jnp.int8)],
        interpret=interpret,
    )(wk, pm0, pmf)
    # (tiles, block, bt) -> (Rpad, block) -> (B, Tpad) -> (B, T)
    bits = jnp.transpose(bits, (0, 2, 1)).reshape(Rpad, block)[:R]
    bits = bits.reshape(B, nblk * block)[:, :T].astype(jnp.uint8)
    return bits.reshape(*lead, T)
