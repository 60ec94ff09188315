"""Pallas TPU kernel: block-parallel K=7 Viterbi decode (radix-4 trellis).

This is the speed-of-light path for the RX hot loop, replacing the
XLA-scan decoder in sora_tpu.dsp.viterbi (which spends multiple
microseconds of loop overhead per trellis step).  Design, driven by
microbenchmarks (tools/viterbi_sweep.py):

* The coded stream is pre-framed into overlapping windows outside the
  kernel (same scheme as dsp.viterbi.decode_blocks: `overlap` warmup
  steps on each side, keep the middle `block` bits).
* Layout inside the kernel: **states on sublanes, windows on lanes** —
  path metrics are a (64, Bt) f32 tile, so every lane is a decode window.
* **The fused ACS matmul is the wall, so it runs on the int8 MXU.**
  Dispatch-free cost attribution on v5e (tools/viterbi_probe.py,
  timed as 10 chained decodes inside one jit so the axon tunnel's
  ~0.7 ms/call dispatch overhead is excluded): at the bench shape the
  bf16 walk took 1.30 ms, of which the per-step (1024, 73) x (73, bt)
  matmul was 0.80 ms — already ~80% of MXU peak for its padded shape;
  the 16-way min tree 0.11 ms; everything else 0.39 ms.  bf16 vs f32
  operands measured identical, interleaving two independent half-lane
  streams bought 0% (Mosaic serializes MXU and VPU in one instruction
  stream), and moving the predecessor permutation out of the matmul
  onto the VPU (t-major candidate rows, pure sublane tiling) was 2.7x
  SLOWER — so the one remaining lever was operand width: **int8
  operands at 2x the bf16 MXU rate** took the walk to 0.92-0.99 ms
  (1.56-1.69 Gbit/s), and everything stays exact (int32 accumulate).
* **Radix-4 collapsing** consumes FOUR input bits per ACS iteration
  (vs 2 for the earlier radix-2 kernel, measured ~2x slower end to
  end; radix-8 would grow candidates 16x for 2x fewer steps — a net
  loss for a matmul-throughput-bound walk).  Each target state t has
  sixteen 4-step predecessors s = 16*(t & 3) + j, j in 0..15.
* **Quantized metrics with the branch index packed into the low bits**
  — the TPU formulation of the reference's path-bit-in-metric-LSB trick
  (viterbicore.h:292-420).  Soft inputs are quantized to integers
  (round(8*x), clamped to +-7), so path metrics are exact small
  integers in [0, PM_CLAMP] (renormalized by the running minimum and
  saturated each step — the clamp only touches dead paths, see
  PM_CLAMP).  Candidates are computed as 16*(pm[pred] - bm) + j in ONE
  fused int8 MXU matmul (predecessor permutation, +-1 branch-metric
  sums, and the index constant j are columns of a single (1024, 73)
  constant matrix built from iota), and the 16-way argmin collapses to
  a depth-4 tree of elementwise `min` ops — the j of the winner rides
  along in the low 4 bits (`m & 15`), so no comparison/select index
  tracking is needed at all.
* The whole trellis walk happens inside one kernel invocation: the
  forward ACS writes a 4-bit decision per step into a VMEM scratch
  (win/4, 64, Bt) int8 — half the radix-2 footprint — then the
  in-kernel traceback walks it backwards with a one-hot sublane select,
  8 decoded bits (2 radix-4 steps) per iteration.  Decisions never
  touch HBM — the kernel's only output is the decoded middle bits.

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

# soft-input quantization: round(SOFT_SCALE*x) clamped to +-SOFT_CLAMP.
# 3-bit-plus-sign soft values: the ACS matmul then runs entirely on the
# INT8 MXU path (2x the bf16 rate on v5e) — every operand (soft in
# +-7, clamped path metrics in [0, PM_CLAMP], matrix coefficients in
# +-16) is int8, the int32 accumulation is exact, and the
# packed-branch-index trick survives bit-exactly (extraction becomes
# `m & 15` / `m >> 4`).  3-bit soft decisions cost ~0.2 dB vs the
# reference's 8-bit demap LUTs (dsp_demap.h); the sensitivity suite
# (tools/sensitivity_sweep.py, tests/test_sensitivity.py) gates the
# loss.
SOFT_SCALE = 8.0
SOFT_CLAMP = 7.0

# Per-step path-metric renormalization: subtract the running minimum and
# saturate at PM_CLAMP.  The natural surviving-path spread for K=7 with
# +-7 soft values is <~ 6 steps x 14 = 84 < PM_CLAMP, so the clamp only
# touches already-dead paths; 120 keeps pm + branch sums inside int8.
PM_CLAMP = 120


def _parity(v, g):
    p = jnp.zeros_like(v)
    for i in range(7):
        if (g >> i) & 1:
            p = p ^ ((v >> i) & 1)
    return p


def _acs_matrix():
    """The fused radix-4 ACS constant M (1024, 73), built from iota
    (pallas kernels cannot capture array constants).

    Row r = 64j + t: candidate for target state t via 4-step predecessor
    s = 16*(t&3) + j.  cand_packed = M @ [pm; s8; 1] =
    16*(pm[s] - bm(t, j)) + j, where bm is the +-1-weighted sum of the
    eight quantized soft values of the step (coded bits A/B at input
    times 4m..4m+3) and the trailing column carries the packed index j.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
    j = r >> 6
    t = r & 63
    s = 16 * (t & 3) + j
    ci = jax.lax.broadcasted_iota(jnp.int32, (1024, 64), 1)
    Mpm = 16.0 * (ci == s).astype(jnp.float32)
    # input bits b1..b4 at times 4m..4m+3: t = (b4 b3 b2 b1 | s>>4)
    bits = [(t >> 2) & 1, (t >> 3) & 1, (t >> 4) & 1, t >> 5]
    cols = []
    st = s
    for b in bits:
        reg = (b << 6) | st
        cols.append(2 * _parity(reg, C.G0) - 1)
        cols.append(2 * _parity(reg, C.G1) - 1)
        st = (b << 5) | (st >> 1)
    Ms = jnp.concatenate(cols, axis=1).astype(jnp.float32)   # (1024, 8)
    M = jnp.concatenate([Mpm, -16.0 * Ms, j.astype(jnp.float32)],
                        axis=1)                              # (1024, 73)
    return M.astype(jnp.int8)                    # all entries in +-16


def _kernel(soft_ref, pm0_ref, pmf_ref, bits_ref, dec_ref, *, win, block,
            overlap, bt, unroll=4, unroll_tb=4):
    """One tile: decode Bt windows of `win` steps, emit middle `block` bits.

    soft_ref: (1, win//4, 8, Bt) int8 — radix-4 step m holds quantized
    planes (A, B) x times (4m..4m+3); pm0_ref: (1, 64, Bt) int8 initial
    metrics; pmf_ref: (1, 64, Bt) f32 terminal metric bias; bits_ref:
    (1, block, Bt) int8 out; dec_ref: (win//4, 64, Bt) int8 4-bit
    decision scratch.
    """
    nstep = win // 4
    U = unroll
    assert nstep % U == 0, "win//4 must divide the forward unroll"
    M = _acs_matrix()
    ones = jnp.ones((1, bt), jnp.int8)

    # Each iteration advances U radix-4 steps: one batched soft load, U
    # dependent ACS bodies, one batched decision store.  The fused
    # matmul runs on the int8 MXU path (2x the bf16 rate on v5e, the
    # dominant cost of the walk — see module docstring); the int32
    # accumulation keeps every candidate exact, so the winning branch
    # index is recovered bitwise.
    def step(i, pm):
        sU = soft_ref[0, pl.ds(i * U, U)]                  # (U, 8, Bt) i8
        decs = []
        for u in range(U):
            v = jnp.concatenate([pm, sU[u], ones], axis=0)  # (73, Bt) i8
            cand = jnp.dot(M, v, preferred_element_type=jnp.int32)
            c = cand.reshape(16, 64, bt)
            for h in (8, 4, 2, 1):                         # depth-4 min tree;
                c = jnp.minimum(c[:h], c[h:2 * h])         # j rides in bits 0-3
            m = c[0]
            mj = m & 15
            decs.append(mj.astype(jnp.int8))
            # renorm to [0, PM_CLAMP] (keeps pm inside int8)
            p = m >> 4
            p = p - jnp.min(p, axis=0, keepdims=True)
            pm = jnp.minimum(p, PM_CLAMP).astype(jnp.int8)
        dec_ref[pl.ds(i * U, U)] = jnp.stack(decs, axis=0)
        return pm

    pm_final = jax.lax.fori_loop(0, nstep // U, step, pm0_ref[0])

    # best end state per window (argmin over sublanes); pmf_ref biases the
    # terminal metrics (1e9 off-state-0 for terminated last windows)
    pm_final = pm_final.astype(jnp.float32) + pmf_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
    mn = jnp.min(pm_final, axis=0, keepdims=True)
    s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                    axis=0, keepdims=True)                 # (1, Bt)

    # Traceback 2*unroll_tb radix-4 steps (8*unroll_tb decoded bits) per
    # iteration — one batched decision-slab load, one batched bit store
    # (int8 vector stores need 8-aligned rows; groups never straddle the
    # overlap boundary because overlap % (8*unroll_tb) == 0).
    UB = unroll_tb
    bpg = 8 * UB                                           # bits per group
    assert nstep % (2 * UB) == 0 and overlap % bpg == 0 and block % bpg == 0
    ngrp = nstep // (2 * UB)

    def bwd_grp(cidx, state):
        g = ngrp - 1 - cidx
        slab = dec_ref[pl.ds(2 * UB * g, 2 * UB)].astype(jnp.int32)
        rows = [None] * bpg
        for k in range(2 * UB - 1, -1, -1):                # latest step first
            d = jnp.max(jnp.where(iota == state, slab[k], 0),
                        axis=0, keepdims=True)             # (1, Bt)
            rows[4 * k + 0] = ((state >> 2) & 1).astype(jnp.int8)   # b1
            rows[4 * k + 1] = ((state >> 3) & 1).astype(jnp.int8)   # b2
            rows[4 * k + 2] = ((state >> 4) & 1).astype(jnp.int8)   # b3
            rows[4 * k + 3] = (state >> 5).astype(jnp.int8)         # b4
            state = 16 * (state & 3) + d
        chunk_bits = jnp.concatenate(rows, axis=0)         # (bpg, Bt)
        t0 = bpg * g
        off = jnp.maximum(t0 - overlap, 0)

        @pl.when(jnp.logical_and(t0 >= overlap, t0 < overlap + block))
        def _():
            bits_ref[0, pl.ds(pl.multiple_of(off, bpg), bpg), :] = chunk_bits

        return state

    s0 = s_end.astype(jnp.int32)
    jax.lax.fori_loop(0, ngrp, bwd_grp, s0)


@partial(jax.jit,
         static_argnames=("block", "overlap", "bt", "terminated",
                          "interpret"))
def decode_blocks(soft_ab: jnp.ndarray, block: int = 512, overlap: int = 64,
                  bt: int = 512, terminated: bool = False,
                  interpret: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of dsp.viterbi.decode_blocks, Pallas-accelerated.

    soft_ab: (..., T, 2) float soft metrics (positive => coded bit 1).
    Returns (..., T) uint8 decoded bits.  Decode windows run `overlap`
    warmup steps on both sides; the first window of each stream starts
    pinned in state 0 (the encoder reset state); with ``terminated`` the
    last window of each stream also ends pinned in state 0 (802.11 tail
    bits).  Soft inputs are quantized to sign+3-bit integers internally (see
    SOFT_SCALE); exact ties then resolve to the lowest branch index.
    """
    assert block % 8 == 0 and overlap % 8 == 0, \
        "traceback chunking needs 8-aligned block/overlap"
    lead = soft_ab.shape[:-2]
    T = soft_ab.shape[-2]
    s = soft_ab.reshape(-1, T, 2).astype(jnp.float32)
    s = jnp.clip(jnp.round(s * SOFT_SCALE), -SOFT_CLAMP, SOFT_CLAMP)
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
    # kernel layout: (tiles, win//4, 8, bt) — radix-4 step m holds the
    # eight (A, B) values of input times 4m..4m+3 as one static tile
    wk = wins.reshape(Rpad // bt, bt, win // 4, 8)
    wk = jnp.transpose(wk, (0, 2, 3, 1))              # (tiles, m4, 8, bt)
    wk = wk.astype(jnp.int8)                          # +-7
    # initial metrics: uniform, except the first window of each stream
    # starts pinned in state 0 (PM_CLAMP handicap = the saturation value,
    # the strongest pin the clamped-metric formulation can express).
    # This is deliberately SOFTER than the old f32 1e9 pin: a wrong
    # start state is 120 units behind, erasable only by ~3 radix-4
    # steps of maximally adversarial soft values — which at any SNR
    # where the frame's FCS could pass does not happen (soft values are
    # signal-driven and the live-path spread stays < ~84; the
    # sensitivity gates in tests/test_sensitivity.py pin the operating
    # floors).  Mid-stream windows already start UNIFORM (weaker than
    # this) and decode exactly, so the pin is a strict improvement.
    row = jnp.arange(Rpad)
    states = jnp.arange(64)[:, None]
    first = (row % nblk == 0) & (row < R)
    pm0 = jnp.where((states != 0) & first[None, :],
                    PM_CLAMP, 0).astype(jnp.int8)     # (64, Rpad)
    pm0 = jnp.transpose(pm0.reshape(64, Rpad // bt, bt), (1, 0, 2))
    if terminated:
        last = (row % nblk == nblk - 1) & (row < R)
    else:
        last = jnp.zeros_like(row, dtype=bool)
    pmf = jnp.where((states != 0) & last[None, :],
                    1e9, 0.0).astype(jnp.float32)
    pmf = jnp.transpose(pmf.reshape(64, Rpad // bt, bt), (1, 0, 2))

    # unroll factors: the largest that divide the walk (see _kernel docs);
    # per-iteration loop overhead ~1 us dominates, so fatter is faster
    nstep = win // 4
    U = max(u for u in (4, 2, 1) if nstep % u == 0)
    UB = max(u for u in (4, 2, 1)
             if nstep % (2 * u) == 0 and overlap % (8 * u) == 0
             and block % (8 * u) == 0)
    kernel = partial(_kernel, win=win, block=block, overlap=overlap, bt=bt,
                     unroll=U, unroll_tb=UB)
    bits = pl.pallas_call(
        kernel,
        grid=(Rpad // bt,),
        in_specs=[
            pl.BlockSpec((1, win // 4, 8, bt), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, bt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad // bt, block, bt), jnp.int8),
        scratch_shapes=[pltpu.VMEM((win // 4, 64, bt), jnp.int8)],
        interpret=interpret,
    )(wk, pm0, pmf)
    # (tiles, block, bt) -> (Rpad, block) -> (B, Tpad) -> (B, T)
    bits = jnp.transpose(bits, (0, 2, 1)).reshape(Rpad, block)[:R]
    bits = bits.reshape(B, nblk * block)[:, :T].astype(jnp.uint8)
    return bits.reshape(*lead, T)
