"""Microbenchmark probe: time surgically modified variants of the Pallas
Viterbi kernel to attribute the per-step cost (matmul vs min tree vs
renorm vs traceback vs loop overhead).  Evidence for the roofline note
in ops/viterbi_pallas.py.

Historical note: the attribution runs that drove the round-5 redesign
were taken against the bf16 kernel; the module's default kernel is now
the int8-MXU formulation those runs selected (the "i8mm" variant here),
so "base" and "i8mm" now measure the same path.

Usage: python tools/viterbi_probe.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from jax.experimental import pallas as pl

    from sora_tpu.dsp import viterbi as dvit
    from sora_tpu.ops import viterbi_pallas as vp

    B, T = 128, 12096
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (B, T), dtype=np.uint8)
    coded = np.asarray(dvit.encode(jnp.asarray(bits))).reshape(B, T, 2)
    soft = (2.0 * coded - 1.0).astype(np.float32) \
        + rng.normal(size=(B, T, 2)).astype(np.float32) * 0.25
    sd = jnp.asarray(soft)
    kern0 = vp._kernel

    def variant(name):
        """Build a _kernel wrapper per variant name."""
        def _k(soft_ref, pm0_ref, pmf_ref, bits_ref, dec_ref, *, win, block,
               overlap, bt, unroll=4, unroll_tb=4):
            nstep = win // 4
            U = unroll
            M = vp._acs_matrix()
            ones = jnp.ones((1, bt), jnp.bfloat16)

            if name == "i8mm":
                # int8 MXU (2x bf16 on v5e): all operands int8 (soft
                # quantized +-7, pm clamped [0,120], M entries +-16),
                # exact int32 accumulation; mj extract is bitwise.
                Mi = vp._acs_matrix().astype(jnp.int8)
                ones_i = jnp.ones((1, bt), jnp.int8)

                def step(i, pm):
                    sU = soft_ref[0, pl.ds(i * U, U)].astype(jnp.int8)
                    decs = []
                    for u in range(U):
                        v = jnp.concatenate([pm, sU[u], ones_i], axis=0)
                        cand = jnp.dot(Mi, v,
                                       preferred_element_type=jnp.int32)
                        c = cand.reshape(16, 64, bt)
                        for h in (8, 4, 2, 1):
                            c = jnp.minimum(c[:h], c[h:2 * h])
                        m = c[0]
                        mj = m & 15
                        decs.append(mj.astype(jnp.int8))
                        p = m >> 4
                        p = p - jnp.min(p, axis=0, keepdims=True)
                        pm = jnp.minimum(p, 120).astype(jnp.int8)
                    dec_ref[pl.ds(i * U, U)] = jnp.stack(decs, axis=0)
                    return pm

                pm0 = jnp.minimum(pm0_ref[0], 120.0).astype(jnp.int8)
                pm_final = jax.lax.fori_loop(
                    0, nstep // U, step, pm0).astype(jnp.float32)
                pm_final = pm_final + pmf_ref[0]
                iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
                mn = jnp.min(pm_final, axis=0, keepdims=True)
                s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                                axis=0, keepdims=True)
                UBl = unroll_tb
                bpg = 8 * UBl
                ngrp = nstep // (2 * UBl)

                def bwd_grp(cidx, state):
                    g = ngrp - 1 - cidx
                    slab = dec_ref[pl.ds(2 * UBl * g,
                                         2 * UBl)].astype(jnp.int32)
                    rows = [None] * bpg
                    for k in range(2 * UBl - 1, -1, -1):
                        d = jnp.max(jnp.where(iota == state, slab[k], 0),
                                    axis=0, keepdims=True)
                        rows[4 * k + 0] = ((state >> 2) & 1).astype(jnp.int8)
                        rows[4 * k + 1] = ((state >> 3) & 1).astype(jnp.int8)
                        rows[4 * k + 2] = ((state >> 4) & 1).astype(jnp.int8)
                        rows[4 * k + 3] = (state >> 5).astype(jnp.int8)
                        state = 16 * (state & 3) + d
                    chunk_bits = jnp.concatenate(rows, axis=0)
                    t0 = bpg * g
                    off = jnp.maximum(t0 - overlap, 0)

                    @pl.when(jnp.logical_and(t0 >= overlap,
                                             t0 < overlap + block))
                    def _():
                        bits_ref[0, pl.ds(pl.multiple_of(off, bpg),
                                          bpg), :] = chunk_bits

                    return state

                jax.lax.fori_loop(0, ngrp, bwd_grp, s_end.astype(jnp.int32))
                return

            if name == "tmajor":
                # t-major candidate rows r = 16t + j: the predecessor
                # permutation pm[16*(t&3)+j] becomes a pure sublane TILE
                # of pm (4-block cycle repeated), so the matmul only
                # computes branch metrics (K=9) and pm stays f32 on the
                # VPU (no bf16 clamp needed; carry pm16 = 16*pm).
                r = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
                t = r >> 4
                j = r & 15
                s = 16 * (t & 3) + j
                bits_c = [(t >> 2) & 1, (t >> 3) & 1, (t >> 4) & 1, t >> 5]
                cols = []
                st = s
                for b in bits_c:
                    reg = (b << 6) | st
                    cols.append(2 * vp._parity(reg, 0o133) - 1)
                    cols.append(2 * vp._parity(reg, 0o171) - 1)
                    st = (b << 5) | (st >> 1)
                Ms = jnp.concatenate(cols, axis=1).astype(jnp.float32)
                Mbm = jnp.concatenate(
                    [-16.0 * Ms, j.astype(jnp.float32)],
                    axis=1).astype(jnp.bfloat16)           # (1024, 9)

                def step(i, pm16):
                    sU = soft_ref[0, pl.ds(i * U, U)]
                    decs = []
                    for u in range(U):
                        v = jnp.concatenate([sU[u], ones], axis=0)  # (9,bt)
                        bmj = jnp.dot(Mbm, v,
                                      preferred_element_type=jnp.float32)
                        perm = jnp.broadcast_to(
                            pm16.reshape(1, 64, bt),
                            (16, 64, bt)).reshape(1024, bt)
                        c = (perm + bmj).reshape(64, 16, bt)
                        for h in (8, 4, 2, 1):
                            c = jnp.minimum(c[:, :h], c[:, h:2 * h])
                        m = c[:, 0]                        # (64, bt)
                        mj = m - 16.0 * jnp.floor(m * (1.0 / 16.0))
                        decs.append(mj.astype(jnp.int8))
                        pm16 = (m - mj) - (m[0:1] - mj[0:1])
                    dec_ref[pl.ds(i * U, U)] = jnp.stack(decs, axis=0)
                    return pm16

                pm_final = jax.lax.fori_loop(0, nstep // U, step,
                                             16.0 * pm0_ref[0]) * (1.0 / 16.0)
                pm_final = pm_final + pmf_ref[0]
                iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
                mn = jnp.min(pm_final, axis=0, keepdims=True)
                s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                                axis=0, keepdims=True)
                UBl = unroll_tb
                bpg = 8 * UBl
                ngrp = nstep // (2 * UBl)

                def bwd_grp(cidx, state):
                    g = ngrp - 1 - cidx
                    slab = dec_ref[pl.ds(2 * UBl * g,
                                         2 * UBl)].astype(jnp.int32)
                    rows = [None] * bpg
                    for k in range(2 * UBl - 1, -1, -1):
                        d = jnp.max(jnp.where(iota == state, slab[k], 0),
                                    axis=0, keepdims=True)
                        rows[4 * k + 0] = ((state >> 2) & 1).astype(jnp.int8)
                        rows[4 * k + 1] = ((state >> 3) & 1).astype(jnp.int8)
                        rows[4 * k + 2] = ((state >> 4) & 1).astype(jnp.int8)
                        rows[4 * k + 3] = (state >> 5).astype(jnp.int8)
                        state = 16 * (state & 3) + d
                    chunk_bits = jnp.concatenate(rows, axis=0)
                    t0 = bpg * g
                    off = jnp.maximum(t0 - overlap, 0)

                    @pl.when(jnp.logical_and(t0 >= overlap,
                                             t0 < overlap + block))
                    def _():
                        bits_ref[0, pl.ds(pl.multiple_of(off, bpg),
                                          bpg), :] = chunk_bits

                    return state

                jax.lax.fori_loop(0, ngrp, bwd_grp, s_end.astype(jnp.int32))
                return

            if name.startswith("ilv"):
                # two independent half-lane streams interleaved so the
                # scheduler can overlap one stream's MXU matmul with the
                # other's VPU min tree
                h2 = bt // 2
                ones2 = jnp.ones((1, h2), jnp.bfloat16)

                def acs(pm, s8):
                    v = jnp.concatenate(
                        [pm.astype(jnp.bfloat16), s8, ones2], axis=0)
                    return jnp.dot(M, v, preferred_element_type=jnp.float32)

                def tail(cand):
                    c = cand.reshape(16, 64, h2)
                    for h in (8, 4, 2, 1):
                        c = jnp.minimum(c[:h], c[h:2 * h])
                    m = c[0]
                    mj = m - 16.0 * jnp.floor(m * (1.0 / 16.0))
                    pm = (m - mj) * (1.0 / 16.0)
                    pm = pm - jnp.min(pm, axis=0, keepdims=True)
                    return jnp.minimum(pm, vp.PM_CLAMP), mj.astype(jnp.int8)

                def step2(i, pms):
                    pmA, pmB = pms
                    sU = soft_ref[0, pl.ds(i * U, U)]
                    decs = []
                    for u in range(U):
                        cA = acs(pmA, sU[u, :, :h2])
                        cB = acs(pmB, sU[u, :, h2:])
                        pmA, mjA = tail(cA)
                        pmB, mjB = tail(cB)
                        decs.append(jnp.concatenate([mjA, mjB], axis=-1))
                    dec_ref[pl.ds(i * U, U)] = jnp.stack(decs, axis=0)
                    return (pmA, pmB)

                pm0 = pm0_ref[0]
                pmA, pmB = jax.lax.fori_loop(
                    0, nstep // U, step2, (pm0[:, :h2], pm0[:, h2:]))
                pm_final = jnp.concatenate([pmA, pmB], axis=-1)
                pm_final = pm_final + pmf_ref[0]
                iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
                mn = jnp.min(pm_final, axis=0, keepdims=True)
                s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                                axis=0, keepdims=True)
                UBl = unroll_tb
                bpg = 8 * UBl
                ngrp = nstep // (2 * UBl)

                def bwd_grp(cidx, state):
                    g = ngrp - 1 - cidx
                    slab = dec_ref[pl.ds(2 * UBl * g,
                                         2 * UBl)].astype(jnp.int32)
                    rows = [None] * bpg
                    for k in range(2 * UBl - 1, -1, -1):
                        d = jnp.max(jnp.where(iota == state, slab[k], 0),
                                    axis=0, keepdims=True)
                        rows[4 * k + 0] = ((state >> 2) & 1).astype(jnp.int8)
                        rows[4 * k + 1] = ((state >> 3) & 1).astype(jnp.int8)
                        rows[4 * k + 2] = ((state >> 4) & 1).astype(jnp.int8)
                        rows[4 * k + 3] = (state >> 5).astype(jnp.int8)
                        state = 16 * (state & 3) + d
                    chunk_bits = jnp.concatenate(rows, axis=0)
                    t0 = bpg * g
                    off = jnp.maximum(t0 - overlap, 0)

                    @pl.when(jnp.logical_and(t0 >= overlap,
                                             t0 < overlap + block))
                    def _():
                        bits_ref[0, pl.ds(pl.multiple_of(off, bpg),
                                          bpg), :] = chunk_bits

                    return state

                jax.lax.fori_loop(0, ngrp, bwd_grp, s_end.astype(jnp.int32))
                return

            def step(i, pm):
                sU = soft_ref[0, pl.ds(i * U, U)]
                decs = []
                for u in range(U):
                    v = jnp.concatenate(
                        [pm.astype(jnp.bfloat16), sU[u], ones], axis=0)
                    if name == "nomatmul":
                        cand = jnp.broadcast_to(
                            v[0:1].astype(jnp.float32), (1024, bt)) + 0.0
                    else:
                        cand = jnp.dot(M, v,
                                       preferred_element_type=jnp.float32)
                    c = cand.reshape(16, 64, bt)
                    if name == "nomin":
                        m = c[0]
                    else:
                        for h in (8, 4, 2, 1):
                            c = jnp.minimum(c[:h], c[h:2 * h])
                        m = c[0]
                    mj = m - 16.0 * jnp.floor(m * (1.0 / 16.0))
                    decs.append(mj.astype(jnp.int8))
                    pm = (m - mj) * (1.0 / 16.0)
                    if name == "norenorm":
                        pm = pm - pm[0:1]
                    else:
                        pm = pm - jnp.min(pm, axis=0, keepdims=True)
                        pm = jnp.minimum(pm, vp.PM_CLAMP)
                    if name == "nodec":
                        decs[-1] = pm.astype(jnp.int8)
                if name != "nostore":
                    dec_ref[pl.ds(i * U, U)] = jnp.stack(decs, axis=0)
                return pm

            pm_final = jax.lax.fori_loop(0, nstep // U, step, pm0_ref[0])
            pm_final = pm_final + pmf_ref[0]
            iota = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
            mn = jnp.min(pm_final, axis=0, keepdims=True)
            s_end = jnp.min(jnp.where(pm_final <= mn, iota, 64),
                            axis=0, keepdims=True)

            UBl = unroll_tb
            bpg = 8 * UBl
            ngrp = nstep // (2 * UBl)

            def bwd_grp(cidx, state):
                g = ngrp - 1 - cidx
                slab = dec_ref[pl.ds(2 * UBl * g, 2 * UBl)].astype(jnp.int32)
                rows = [None] * bpg
                for k in range(2 * UBl - 1, -1, -1):
                    d = jnp.max(jnp.where(iota == state, slab[k], 0),
                                axis=0, keepdims=True)
                    rows[4 * k + 0] = ((state >> 2) & 1).astype(jnp.int8)
                    rows[4 * k + 1] = ((state >> 3) & 1).astype(jnp.int8)
                    rows[4 * k + 2] = ((state >> 4) & 1).astype(jnp.int8)
                    rows[4 * k + 3] = (state >> 5).astype(jnp.int8)
                    state = 16 * (state & 3) + d
                chunk_bits = jnp.concatenate(rows, axis=0)
                t0 = bpg * g
                off = jnp.maximum(t0 - overlap, 0)

                @pl.when(jnp.logical_and(t0 >= overlap,
                                         t0 < overlap + block))
                def _():
                    bits_ref[0, pl.ds(pl.multiple_of(off, bpg), bpg), :] = \
                        chunk_bits

                return state

            if name != "notb":
                jax.lax.fori_loop(0, ngrp, bwd_grp,
                                  s_end.astype(jnp.int32))
            else:
                bits_ref[0] = jnp.zeros((block, bt), jnp.int8)
        return _k

    # dispatch-free device time: scan 10 chained decodes in one jit
    # (the data dependency through the carry defeats CSE), so per-rep
    # time excludes the axon tunnel's per-dispatch cost
    import jax as _jax

    @_jax.jit
    def chain10(s):
        def body(c, _):
            bits = vp.decode_blocks(s * (1.0 + 1e-12 * c), block=512,
                                    overlap=64, bt=512, terminated=False)
            return jnp.float32(bits[0, 0]), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return c

    def scan_time(block, overlap, bt, label, check=True):
        """Dispatch-free timing: 10 chained decodes inside one jit."""
        @partial(jax.jit, static_argnames=())
        def chain10(s):
            def body(c, _):
                b = vp.decode_blocks(s * (1.0 + 1e-12 * c), block=block,
                                     overlap=overlap, bt=bt,
                                     terminated=False)
                return jnp.float32(b[0, 0]), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
            return c

        try:
            ber = -1.0
            if check:
                got = np.asarray(vp.decode_blocks(
                    sd, block=block, overlap=overlap, bt=bt,
                    terminated=False))
                ber = float((got != bits).mean())
            t0 = time.perf_counter()
            np.asarray(chain10(sd))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                o = chain10(sd)
            np.asarray(o)
            dt = (time.perf_counter() - t0) / (reps * 10)
            print(f"{label:28s}: {B*T/dt/1e6:8.1f} Mbit/s  {dt*1e3:6.2f} ms"
                  f"  ber={ber:.1e}  compile={tc:.1f}s", flush=True)
        except Exception as e:
            print(f"{label:28s}: FAIL {str(e).splitlines()[0][:100]}",
                  flush=True)

    for name in ["base", "i8mm"]:
        if name == "i8mm":
            vp.SOFT_SCALE, vp.SOFT_CLAMP = 8.0, 7.0
        vp._kernel = kern0 if name == "base" else variant(name)
        jax.clear_caches()
        scan_time(512, 64, 512, f"{name} b512")
        scan_time(1024, 64, 768, f"{name} b1024 bt768")
    vp._kernel = kern0
    return 0


if __name__ == "__main__":
    sys.exit(main())
