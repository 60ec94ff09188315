import time, sys, numpy as np
import jax, jax.numpy as jnp
def t(name, fn, *a):
    t0=time.perf_counter(); o=jax.block_until_ready(jax.jit(fn)(*a))
    c=time.perf_counter()-t0
    t0=time.perf_counter(); o=jax.block_until_ready(jax.jit(fn)(*a))
    print(f"{name}: compile+run {c:.1f}s, cached {time.perf_counter()-t0:.3f}s", flush=True)

B,T = 8,512
xs = jnp.ones((T, B, 2))
# 1) plain scan, simple body
def f1(xs):
    def step(c, x):
        c = c + x[:, :1]; return c, c
    return jax.lax.scan(step, jnp.zeros((B,64)), xs)[1]
t("scan simple body", f1, xs)
# 2) scan with min over pairs, layout (B,64) via strided slices
import sys; sys.path.insert(0,'/root/repo')
from sora_tpu.phy import common as C
SA = jnp.asarray(2.0*C.BFLY_OUT_A-1.0, jnp.float32)  # (32,2,2)
SB = jnp.asarray(2.0*C.BFLY_OUT_B-1.0, jnp.float32)
c00 = -(SA[:,0,0]); c10 = -(SA[:,1,0])
def f2(xs):
    def step(pm, x):
        sa = x[:, :1]; sb = x[:, 1:]
        pmA = pm[:, 0::2]; pmB = pm[:, 1::2]
        cA0 = -(SA[None,:,0,0]*sa + SB[None,:,0,0]*sb)
        cB0 = -(SA[None,:,1,0]*sa + SB[None,:,1,0]*sb)
        cA1 = -(SA[None,:,0,1]*sa + SB[None,:,0,1]*sb)
        cB1 = -(SA[None,:,1,1]*sa + SB[None,:,1,1]*sb)
        n0 = jnp.minimum(pmA+cA0, pmB+cB0)
        n1 = jnp.minimum(pmA+cA1, pmB+cB1)
        d0 = pmA+cA0 > pmB+cB0
        d1 = pmA+cA1 > pmB+cB1
        pm2 = jnp.concatenate([n0, n1], axis=1)
        return pm2 - pm2[:, :1], jnp.concatenate([d0, d1], axis=1)
    return jax.lax.scan(step, jnp.zeros((B,64)), xs)
t("scan ACS strided (B,64)", f2, xs)
# 3) traceback-style scan with take_along_axis
dec = jnp.zeros((T, B, 64), jnp.int8)
def f3(dec):
    def step(s, d):
        bit = (s>>5).astype(jnp.uint8)
        dd = jnp.take_along_axis(d, s[:,None], axis=1)[:,0]
        return 2*(s&31)+dd.astype(jnp.int32), bit
    return jax.lax.scan(step, jnp.zeros((B,), jnp.int32), dec, reverse=True)[1]
t("scan traceback gather", f3, dec)
