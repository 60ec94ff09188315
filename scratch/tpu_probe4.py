import time, sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0,'/root/repo')
from sora_tpu.dsp.viterbi import _acs_step
B,T=8,512
soft = jnp.asarray(np.random.default_rng(0).normal(size=(T,B,2)).astype(np.float32))
IOTA = jnp.arange(64, dtype=jnp.int32)
def full(soft):
    pm0 = jnp.full((B, 64), 1e9, dtype=jnp.float32).at[:, 0].set(0.0)
    def fwd(pm, st):
        pmn, dec = _acs_step(pm, st)
        return pmn, dec
    pmf, decs = jax.lax.scan(fwd, pm0, soft)
    s_end = jnp.argmin(pmf, axis=-1).astype(jnp.int32)
    def bwd(state, dec_t):
        bit = (state>>5).astype(jnp.uint8)
        oh = IOTA[None,:] == state[:,None]
        d = jnp.sum(jnp.where(oh & dec_t, 1, 0), axis=1)
        return 2*(state&31)+d, bit
    _, bits = jax.lax.scan(bwd, s_end, decs, reverse=True)
    return bits
f = jax.jit(full)
t0=time.perf_counter(); o=jax.block_until_ready(f(soft))
print(f"onehot traceback: compile {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); jax.block_until_ready(f(soft))
print(f"cached run: {time.perf_counter()-t0:.3f}s", flush=True)
# correctness vs cpu path
from sora_tpu.phy import common as C
bits = np.asarray(o)
print("bits shape", bits.shape, bits.sum())
