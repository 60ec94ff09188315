import time, sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0,'/root/repo')
from sora_tpu.dsp.viterbi import _acs_step
B,T=8,512
soft = jnp.asarray(np.random.default_rng(0).normal(size=(T,B,2)).astype(np.float32))
def mk(cast):
    def full(soft):
        pm0 = jnp.full((B, 64), 1e9, dtype=jnp.float32).at[:, 0].set(0.0)
        def fwd(pm, st):
            pmn, dec = _acs_step(pm, st)
            return pmn, cast(dec)
        pmf, decs = jax.lax.scan(fwd, pm0, soft)
        s_end = jnp.argmin(pmf, axis=-1).astype(jnp.int32)
        def bwd(state, dec_t):
            bit = (state>>5).astype(jnp.uint8)
            d = jnp.take_along_axis(dec_t, state[:,None], axis=1)[:,0]
            return 2*(state&31)+d.astype(jnp.int32), bit
        _, bits = jax.lax.scan(bwd, s_end, decs, reverse=True)
        return bits
    return full
for name, cast in [("int8", lambda d: d.astype(jnp.int8)), ("bool", lambda d: d)]:
    f = jax.jit(mk(cast))
    t0=time.perf_counter(); jax.block_until_ready(f(soft))
    print(f"decisions {name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
