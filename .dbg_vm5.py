import sys, time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, '/root/repo')
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from sora_tpu.ops.viterbi_pallas import _acs_matrix

BT = 256
NSTEP = 160
NTILE = 12

def mk(mode):
    def kern(soft_ref, pm0_ref, out_ref, dec_ref):
        M = _acs_matrix()
        Mb = M.astype(jnp.bfloat16)
        ones = jnp.ones((1, BT), jnp.float32)
        def step(m4, pm):
            s8 = soft_ref[0, m4]
            v = jnp.concatenate([pm, s8, ones], axis=0)
            if mode == 'bf16':
                cand = jnp.dot(Mb, v.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            else:
                cand = jnp.dot(M, v, preferred_element_type=jnp.float32)
            c = cand.reshape(16, 64, BT)
            m = c[0]
            for j in range(1, 16):
                m = jnp.minimum(m, c[j])
            mj = m - 16.0 * jnp.floor(m * (1.0 / 16.0))
            pm_next = (m - mj) * (1.0 / 16.0)
            dec_ref[m4] = mj.astype(jnp.int8)
            return pm_next - pm_next[0:1, :]
        pm = jax.lax.fori_loop(0, NSTEP, step, pm0_ref[0])
        out_ref[0] = pm
    return kern

@partial(jax.jit, static_argnames=("mode",))
def run(wk, pm0, mode):
    return pl.pallas_call(
        mk(mode),
        grid=(NTILE,),
        in_specs=[pl.BlockSpec((1, NSTEP, 8, BT), lambda i: (i,0,0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 64, BT), lambda i: (i,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, BT), lambda i: (i,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NTILE, 64, BT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NSTEP, 64, BT), jnp.int8)],
    )(wk, pm0)

rng = np.random.default_rng(0)
wk = jax.device_put(jnp.asarray(np.round(rng.normal(size=(NTILE, NSTEP, 8, BT))*8).astype(np.float32)))
pm0 = jax.device_put(jnp.zeros((NTILE, 64, BT), np.float32))
for mode in ('f32','bf16'):
    o = run(wk, pm0, mode); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(50):
        o = run(wk, pm0, mode)
    np.asarray(o)
    dt = (time.perf_counter()-t0)/50
    print(f"{mode}: {dt*1e3:.2f} ms -> {dt/(NTILE*NSTEP)*1e6:.2f} us/step")
