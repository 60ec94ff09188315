import time, sys, numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
t0=time.perf_counter()
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
jax.block_until_ready(y)
print(f"trivial jit: {time.perf_counter()-t0:.1f}s", flush=True)
sys.path.insert(0,'/root/repo')
from sora_tpu.dsp import viterbi as dvit
soft = jnp.asarray(np.random.default_rng(0).normal(size=(8,512,2)).astype(np.float32))
t0=time.perf_counter()
o = dvit.decode(soft, terminated=False); jax.block_until_ready(o)
print(f"viterbi decode(8,512) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
o = dvit.decode(soft, terminated=False); jax.block_until_ready(o)
print(f"second run: {time.perf_counter()-t0:.3f}s", flush=True)
