import time, sys, numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0,'/root/repo')
from sora_tpu.dsp import viterbi as dvit
soft = jnp.asarray(np.random.default_rng(0).normal(size=(8,512,2)).astype(np.float32))
t0=time.perf_counter(); o=jax.block_until_ready(dvit.decode(soft, terminated=True))
print(f"decode compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
