import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from sora_tpu.mac import frame as fr
from sora_tpu.phy.dot11a import rx as jrx, tx as jtx
rng = np.random.default_rng(7)
B, rate, psdu_len = 8, 12, 80
psdus = [fr.build_data_frame(bytes(rng.integers(0,256,psdu_len-28,dtype=np.uint8)), seq=i) for i in range(B)]
arr = np.stack([np.frombuffer(p, np.uint8) for p in psdus])
waves = np.asarray(jtx.modulate(arr, rate, arr.shape[1]))
print('wave len', waves.shape)
N = 4096
x = np.zeros((B,N), np.complex64)
for i in range(B):
    off = 13*i+40
    x[i, off:off+waves.shape[1]] = waves[i]
x += (rng.normal(size=x.shape)+1j*rng.normal(size=x.shape)).astype(np.complex64)*0.01
lts1, cfo, det = jrx.synchronize(jnp.asarray(x))
print('lts1', np.asarray(lts1), 'expected', [13*i+40+192 for i in range(B)])
print('cfo', np.asarray(cfo))
print('det', np.asarray(det))
