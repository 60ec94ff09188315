import numpy as np
from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
rng = np.random.default_rng(0x50BA)
payload = rng.integers(0,256,200,dtype=np.uint8).tobytes()
psdu = fr.build_data_frame(payload, seq=7)
wave = g.modulate(psdu, 24)
for case, (delay, cfo, noise) in {'clean':(0,0,0), 'delay':(37,0,0), 'cfo':(37,2*np.pi*80e3/20e6,0), 'noise':(37,0,0.02), 'all':(37,2*np.pi*80e3/20e6,0.02)}.items():
    x = np.concatenate([np.zeros(delay), wave, np.zeros(100)])
    x = x*np.exp(1j*cfo*np.arange(len(x)))
    if noise: x = x + (rng.normal(size=len(x))+1j*rng.normal(size=len(x)))*noise
    res = g.demodulate(x)
    print(case, res.ok, res.reason, 'rate', res.rate_mbps, 'start', res.start, 'cfo_est', f'{res.cfo:.5f}', 'evm', f'{res.evm_db:.1f}')
