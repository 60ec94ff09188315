import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = (x[:,0] + 1j*x[:,1])
x = x - x.mean()
L = np.fft.fft(x[384:512:2])
# per-bin: value at SC_IDX
vals = L[SC_IDX % 64]
print('bin  lts  fftval')
for sc, ref, v in zip(SC_IDX, LTS_FREQ, vals):
    print(f'{sc:4d} {ref:3d} {v.real/1000:8.1f} {v.imag/1000:+8.1f}')
