import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = (x[:,0] + 1j*x[:,1]) - (8068.527243759958+8014.311630377058j)
# 40Msps LTS: 64 subcarriers in 128-bin FFT
X = np.zeros(128, complex)
X[SC_IDX % 128] = LTS_FREQ
lts40 = np.fft.ifft(X)*128
c = np.abs(np.correlate(x[:3000], lts40, 'valid'))
top = np.argsort(c)[-10:]; top.sort()
print('lts40 corr top idx:', top, (c[top]/1e6).astype(int))
# per-sample period-32 metric to find STS end
lag=32; W=64
cc = x[lag:]*np.conj(x[:-lag])
m = np.abs(np.convolve(cc, np.ones(W),'valid'))/ (np.convolve(np.abs(x[:-lag])**2, np.ones(W),'valid')+1e-9)
drop = np.flatnonzero(m[:1000] < 0.5)
print('period32 metric first drop below 0.5 at', drop[:5] if len(drop) else 'none')
# where does ANY strong 64-sample repetition @20M occur? lag-128 @40M (LTS repeat)
lag=128; W=128
cc = x[lag:]*np.conj(x[:-lag])
m2 = np.abs(np.convolve(cc, np.ones(W),'valid'))/(np.convolve(np.abs(x[:-lag])**2, np.ones(W),'valid')+1e-9)
hi = np.flatnonzero(m2[:2000] > 0.98)
print('lag128 repeat regions:', hi[:5], '...', hi[-5:] if len(hi) else '')
