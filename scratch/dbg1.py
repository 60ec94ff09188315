import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = (x[:,0] + 1j*x[:,1]); x -= x.mean()
x20 = x[0::2]
lts1 = 192
y = x20[lts1:]
L1 = np.fft.fft(y[:64]); L2 = np.fft.fft(y[64:128])
print('LTS repeat diff (should be tiny):', np.abs(L1-L2).max()/np.abs(L1).max())
Lavg = (L1+L2)/2
Xk = np.zeros(64, complex); Xk[SC_IDX % 64] = LTS_FREQ
H = np.where(Xk!=0, Lavg/np.where(Xk==0,1,Xk), 0)
print('|H| on data carriers:', np.round(np.abs(H[DATA_SC%64]),0)[:10])
s = y[128+16:128+80]
S = np.fft.fft(s)
E = np.where(Xk!=0, S/np.where(np.abs(H)<1e-9,1,H), 0)
pv = E[PILOT_SC%64]
print('pilots raw:', np.round(pv,2))
d = E[DATA_SC%64]
print('SIGNAL data carriers (first 12):', np.round(d[:12],2))
print('real sign pattern:', (d.real>0).astype(int))
print('imag/real ratio:', np.abs(d.imag).mean()/np.abs(d.real).mean())
