import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = (x[:,0] + 1j*x[:,1]); x -= x.mean()
Xk = np.zeros(64, complex); Xk[SC_IDX % 64] = LTS_FREQ
occ = Xk != 0
# channel est from LTS1 at 384 (40M)
L1 = np.fft.fft(x[384:512:2]); L2 = np.fft.fft(x[512:640:2])
H = np.where(occ, (L1+L2)/2/np.where(occ, Xk, 1), 0)
h = np.fft.ifft(np.where(occ, H, 0))
print('|h| first 16:', np.round(np.abs(h[:16])/1000,1))
print('|h| last 8:', np.round(np.abs(h[-8:])/1000,1))
# try SIGNAL at various offsets
best = None
for off in range(600, 720, 2):
    S = np.fft.fft(x[off+32: off+160: 2][:64]) if False else np.fft.fft(x[off+32:off+32+128:2])
    E = np.where(occ, S/np.where(occ, H, 1), 0)
    d = E[DATA_SC % 64]
    # normalize avg amplitude
    d = d/np.mean(np.abs(d))
    evm = np.mean(np.abs(d - np.sign(d.real))**2)
    if best is None or evm < best[1]: best = (off, evm)
print('best SIGNAL sym start(40M):', best)
off = best[0]
S = np.fft.fft(x[off+32:off+32+128:2])
E = np.where(occ, S/np.where(occ,H,1), 0)
d = E[DATA_SC%64]; d/=np.mean(np.abs(d))
print('equalized first 12:', np.round(d[:12],2))
