import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = (x[:,0] + 1j*x[:,1])
print('DC:', x.mean())
for ph in (0,1):
    y = (x - x.mean())[ph::2]
    L = np.fft.fft(y[192:256])
    mag = np.abs(L)
    print('phase', ph, 'spectrum bins 0..31:', np.round(mag[:32]/1000).astype(int))
    print('         bins 32..63:', np.round(mag[32:]/1000).astype(int))
# also look at full 40Msps: 128-pt FFT at 384
y40 = x - x.mean()
L = np.fft.fft(y40[384:384+128])
print('40Msps 128pt |FFT| bins:', np.round(np.abs(L)/1000).astype(int))
# period check: is STS region periodic 32 at 40M?
seg = y40[:320]
print('period32 corr:', np.abs(np.sum(seg[32:]*np.conj(seg[:-32])))/np.sum(np.abs(seg[:-32])**2))
print('period16 corr:', np.abs(np.sum(seg[16:]*np.conj(seg[:-16])))/np.sum(np.abs(seg[:-16])**2))
