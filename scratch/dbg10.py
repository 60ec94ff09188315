import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
v = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.int64).reshape(-1,2)
v14 = ((v & 0x3FFF) ^ 0x2000) - 0x2000
x = v14[:,0].astype(float) + 1j*v14[:,1].astype(float)
print('mean', x.mean(), 'max|x|', np.abs(x).max())
L1 = np.fft.fft(x[384:512:2]); 
Xk = np.zeros(64,complex); Xk[SC_IDX%64]=LTS_FREQ; occ=Xk!=0
mag = np.abs(L1[occ])
print('LTS flatness cv:', mag.std()/mag.mean())
print('sign match:', int(((np.sign(L1[SC_IDX%64].real)*LTS_FREQ)>0).sum()), '/52')
