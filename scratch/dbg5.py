import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
pay = raw.reshape(-1,128)[:,16:].reshape(-1)
x8 = pay.view(np.int8).astype(np.float64).reshape(-1,2)
x = x8[:,0] + 1j*x8[:,1]
print('n samples(8bit):', len(x), 'DC:', x.mean())
x = x - x.mean()
# now @40Msps, preamble doubled: find LTS via lts40 correlation
X = np.zeros(128, complex); X[SC_IDX % 128] = LTS_FREQ
lts40 = np.fft.ifft(X)*128
c = np.abs(np.correlate(x[:4000], lts40, 'valid'))
top = np.argsort(c)[-10:]; top.sort()
print('corr top:', top, (c[top]/1e3).astype(int))
p = int(top[np.argmax(c[top])])
# try spectrum at detected start
for st in [p-128, p]:
    L = np.fft.fft(x[st:st+128:2])
    vals = L[SC_IDX % 64]
    match = np.sign(vals.real)*LTS_FREQ
    print('start', st, 'sign-match:', int((match>0).sum()), '/52, mag cv:', np.std(np.abs(vals[LTS_FREQ!=0]))/np.mean(np.abs(vals[LTS_FREQ!=0])))
