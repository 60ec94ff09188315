import numpy as np
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = x[:,0] + 1j*x[:,1]
N = len(x)
# remove DC
print('DC', x.mean())
xd = x - x.mean()
p = np.abs(xd)**2
w = np.convolve(p, np.ones(160)/160, 'same')
print('power: min %.3g max %.3g median %.3g' % (w.min(), w.max(), np.median(w)))
# lag-32 autocorrelation (STS period at 40Msps) normalized
lag = 32
c = xd[lag:]*np.conj(xd[:-lag])
cw = np.convolve(c, np.ones(160), 'same')
ew = np.convolve(p, np.ones(160), 'same')
m = np.abs(cw)/(ew[:len(cw)]+1e-9)
hi = m > 0.85
runs = np.flatnonzero(np.diff(hi.astype(int)))
print('high-m regions (start,end):')
st = None
for i,r in enumerate(runs[:40]):
    pass
# simpler: segment
idx = np.flatnonzero(hi)
if len(idx):
    splits = np.split(idx, np.flatnonzero(np.diff(idx)>1)+1)
    for s in splits[:20]:
        if len(s)>100: print('  STS-like at', s[0], '..', s[-1], 'len', len(s))
