import numpy as np
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
blocks = raw.reshape(-1, 128)[:, 16:]            # strip 16B descriptor
iq = blocks.reshape(-1).view('<i2').astype(np.float64).reshape(-1, 2)
x = iq[:,0] + 1j*iq[:,1]
print('nsamples', len(x), 'max', np.abs(x).max(), 'mean |x|', np.abs(x).mean())
# power profile
p = np.abs(x)**2
w = np.convolve(p, np.ones(80)/80, 'same')
thr = w.max()/10
above = w > thr
edges = np.flatnonzero(np.diff(above.astype(int)))
print('power max', w.max(), 'edges (first 20):', edges[:20])
# downsample by 2 like reference (40->20Msps): which phase?
for ph in (0,1):
    y = x[ph::2]
    # lag-16 autocorr over first region after first rising edge
    s = edges[0]//2 if len(edges) else 0
    seg = y[s:s+400]
    ac = np.abs(np.sum(seg[16:300]*np.conj(seg[:284])))
    en = np.sum(np.abs(seg[16:300])**2)
    print('phase', ph, 'start', s, 'ac/en', ac/en)
