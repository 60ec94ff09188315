import numpy as np
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
v = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = v[:,0]+1j*v[:,1]
A,B,C = x[256:384], x[384:512], x[512:640]
print('max|A-B|', np.abs(A-B).max(), 'max|B-C|', np.abs(B-C).max())
d32 = np.abs(x[32:704]-x[:672])
# find where period-32 holds exactly
ok = d32 < 1e-9
runs = np.flatnonzero(np.diff(ok.astype(int)))
print('period32 exact-equality transitions at x-index:', runs[:12]+32)
print('period128 exact check around boundaries:')
d128 = np.abs(x[128:1000]-x[:872])
ok128 = d128 < 1e-9
tr = np.flatnonzero(np.diff(ok128.astype(int)))
print('  transitions at', tr[:12]+128)
