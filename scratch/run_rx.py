import numpy as np
from rx11a import rx
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
v = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.int64).reshape(-1,2)
v14 = ((v & 0x3FFF) ^ 0x2000) - 0x2000
x = v14[:,0].astype(float) + 1j*v14[:,1].astype(float)
x -= x.mean()
rx(x[0::2])
