import numpy as np
from rx11a import *
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
v = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
I, Q = v[:,0], v[:,1]
Xk = np.zeros(64, complex); Xk[SC_IDX%64] = LTS_FREQ; occ = Xk!=0
variants = {
 'I+jQ': I+1j*Q, 'Q+jI': Q+1j*I, 'I-jQ': I-1j*Q, 'Q-jI': Q-1j*I,
 '-I+jQ': -I+1j*Q, '-Q+jI': -Q+1j*I,
}
for name, x in variants.items():
    x = x - x.mean()
    L1 = np.fft.fft(x[384:512:2]); L2 = np.fft.fft(x[512:640:2])
    Hm = np.abs(L1[occ])
    cv = Hm.std()/Hm.mean()
    # also try reversed spectrum mapping (fft->ifft convention): use ifft
    L1r = np.fft.ifft(x[384:512:2])*64
    cvr = np.abs(L1r[occ]).std()/np.abs(L1r[occ]).mean()
    print(f'{name:6s} cv_fft={cv:.3f} cv_ifft={cvr:.3f}')
