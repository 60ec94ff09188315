import numpy as np
raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
v = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
x = v[:,0]+1j*v[:,1]; x -= x.mean()
# CP metric: corr of x[t..t+32] with x[t+128..t+160] (CP 32@40M? standard CP=0.8us=32@40M)
lag = 128; W = 32
cc = x[lag:]*np.conj(x[:-lag])
num = np.abs(np.convolve(cc, np.ones(W), 'valid'))
den = np.convolve(np.abs(x[:-lag])**2, np.ones(W), 'valid')+1e-9
m = num/den
# fold by 160 to find symbol cadence
n = (len(m)//160)*160
fold = m[:n].reshape(-1,160).mean(0)
print('fold@160 argmax', np.argmax(fold), 'max', fold.max(), 'min', fold.min())
# try cadence 80 (20Msps symbols at 40Msps?? no) and 320
for per in (80, 160, 320, 144, 176):
    n = (len(m)//per)*per
    f = m[:n].reshape(-1,per).mean(0)
    print(f'period {per}: peak-to-mean {f.max()/f.mean():.3f} argmax {np.argmax(f)}')
