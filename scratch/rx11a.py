"""Prototype numpy 802.11a receiver — decode fsample-6.dmp end to end."""
import numpy as np

# ---------------- constants (IEEE 802.11-2007 Clause 17) ----------------
# Frequency-domain LTS on subcarriers -26..26 (DC=0)
LTS_FREQ = np.array([
    1, 1,-1,-1, 1, 1,-1, 1,-1, 1, 1, 1, 1, 1, 1,-1,-1, 1, 1,-1, 1,-1, 1, 1, 1, 1,  # -26..-1
    0,
    1,-1,-1, 1, 1,-1, 1,-1, 1,-1,-1,-1,-1,-1, 1, 1,-1,-1, 1,-1, 1,-1, 1, 1, 1, 1]) # 1..26
SC_IDX = np.arange(-26, 27)          # 53 subcarriers
PILOT_SC = np.array([-21, -7, 7, 21])
DATA_SC = np.array([s for s in SC_IDX if s != 0 and s not in PILOT_SC])  # 48
PILOT_VAL = np.array([1, 1, 1, -1])  # pilot polarity per subcarrier (times p_n)

# pilot polarity sequence p_0..p_126 (cyclic)
_P = "1111 1111 1111 1-11 -1-11 11-11 ..."  # generate from scrambler instead

def pilot_polarity():
    # p_n is the 127-length scrambler output sequence with all-ones seed, mapped 0->1,1->-1?
    # Standard: p_{0..126} cyclic from scrambler seq with seed all ones: s_i in {0,1}, p = 1-2*s
    seq = scrambler_seq(127, seed=0b1111111)
    return 1 - 2*seq.astype(int)

def scrambler_seq(n, seed):
    s = [(seed >> i) & 1 for i in range(7)]  # s[0]=x1 ... s[6]=x7
    out = np.zeros(n, np.uint8)
    x = list(s)
    # state bits x1..x7, feedback = x7 xor x4
    for i in range(n):
        fb = x[6] ^ x[3]
        out[i] = fb
        x = [fb] + x[:6]
    return out

RATE_BITS = {0b1101: (6, 'BPSK', 1, 2), 0b1111: (9, 'BPSK', 1, 4),
             0b0101: (12, 'QPSK', 2, 2), 0b0111: (18, 'QPSK', 2, 4),
             0b1001: (24, '16QAM', 4, 2), 0b1011: (36, '16QAM', 4, 4),
             0b0001: (48, '64QAM', 6, 3), 0b0011: (54, '64QAM', 6, 4)}
# (mbps, mod, bits/carrier, rate-denominator marker: 2 => 1/2, 4 => 3/4, 3 => 2/3)

def lts_time():
    X = np.zeros(64, complex)
    X[SC_IDX % 64] = LTS_FREQ
    return np.fft.ifft(X) * 64 / np.sqrt(52)  # scaling irrelevant for sync

# ---------------- Viterbi (K=7, g=133,171 octal) ----------------
G0, G1 = 0o133, 0o171
def conv_outputs():
    # for each state (6 bits of history) and input bit: outputs
    outA = np.zeros((64, 2), np.uint8); outB = np.zeros((64, 2), np.uint8)
    nxt = np.zeros((64, 2), np.uint16)
    for s in range(64):
        for b in (0, 1):
            reg = (b << 6) | s  # shift register: newest bit at MSB? define: r = [b, s5..s0]
            # use convention: output = parity(g & reg_bits) with reg = b s5 s4 s3 s2 s1 s0
            oA = bin(reg & G0).count('1') & 1
            oB = bin(reg & G1).count('1') & 1
            outA[s, b] = oA; outB[s, b] = oB
            nxt[s, b] = (reg >> 1)  # new state drops oldest bit
    return outA, outB, nxt
OUT_A, OUT_B, NEXT_S = conv_outputs()

def conv_encode(bits):
    st = 0
    out = np.zeros(2*len(bits), np.uint8)
    for i, b in enumerate(bits):
        out[2*i] = OUT_A[st, b]; out[2*i+1] = OUT_B[st, b]
        st = NEXT_S[st, b]
    return out

def viterbi_decode(llrA, llrB):
    """Soft Viterbi. llrA/llrB: per-step metric for coded bits (positive => bit 1).
    Returns decoded bits."""
    n = len(llrA)
    INF = 1e18
    pm = np.full(64, INF); pm[0] = 0.0
    prev = np.zeros((n, 64), np.uint8)   # which input bit led to state
    prevstate = np.zeros((n, 64), np.int8)
    # Precompute predecessor: state s has preds p0,p1 with input bit b where NEXT_S[p,b]==s
    preds = [[] for _ in range(64)]
    for p in range(64):
        for b in (0, 1):
            preds[NEXT_S[p, b]].append((p, b))
    preds = np.array(preds)  # (64,2,2)
    for t in range(n):
        bm = np.zeros((64, 2))
        # branch metric for transition from p with bit b: cost of emitting OUT_A/OUT_B
        # metric: -llr if bit==1 else +llr (minimize)
        a, bmetB = llrA[t], llrB[t]
        costA = np.where(OUT_A == 1, -a, a)   # (64,2) indexed by [p,b]
        costB = np.where(OUT_B == 1, -bmetB, bmetB)
        tot = costA + costB
        npm = np.full(64, INF); pb = np.zeros(64, np.uint8); ps = np.zeros(64, np.int16)
        for s in range(64):
            (p0, b0), (p1, b1) = preds[s]
            c0 = pm[p0] + tot[p0, b0]
            c1 = pm[p1] + tot[p1, b1]
            if c0 <= c1: npm[s] = c0; pb[s] = b0; ps[s] = p0
            else:        npm[s] = c1; pb[s] = b1; ps[s] = p1
        pm = npm - npm.min()
        prev[t] = pb; prevstate[t] = ps.astype(np.int8)
    # traceback from best state
    s = int(np.argmin(pm))
    bits = np.zeros(n, np.uint8)
    for t in range(n-1, -1, -1):
        bits[t] = prev[t, s]
        s = prevstate[t, s]
    return bits

# ---------------- interleaver ----------------
def interleave_perm(ncbps, nbpsc):
    s = max(nbpsc // 2, 1)
    k = np.arange(ncbps)
    i = (ncbps // 16) * (k % 16) + k // 16
    j = s * (i // s) + (i + ncbps - (16 * i // ncbps)) % s
    # k -> j mapping: bit k goes to position j
    perm = np.zeros(ncbps, int); perm[k] = j
    return perm  # interleaved[perm[k]] = coded[k]

def deinterleave(bits, ncbps, nbpsc):
    perm = interleave_perm(ncbps, nbpsc)
    out = np.zeros_like(bits)
    out[np.arange(ncbps)] = bits[perm]
    return out

# ---------------- demap ----------------
def demap_soft(sym, mod):
    """Return LLR-ish soft values per bit (positive => bit 1), Gray-coded per standard."""
    I, Q = sym.real, sym.imag
    if mod == 'BPSK':
        return I[:, None]
    if mod == 'QPSK':
        return np.stack([I, Q], -1) * np.sqrt(2)
    if mod == '16QAM':
        f = np.sqrt(10)
        b0 = I; b1 = 2/f - np.abs(I); b2 = Q; b3 = 2/f - np.abs(Q)
        return np.stack([b0, b1, b2, b3], -1) * f
    if mod == '64QAM':
        f = np.sqrt(42)
        b0 = I; b1 = 4/f - np.abs(I); b2 = 2/f - np.abs(np.abs(I) - 4/f)
        b3 = Q; b4 = 4/f - np.abs(Q); b5 = 2/f - np.abs(np.abs(Q) - 4/f)
        return np.stack([b0, b1, b2, b3, b4, b5], -1) * f
    raise ValueError(mod)

# ---------------- CRC32 (FCS) ----------------
def crc32(data):
    import zlib
    return zlib.crc32(bytes(data)) & 0xffffffff

# ---------------- receiver ----------------
def rx(x20, verbose=True):
    lts = lts_time()
    # cross-correlate to find LTS
    n = min(len(x20), 4000)
    c = np.abs(np.correlate(x20[:n], lts, 'valid'))
    # two peaks 64 apart
    pk = np.argsort(c)[-8:]
    pk.sort()
    if verbose: print('LTS corr peaks:', pk, c[pk].astype(int))
    # find pair (i, i+64)
    best = None
    for i in pk:
        if c[i] > 0.5*c.max():
            for j in pk:
                if abs(j - i - 64) <= 1 and c[j] > 0.5*c.max():
                    best = i
    lts1 = best
    if verbose: print('LTS1 at', lts1)
    # fine CFO from the two LTS repeats
    a = x20[lts1:lts1+64]; b = x20[lts1+64:lts1+128]
    cfo = np.angle(np.vdot(a, b)) / 64   # rad/sample
    if verbose: print('fine CFO rad/sample', cfo, '=> kHz @20Msps', cfo/(2*np.pi)*20e6/1e3)
    # apply CFO correction to everything from lts1 on
    ncomp = len(x20) - lts1
    y = x20[lts1:] * np.exp(-1j*cfo*np.arange(ncomp))
    # channel estimate
    L1 = np.fft.fft(y[:64]); L2 = np.fft.fft(y[64:128])
    Lavg = (L1 + L2)/2
    Xk = np.zeros(64, complex); Xk[SC_IDX % 64] = LTS_FREQ
    H = np.where(Xk != 0, Lavg / np.where(Xk == 0, 1, Xk), 0)
    # SIGNAL symbol: starts at lts1+128, CP 16
    pol = pilot_polarity()
    def demod_sym(k, nsym_idx):
        s = y[128 + 80*k + 16 : 128 + 80*k + 80]
        S = np.fft.fft(s)
        E = np.where(Xk != 0, S / np.where(np.abs(H) < 1e-9, 1, H), 0)
        # pilot phase track
        p = pol[nsym_idx % 127]
        pv = E[PILOT_SC % 64] * (PILOT_VAL * p)
        ph = np.angle(pv.sum())
        E = E * np.exp(-1j*ph)
        return E[DATA_SC % 64]
    # SIGNAL
    d = demod_sym(0, 1)  # SIGNAL symbol uses p_1? Actually SIGNAL is symbol index n=0 in pilot seq
    d0 = demod_sym(0, 0)
    for trial, dd in (('n=0', d0), ('n=1', d)):
        soft = demap_soft(dd, 'BPSK').reshape(-1)
        de = deinterleave(soft, 48, 1)
        bits = viterbi_decode(de[0::2], de[1::2])
        rate_b = int(''.join(map(str, bits[:4])), 2)
        parity_ok = bits[:17].sum() % 2 == bits[17]
        length = int(''.join(map(str, bits[5:17][::-1])), 2)
        if verbose: print(trial, 'SIGNAL bits', bits[:24], 'rate code', bin(rate_b), 'len', length, 'parity ok', parity_ok)
        if parity_ok and rate_b in RATE_BITS:
            break
    nsym_off = 0 if trial == 'n=0' else 1
    mbps, mod, nbpsc, rden = RATE_BITS[rate_b]
    ncbps = 48*nbpsc
    ndbps = {2: ncbps//2, 3: ncbps*2//3, 4: ncbps*3//4}[rden]
    nsym = int(np.ceil((16 + 8*length + 6) / ndbps))
    if verbose: print(f'rate {mbps} Mbps mod {mod} ndbps {ndbps} nsym {nsym}')
    # data symbols
    softs = []
    for k in range(1, nsym+1):
        dk = demod_sym(k, k + nsym_off)
        softs.append(demap_soft(dk, mod).reshape(-1))
    soft = np.concatenate(softs)
    # deinterleave per symbol
    de = np.concatenate([deinterleave(soft[i*ncbps:(i+1)*ncbps], ncbps, nbpsc) for i in range(nsym)])
    # depuncture
    if rden == 2:
        A, B = de[0::2], de[1::2]
    elif rden == 4:  # 3/4: pattern per 6 coded bits <- 4.5? standard: period 18 coded -> 12
        # punctured stream order: A0 B0 A1 B2 A3 B3 ... pattern A:110 B:101
        nA = []
        full = []
        i = 0
        # reconstruct: for every 3 input bit-pairs (A,B), transmitted are A0,B0,A1,B2
        blocks = de.reshape(-1, 6) if len(de) % 6 == 0 else None
        out = np.zeros((len(de)//4, 6))
        g = de.reshape(-1, 4)
        out[:, 0] = g[:, 0]; out[:, 1] = g[:, 1]  # A0 B0
        out[:, 2] = g[:, 2]; out[:, 3] = 0        # A1, B1 punct
        out[:, 4] = 0;       out[:, 5] = g[:, 3]  # A2 punct, B2
        flat = out.reshape(-1)
        A, B = flat[0::2], flat[1::2]
    elif rden == 3:  # 2/3: A:11 B:10 -> transmitted A0 B0 A1
        g = de.reshape(-1, 3)
        out = np.zeros((len(de)//3, 4))
        out[:, 0] = g[:, 0]; out[:, 1] = g[:, 1]; out[:, 2] = g[:, 2]; out[:, 3] = 0
        flat = out.reshape(-1)
        A, B = flat[0::2], flat[1::2]
    bits = viterbi_decode(A, B)
    # descramble: first 7 bits of SERVICE are zero -> scrambled = seed seq
    # find seed: descrambled[i] = bits[i] ^ seq[i]; we know descrambled[0:7]==0
    # scrambler seq from seed s: generate and xor
    # brute force 127 seeds
    for seed in range(1, 128):
        seq = scrambler_seq(len(bits), seed)
        d = bits ^ seq
        if d[:9].sum() == 0:  # SERVICE field 16 zero bits scrambled: first 7 determine seed
            desc = d
            break
    psdu_bits = desc[16:16+8*length]
    by = np.packbits(psdu_bits.reshape(-1, 8)[:, ::-1], axis=1).reshape(-1)  # LSB-first per byte
    fcs = crc32(by[:-4])
    rx_fcs = int.from_bytes(bytes(by[-4:]), 'little')
    ok = fcs == rx_fcs
    print('payload len', length, 'FCS ok:', ok, hex(fcs), hex(rx_fcs))
    if verbose: print('first bytes:', bytes(by[:32]).hex())
    return ok, by

if __name__ == '__main__':
    raw = np.fromfile('/root/reference/kernel/test-data/fsample-6.dmp', dtype=np.uint8)
    x = raw.reshape(-1,128)[:,16:].reshape(-1).view('<i2').astype(np.float64).reshape(-1,2)
    x = (x[:,0] + 1j*x[:,1])
    x -= x.mean()
    x20 = x[0::2]  # downsample 40->20 Msps, even phase
    rx(x20)
