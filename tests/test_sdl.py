"""SDL convenience layer (kernel/sdl analogue): Signal value type +
RAII Radio over the node runtime."""

import numpy as np

from sora_tpu.sdl import Radio, Signal

ADDR = b"\x02SORA1"
PEER = b"\x02PEER0"


def test_signal_dump_roundtrip(tmp_path, rng):
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
         ).astype(np.complex64) * 0.3
    s = Signal(x, 40e6)
    p = str(tmp_path / "sig.dmp")
    s.to_dump(p)
    back = Signal.from_dump(p, 40e6)
    assert len(back) >= len(s)
    # the dump stores auto-scaled integer I/Q: compare up to gain
    a, b = back.samples[: len(s)], x
    rho = np.vdot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(rho) > 0.9999


def test_signal_resample_and_spectrum(rng):
    n = 8192
    tone = np.exp(2j * np.pi * 2e6 / 20e6 * np.arange(n)
                  ).astype(np.complex64)
    s = Signal(tone, 20e6)
    up = s.resample(40e6)
    assert up.sample_rate == 40e6 and len(up) == 2 * n
    freqs, pdb = up.spectrum(nfft=512)
    assert abs(freqs[int(np.argmax(pdb))] - 2e6) < 1e5
    assert s.snr_db() > 35


def test_radio_loopback_rx(rng):
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.mac.frame import MacHeader, append_fcs

    with Radio(phy="a", window=4096, batch=2, overlap=2816,
               max_psdu=128, min_rate_mbps=12) as r:
        hdr = MacHeader(addr1=ADDR, addr2=PEER, addr3=ADDR, seq_ctrl=16)
        psdu = append_fcs(hdr.pack() + b"sdl radio payload")
        w = g.modulate(psdu, 12).astype(np.complex64)
        air = np.concatenate([np.zeros(500, np.complex64), w,
                              np.zeros(4096, np.complex64)])
        air += (rng.normal(size=len(air)) + 1j * rng.normal(size=len(air))
                ).astype(np.complex64) * 0.01
        r.inject(air)
        got = list(r.rx(seconds=5.0))
        assert got == [(PEER, b"sdl radio payload")]
        assert r.stats.frame_ok == 1
