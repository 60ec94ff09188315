"""Radio manager (SoraURadio* command surface over the software front
end, _user_mode_ext.h:70-140): gain/freq/rate knobs drive the capture,
verified end to end with HwVeri measurements and the node."""

import numpy as np

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac.frame import MacHeader, append_fcs
from sora_tpu.runtime.native import RxRing
from sora_tpu.runtime.node import NodeConfig, StreamingNode, TxSink
from sora_tpu.runtime.radio import SoftRadio
from sora_tpu.util import hwveri

ADDR = b"\x02SORA1"


def _frame_air(rng, n=4, rate=12):
    pieces, psdus = [], []
    for i in range(n):
        hdr = MacHeader(addr1=ADDR, addr2=b"\x02PEER0", addr3=ADDR,
                        seq_ctrl=i << 4)
        psdu = append_fcs(hdr.pack()
                          + bytes(rng.integers(0, 256, 60, dtype=np.uint8)))
        psdus.append(psdu)
        pieces.append(np.zeros(800, np.complex64))
        pieces.append(g.modulate(psdu, rate).astype(np.complex64))
    pieces.append(np.zeros(2400, np.complex64))
    x = np.concatenate(pieces)
    return x + (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
                ).astype(np.complex64) * 0.01, psdus


def test_rx_gain_scales_capture(rng):
    r = SoftRadio()
    tone = np.exp(2j * np.pi * 0.01 * np.arange(4096)).astype(np.complex64)
    r.attach_air(tone)
    r.set_rx_gain(20.0)
    cap = r.capture()
    np.testing.assert_allclose(np.abs(cap).mean(), 10.0, rtol=1e-3)
    r.set_rx_gain(-20.0)
    np.testing.assert_allclose(np.abs(r.capture()).mean(), 0.1, rtol=1e-3)


def test_central_freq_mismatch_measured_by_hwveri():
    """A SetCentralFreq mismatch appears as the corresponding baseband
    carrier offset — recovered by HwVeri's FreqOffset measurement
    (the calibration loop the reference runs against real RF)."""
    r = SoftRadio()
    fs = 20e6
    tone = np.exp(2j * np.pi * 1e6 / fs * np.arange(1 << 15))
    r.attach_air(tone.astype(np.complex64), freq_hz=2.422e9, rate_sps=fs)
    r.set_central_freq(2.422e9 - 37e3)        # tuned 37 kHz low
    cap = r.capture()
    got = hwveri.measure_freq_offset(cap, fs, f_expected=1e6)
    assert abs(got - 37e3) < 200.0, got
    # the fine-offset knob compensates it back out
    r.set_freq_offset(37e3)
    got2 = hwveri.measure_freq_offset(r.capture(), fs, f_expected=1e6)
    assert abs(got2) < 200.0, got2


def test_sample_rate_resamples_capture():
    r = SoftRadio()
    n = 1 << 14
    tone = np.exp(2j * np.pi * 0.02 * np.arange(n)).astype(np.complex64)
    r.attach_air(tone, rate_sps=20e6)
    r.set_sample_rate(40e6)
    cap = r.capture()
    assert abs(len(cap) - 2 * n) <= 64
    rep = hwveri.sine_wave_test(cap[256:-256], 40e6)
    np.testing.assert_allclose(rep.freq_hz, 0.02 * 20e6, rtol=1e-3)


def test_radio_feeds_node_through_tuning_and_gain(rng):
    """Full loop: frames on the air, the radio captures them through a
    -20 dB gain setting and a 90 kHz tuning error, streams into the
    node's ring, and the node (AGC + CFO tracking) decodes them all."""
    air, psdus = _frame_air(rng)
    ring = RxRing(capacity=1 << 22)
    radio = SoftRadio(ring)
    radio.attach_air(air, freq_hz=2.422e9, rate_sps=20e6)
    radio.set_rx_gain(-20.0)
    radio.set_central_freq(2.422e9 + 90e3)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=128,
                     addr=ADDR, rate_mbps=None, min_rate_mbps=12)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    radio.start_rx()
    idle = 0
    while idle < 3:
        idle = 0 if node.step() else idle + 1
    node.flush()
    assert node.stats.frame_ok == len(psdus), node.report()
    radio.stop()
    ring.close()


def test_tx_gain_and_sink():
    fired = []
    r = SoftRadio()
    r.attach_tx_sink(fired.append)
    r.set_tx_gain(6.0)
    out = r.tx(np.ones(100, np.complex64))
    np.testing.assert_allclose(np.abs(out), 10 ** 0.3, rtol=1e-5)
    assert len(fired) == 1 and len(fired[0]) == 100


def test_register_file():
    r = SoftRadio()
    r.write_register(0x10, 0xDEAD)
    assert r.read_register(0x10) == 0xDEAD
    assert r.read_register(0x44) == 0


def test_channel_model_multipath_cfo_sfo_through_node(rng):
    """VERDICT r04 item 6: node-level decode through the radio path with
    a 4-tap in-CP channel, Doppler/CFO, a +20 ppm receive clock, and
    antenna noise — all installed as the radio's ChannelModel, not
    hand-applied in the test."""
    from sora_tpu.runtime.radio import ChannelModel

    air, psdus = _frame_air(rng, n=4, rate=12)
    ring = RxRing(capacity=1 << 22)
    radio = SoftRadio(ring)
    radio.attach_air(air, freq_hz=2.422e9, rate_sps=20e6)
    radio.set_channel(ChannelModel(
        taps=[(0, 1.0), (3, 0.45 * np.exp(0.9j)),
              (7, 0.2 * np.exp(-2.1j)), (11, 0.08 * np.exp(0.3j))],
        doppler_hz=55e3, sfo_ppm=20.0, noise_rms=0.01, seed=5))
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=128,
                     addr=ADDR, rate_mbps=None, min_rate_mbps=12)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    radio.start_rx()
    idle = 0
    while idle < 3:
        idle = 0 if node.step() else idle + 1
    node.flush()
    assert node.stats.frame_ok == len(psdus), node.report()
    radio.stop()
    ring.close()


def test_channel_model_mimo_mixing(rng):
    """Per-path 2x2 mixing matrices through the radio front end: the
    captured air is spatially coupled and frequency selective; the 11n
    MMSE chain undoes both."""
    import jax.numpy as jnp

    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx
    from sora_tpu.runtime.radio import ChannelModel

    psdu = append_fcs(MacHeader(addr1=ADDR).pack()
                      + bytes(rng.integers(0, 256, 120, dtype=np.uint8)))
    w = np.asarray(gn.modulate(psdu, 11))            # (2, n)
    taps = []
    for d in (0, 4, 9):
        while True:
            H = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
                 ) / (2.0 if d else np.sqrt(2.0))
            if d or abs(np.linalg.det(H)) > 0.3:
                break
        taps.append((d, H))
    radio = SoftRadio()
    radio.attach_air(w)
    radio.set_channel(ChannelModel(taps=taps, noise_rms=0.01, seed=3))
    cap = radio.capture()                            # (2, n')
    assert cap.ndim == 2 and cap.shape[0] == 2
    x = np.zeros((1, 2, cap.shape[1] + 340), np.complex64)
    x[0, :, 40: 40 + cap.shape[1]] = cap
    out = nrx.rx_pipeline(jnp.asarray(x), 11, max_psdu=256)
    assert np.asarray(out["ok"])[0]
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu


def test_channel_noise_independent_across_captures():
    """One installed ChannelModel advances its rng per capture: repeated
    captures see independent noise (correlated noise would bias PER
    measurements), while re-creating the model reproduces the run."""
    from sora_tpu.runtime.radio import ChannelModel

    tone = np.exp(2j * np.pi * 0.02 * np.arange(2048)).astype(np.complex64)
    r = SoftRadio()
    r.attach_air(tone)
    r.set_channel(ChannelModel(noise_rms=0.1, seed=4))
    c1, c2 = r.capture(), r.capture()
    assert not np.array_equal(c1, c2)
    r2 = SoftRadio()
    r2.attach_air(tone)
    r2.set_channel(ChannelModel(noise_rms=0.1, seed=4))
    np.testing.assert_array_equal(r2.capture(), c1)   # reproducible


def test_channel_mixed_scalar_and_matrix_taps(rng):
    """A scalar first tap plus a matrix echo must size the output from
    ALL taps (a_rx from the matrix), for 1-D and 2-D inputs alike."""
    from sora_tpu.runtime.radio import ChannelModel

    H = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
         ).astype(np.complex64)
    ch = ChannelModel(taps=[(0, 1.0), (3, H)])
    x2 = (rng.normal(size=(2, 256)) + 1j * rng.normal(size=(2, 256))
          ).astype(np.complex64)
    y = ch.apply(x2, 20e6)
    assert y.shape == (2, 256 + 3)
    ref = np.zeros((2, 259), np.complex64)
    ref[:, :256] += x2
    ref[:, 3:] += (H @ x2).astype(np.complex64)
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)
