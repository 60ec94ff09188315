"""JAX 802.11a chain tests: capture decode, loopback vs golden model."""

import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy.dot11a import rx as jrx
from sora_tpu.phy.dot11a import tx as jtx


def test_jax_rx_decodes_capture(capture_20msps):
    res = jrx.demodulate(capture_20msps.astype(np.complex64))
    assert res.ok, res.reason
    assert res.rate_mbps == 6
    assert res.length == 1392
    # byte-identical to the golden model's decode
    gold = g.demodulate(capture_20msps)
    assert res.psdu == gold.psdu


def test_jax_rx_decodes_raw_capture():
    """Raw 40 Msps dump payload straight into the chain: the DC removal and
    2:1 decimation run on device (phy.frontend), no host preprocessing."""
    from sora_tpu.io.dumpfile import load_dump
    from tests.conftest import CAPTURE

    raw = load_dump(CAPTURE)                       # untouched 40 Msps
    res = jrx.demodulate(raw, input_rate="40m")
    assert res.ok, res.reason
    assert res.rate_mbps == 6
    assert res.length == 1392
    gold = g.demodulate(np.asarray(raw, np.complex128)[0::2]
                        - np.mean(raw))
    assert res.psdu == gold.psdu


@pytest.mark.parametrize("rate", [6, 12, 24, 54])
def test_jax_tx_matches_golden(rate, rng):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 60,
                                                  dtype=np.uint8)), seq=2)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    wave_j = np.asarray(jtx.modulate(arr, rate, len(psdu)))[0]
    wave_g = g.modulate(psdu, rate)
    assert wave_j.shape[0] == len(wave_g)
    np.testing.assert_allclose(wave_j, wave_g, atol=2e-3)


@pytest.mark.parametrize("rate", [6, 9, 12, 18, 24, 36, 48, 54])
def test_jax_loopback(rate, rng):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 120,
                                                  dtype=np.uint8)), seq=5)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    wave = np.asarray(jtx.modulate(arr, rate, len(psdu)))[0]
    x = np.concatenate([np.zeros(50), wave, np.zeros(80)]).astype(
        np.complex64)
    cfo = 2 * np.pi * 113e3 / 20e6
    x = x * np.exp(1j * cfo * np.arange(len(x)) + 0.3j)
    x = x + (rng.normal(size=len(x))
             + 1j * rng.normal(size=len(x))).astype(np.complex64) * 0.03
    res = jrx.demodulate(x, expect_rate=rate)
    assert res.ok, (rate, res.reason)
    assert res.psdu == psdu


def test_jax_rx_rejects_noise(rng):
    noise = (rng.normal(size=6000)
             + 1j * rng.normal(size=6000)).astype(np.complex64)
    res = jrx.demodulate(noise)
    assert not res.ok


def test_jax_batched_pipeline(rng):
    """The throughput path: B streams decoded in one batched pass."""
    B, rate = 4, 24
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 90,
                                                    dtype=np.uint8)), seq=i)
             for i in range(B)]
    arr = np.stack([np.frombuffer(p, np.uint8) for p in psdus])
    waves = np.asarray(jtx.modulate(arr, rate, arr.shape[1]))
    N = waves.shape[1] + 120
    x = np.zeros((B, N), np.complex64)
    for i in range(B):
        off = 11 * i
        x[i, off: off + waves.shape[1]] = waves[i]
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    import jax.numpy as jnp
    lts1, cfo, det = jrx.synchronize(jnp.asarray(x))
    nsym = jrx.max_symbols(jrx.C.RATES[rate])
    eq, snr = jrx.extract_symbols(jnp.asarray(x), lts1, cfo, nsym)
    rate_bits, length, ok = jrx.decode_signal(eq[:, 0, :])
    assert bool(ok.all())
    assert np.all(np.asarray(length) == arr.shape[1])
    psdu, fcs_ok, _ = jrx.decode_data(eq[:, 1:, :],
                                      length.astype(jnp.int32), rate)
    assert bool(fcs_ok.all())
    got = np.asarray(psdu)
    for i in range(B):
        assert bytes(got[i][: arr.shape[1]]) == psdus[i]


def test_mixed_rate_batch_auto_dispatch(rng):
    """All eight rates in ONE batch through one jit program — the batched
    TBB11aRxRateSel analogue (PHY_11a.hpp:704-814)."""
    import jax.numpy as jnp

    rates = [6, 9, 12, 18, 24, 36, 48, 54]
    psdus, waves = [], []
    for i, rate in enumerate(rates):
        psdu = fr.build_data_frame(bytes(rng.integers(
            0, 256, 60 + 10 * i, dtype=np.uint8)), seq=i)
        psdus.append(psdu)
        waves.append(g.modulate(psdu, rate).astype(np.complex64))
    N = max(len(w) for w in waves) + 256
    x = np.zeros((len(rates), N), np.complex64)
    for i, w in enumerate(waves):
        off = 40 + 13 * i
        x[i, off: off + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=256)
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["rate_mbps"]),
                      np.asarray(out["length"]))
    assert list(np.asarray(out["rate_mbps"])) == rates
    got = np.asarray(out["psdu"])
    for i, psdu in enumerate(psdus):
        assert bytes(got[i][: len(psdu)]) == psdu


def test_auto_dispatch_rejects_noise(rng):
    import jax.numpy as jnp

    noise = (rng.normal(size=(2, 4096))
             + 1j * rng.normal(size=(2, 4096))).astype(np.complex64)
    out = jrx.rx_pipeline_auto(jnp.asarray(noise), max_psdu=256)
    assert not np.asarray(out["ok"]).any()
    assert not np.asarray(out["cs_ok"]).any()


def test_rx_auto_multi_frame_per_window(rng):
    """n_frames>1 decodes several back-to-back frames from ONE stream —
    the re-arming RX loop of the reference (mac.cpp:190-280)."""

    rates = [54, 24, 6]
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 40,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(3)]
    waves = [g.modulate(p, r).astype(np.complex64)
             for p, r in zip(psdus, rates)]
    gap = 60                              # less than any sane hop
    x = np.zeros((1, 8192), np.complex64)
    off = 30
    starts = []
    for w in waves:
        x[0, off: off + len(w)] = w
        starts.append(off)
        off += len(w) + gap
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    import jax.numpy as jnp
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=256, n_frames=4)
    ok = np.asarray(out["ok"])
    assert ok.sum() == 3, (ok, np.asarray(out["det"]))
    got_rates = [int(r) for r, o in zip(np.asarray(out["rate_mbps"]), ok)
                 if o]
    assert got_rates == rates
    psdu = np.asarray(out["psdu"])
    length = np.asarray(out["length"])
    hits = np.flatnonzero(ok)
    for i, k in enumerate(hits):
        assert bytes(psdu[k][:length[k]]) == psdus[i]
    # 4th candidate is empty air
    assert not ok[3]


def test_rx_auto_candidate_compaction(rng):
    """n_decode compacts the candidate set: 3 real frames in a 4-stream x
    4-candidate batch decode through 8 decode slots, with ``src`` mapping
    each slot back to its (stream, onset) candidate row."""
    import jax.numpy as jnp

    rates = [54, 12, 6]
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 40,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(3)]
    waves = [g.modulate(p, r).astype(np.complex64)
             for p, r in zip(psdus, rates)]
    x = np.zeros((4, 8192), np.complex64)
    x[0, 30: 30 + len(waves[0])] = waves[0]          # stream 0: 1 frame
    x[2, 100: 100 + len(waves[1])] = waves[1]        # stream 2: 2 frames
    off2 = 100 + len(waves[1]) + 70
    x[2, off2: off2 + len(waves[2])] = waves[2]
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=256, n_frames=4,
                               n_decode=8)
    ok = np.asarray(out["ok"])
    src = np.asarray(out["src"])
    assert len(ok) == 8 and len(src) == 8
    assert ok.sum() == 3, (ok, np.asarray(out["det"]))
    hits = np.flatnonzero(ok)
    got = {}
    for k in hits:
        stream, slot = int(src[k]) // 4, int(src[k]) % 4
        n = int(np.asarray(out["length"])[k])
        got[(stream, slot)] = (int(np.asarray(out["rate_mbps"])[k]),
                               bytes(np.asarray(out["psdu"])[k][:n]))
    assert got == {(0, 0): (54, psdus[0]), (2, 0): (12, psdus[1]),
                   (2, 1): (6, psdus[2])}


def test_rx_auto_multi_mixed_snr(rng):
    """A weak (~4 dB, det below the old hard-coded 0.75 bar) and a strong
    frame share one window: with detect_threshold plumbed through
    synchronize_multi, BOTH decode at the node default threshold."""
    import jax.numpy as jnp

    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 40,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(2)]
    strong = g.modulate(psdus[0], 6).astype(np.complex64)
    weak = g.modulate(psdus[1], 6).astype(np.complex64)
    sig_p = float(np.mean(np.abs(weak) ** 2))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (4.0 / 10.0)))   # weak at ~4 dB
    x = np.zeros((1, 8192), np.complex64)
    x[0, 30: 30 + len(strong)] = strong * np.sqrt(10.0)   # ~14 dB
    off = 30 + len(strong) + 80
    x[0, off: off + len(weak)] = weak
    x += sigma * (rng.normal(size=x.shape)
                  + 1j * rng.normal(size=x.shape)).astype(np.complex64)
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=256, n_frames=3)
    ok = np.asarray(out["ok"])
    det = np.asarray(out["det"])
    assert ok[0] and ok[1], (ok, det)
    assert det[1] < 0.75, f"weak det {det[1]} not weak enough to prove " \
        "the threshold is config-driven"
    got = np.asarray(out["psdu"])
    length = np.asarray(out["length"])
    assert bytes(got[0][:length[0]]) == psdus[0]
    assert bytes(got[1][:length[1]]) == psdus[1]


def test_signal_ml_matches_viterbi(rng):
    """The codebook-matmul SIGNAL decode is exact ML over the valid
    message set: on decodable frames it agrees with the sequential
    Viterbi decode field-for-field; on noise it rejects."""
    import jax.numpy as jnp

    rates = [6, 9, 12, 18, 24, 36, 48, 54]
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 40 + 9 * i,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(8)]
    waves = [g.modulate(p, r).astype(np.complex64)
             for p, r in zip(psdus, rates)]
    N = max(len(w) for w in waves) + 200
    x = np.zeros((8, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 40: 40 + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.05
    lts1, cfo, det = jrx.synchronize(jnp.asarray(x))
    eq, _ = jrx.extract_symbols(jnp.asarray(x), lts1, cfo, 0)
    rb1, ln1, ok1 = (np.asarray(v) for v in
                     jrx.decode_signal(eq[:, 0, :]))
    rb2, ln2, ok2 = (np.asarray(v) for v in
                     jrx.decode_signal_viterbi(eq[:, 0, :]))
    assert ok1.all() and ok2.all()
    assert (rb1 == rb2).all() and (ln1 == ln2).all()
    noise = (rng.normal(size=(16, 48))
             + 1j * rng.normal(size=(16, 48))).astype(np.complex64)
    _, _, okn = jrx.decode_signal(jnp.asarray(noise))
    assert not np.asarray(okn).any()
