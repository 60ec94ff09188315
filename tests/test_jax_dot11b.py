"""JAX 802.11b device chain: TX parity vs golden, RX loopback, failure
paths.  (Reference test model: demod11 -11b mod/demod loopback,
SURVEY.md §4.2.)"""

import numpy as np
import pytest

import jax.numpy as jnp

from sora_tpu.golden import dot11b_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy import dot11b_common as B
from sora_tpu.phy.dot11b import rx as jrx
from sora_tpu.phy.dot11b import tx as jtx

RATES = [1, 2, 5.5, 11]


def _frames(rng, n, payload_len):
    return [fr.build_data_frame(bytes(rng.integers(0, 256, payload_len,
                                                   dtype=np.uint8)), seq=i)
            for i in range(n)]


def test_scrambler_impulse_response_is_127_periodic():
    hp = jtx._impulse_response_period()
    assert hp.shape == (127,)
    # golden check: scramble an impulse with zero seed
    imp = np.zeros(254, np.uint8)
    imp[0] = 1
    ref = B.scramble_11b(imp, seed=0)
    assert np.array_equal(ref[:127], hp)
    assert np.array_equal(ref[127:], hp)


@pytest.mark.parametrize("seed", [0x6C, 0x00, 0x7F, 0x35])
def test_scramble_tx_matches_golden(rng, seed):
    bits = rng.integers(0, 2, (3, 400)).astype(np.uint8)
    dev = np.asarray(jtx.scramble_tx(jnp.asarray(bits), seed))
    for i in range(3):
        assert np.array_equal(dev[i], B.scramble_11b(bits[i], seed)), i


@pytest.mark.parametrize("rate", RATES)
def test_tx_matches_golden_model(rng, rate):
    psdus = _frames(rng, 2, 40)
    arr = np.stack([np.frombuffer(p, np.uint8) for p in psdus])
    wave = np.asarray(jtx.modulate(jnp.asarray(arr), rate, arr.shape[1]))
    for i, p in enumerate(psdus):
        ref = g.modulate(p, rate)
        assert wave.shape[1] == len(ref)
        assert np.allclose(wave[i], ref, atol=2e-3), rate


@pytest.mark.parametrize("rate", RATES)
def test_rx_loopback_batched(rng, rate):
    n_frames, payload = 4, 36
    psdus = _frames(rng, n_frames, payload)
    plen = len(psdus[0])
    nchips = jtx.waveform_len(rate, plen) + 300
    x = np.zeros((n_frames, nchips), np.complex64)
    for i, p in enumerate(psdus):
        w = g.modulate(p, rate).astype(np.complex64)
        x[i, 40 + 3 * i: 40 + 3 * i + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)) \
        .astype(np.complex64) * 0.02
    out = jrx.rx_pipeline(jnp.asarray(x), rate, max_psdu=plen)
    ok = np.asarray(out["ok"])
    assert ok.all(), (rate, ok, np.asarray(out["plcp_ok"]),
                      np.asarray(out["sig_rate_ok"]),
                      np.asarray(out["fcs_ok"]))
    psdu = np.asarray(out["psdu"])
    length = np.asarray(out["length"])
    for i, p in enumerate(psdus):
        assert length[i] == plen
        assert bytes(psdu[i][:plen]) == p, (rate, i)


def test_rx_auto_rate_dispatch(rng):
    psdu = fr.build_data_frame(b"hello 11b world", seq=9)
    for rate in RATES:
        w = g.modulate(psdu, rate)
        x = np.concatenate([np.zeros(50), w, np.zeros(100)])
        res = jrx.demodulate(x.astype(np.complex64), max_psdu=64)
        assert res.ok and res.rate_mbps == rate, (rate, res.reason)
        assert res.psdu == psdu


def test_rx_noise_rejected(rng):
    x = (rng.normal(size=4000) + 1j * rng.normal(size=4000))
    res = jrx.demodulate(x.astype(np.complex64), max_psdu=64)
    assert not res.ok
    assert res.reason in ("plcp_header_fail", "no_frame", "crc32_fail")


def test_rx_wrong_static_rate_flagged(rng):
    psdu = fr.build_data_frame(b"rate mismatch", seq=1)
    w = g.modulate(psdu, 2).astype(np.complex64)
    x = np.concatenate([np.zeros(30, np.complex64), w])[None, :]
    out = jrx.rx_pipeline(jnp.asarray(x), 11, max_psdu=64)
    assert not np.asarray(out["ok"])[0]
    assert not np.asarray(out["sig_rate_ok"])[0]
    assert np.asarray(out["plcp_ok"])[0]          # header still parses


def test_rx_pipeline_auto_mixed_rates(rng):
    """One jit program decodes a batch mixing all four DSSS rates
    (TBB11bRxRateSel parity, PHY_11b.hpp:378-463)."""
    psdus = _frames(rng, 4, 36)
    plen = len(psdus[0])
    nchips = max(jtx.waveform_len(r, plen) for r in RATES) + 300
    x = np.zeros((4, nchips), np.complex64)
    for i, (p, rate) in enumerate(zip(psdus, RATES)):
        w = g.modulate(p, rate).astype(np.complex64)
        x[i, 40 + 5 * i: 40 + 5 * i + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)) \
        .astype(np.complex64) * 0.02
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=plen)
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["plcp_ok"]))
    assert np.allclose(np.asarray(out["rate_mbps"]), RATES)
    psdu = np.asarray(out["psdu"])
    length = np.asarray(out["length"])
    for i, p in enumerate(psdus):
        assert length[i] == plen
        assert bytes(psdu[i][:plen]) == p, i


def test_rx_pipeline_auto_noise_rejected(rng):
    x = (rng.normal(size=(2, 4000)) + 1j * rng.normal(size=(2, 4000)))
    out = jrx.rx_pipeline_auto(jnp.asarray(x.astype(np.complex64)),
                               max_psdu=64)
    assert not np.asarray(out["ok"]).any()


def test_sfd_rejects_garbage_prefix_alias(rng):
    """Early timing lock decodes a few noise symbols ahead of the sync;
    a spurious 16-bit SFD alias in that garbage must not hijack the
    first-hit selection (regression: bench batch offset pattern lost
    ~3% of CCK frames to this)."""
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 972,
                                                  dtype=np.uint8)), seq=2)
    wave = g.modulate(psdu, 11).astype(np.complex64)
    B, N = 128, len(wave) + 400
    x = np.zeros((B, N), np.complex64)
    for i in range(B):
        x[i, 30 + (7 * i) % 300:][: len(wave)] = wave
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=1024)
    assert int(np.asarray(out["ok"]).sum()) == B


# =============================================================================
# Short-preamble PLCP (Clause 18.2.5; preamble_type 1, PHY_11b.hpp:26)
# =============================================================================


@pytest.mark.parametrize("rate", [2, 5.5, 11])
def test_jax_tx_short_preamble_matches_golden(rate, rng):
    psdu = _frames(rng, 1, 32)[0]
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    wj = np.asarray(jtx.modulate(jnp.asarray(arr), rate, len(psdu),
                                 preamble="short"))[0]
    wg = g.modulate(psdu, rate, preamble="short")
    assert len(wj) == len(wg) == jtx.waveform_len(rate, len(psdu),
                                                  preamble="short")
    # short PLCP is 96 symbols (56+16 at 1 Mbps + 24 at 2 Mbps) vs 192
    assert len(wg) < len(g.modulate(psdu, rate))
    np.testing.assert_allclose(wj, wg, atol=2e-3)


@pytest.mark.parametrize("rate", [2, 5.5, 11])
def test_short_preamble_loopback(rate, rng):
    psdu = _frames(rng, 1, 40)[0]
    w = g.modulate(psdu, rate, preamble="short").astype(np.complex64)
    x = np.zeros((1, len(w) + 400), np.complex64)
    x[0, 60: 60 + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=len(psdu))
    assert np.asarray(out["ok"])[0], (np.asarray(out["plcp_ok"]),
                                      np.asarray(out["signal"]))
    assert np.asarray(out["preamble"])[0] == 1
    assert float(np.asarray(out["rate_mbps"])[0]) == rate
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu
    # fixed-rate pipeline handles it too
    out2 = jrx.rx_pipeline(jnp.asarray(x), rate, max_psdu=len(psdu))
    assert np.asarray(out2["ok"])[0]


def test_mixed_long_short_batch(rng):
    """A batch mixing long- and short-preamble frames (and rates) decodes
    in the ONE auto jit program, preamble flagged per frame."""
    psdus = _frames(rng, 4, 36)
    plen = len(psdus[0])
    specs = [(2, "long"), (2, "short"), (11, "long"), (11, "short")]
    waves = [g.modulate(p, r, preamble=pre).astype(np.complex64)
             for p, (r, pre) in zip(psdus, specs)]
    N = max(len(w) for w in waves) + 300
    x = np.zeros((4, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 40 + 5 * i: 40 + 5 * i + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=plen)
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["plcp_ok"]),
                      np.asarray(out["preamble"]))
    assert list(np.asarray(out["preamble"])) == [0, 1, 0, 1]
    assert np.allclose(np.asarray(out["rate_mbps"]), [2, 2, 11, 11])
    psdu = np.asarray(out["psdu"])
    for i, p in enumerate(psdus):
        assert bytes(psdu[i][:plen]) == p, i


def test_short_preamble_demodulate(rng):
    psdu = _frames(rng, 1, 48)[0]
    w = g.modulate(psdu, 5.5, preamble="short").astype(np.complex64)
    x = np.concatenate([np.zeros(80), w, np.zeros(80)]).astype(
        np.complex64)
    res = jrx.demodulate(x)
    assert res.ok, res.reason
    assert res.rate_mbps == 5.5 and res.psdu == psdu


def test_short_preamble_rejects_1mbps():
    with pytest.raises(ValueError):
        g.modulate(b"\x00" * 20, 1, preamble="short")
