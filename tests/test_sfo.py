"""Sample-clock offset (SFO / timing-drift) loopback tests.

The reference survives real ±20 ppm sample clocks because TPilotTrack
corrects a per-subcarrier phase RAMP every symbol, not just a common phase
(kernel/bb/Brick11/src/pilot.hpp:123-270).  These tests resample the TX
waveform by 1 ± 20e-6 — an MTU-size 6 Mbps frame then drifts ~1.4 samples
over its 3.4 ms, multiple radians at the edge subcarriers — and require
FCS-ok decodes at every 11a rate and every 11n MCS.
"""

import numpy as np
import pytest

from sora_tpu.mac import frame as fr
from sora_tpu.phy import common as C
from sora_tpu.phy import dot11n_common as NC

MTU_PAYLOAD = 2472            # 24 hdr + payload + 4 FCS = 2500 = MAX_PSDU


def sfo_resample(w: np.ndarray, ppm: float, taps: int = 64) -> np.ndarray:
    """Resample a waveform as received by a clock off by ``ppm`` parts per
    million.  Windowed-sinc interpolation: the edge OFDM subcarriers sit at
    0.81 Nyquist, where linear interpolation would add ~-20 dB images and
    mask the effect under test."""
    ratio = 1.0 + ppm * 1e-6
    m = int(len(w) * ratio)
    t = np.arange(m) / ratio
    i0 = np.floor(t).astype(np.int64)
    frac = (t - i0)[:, None]
    k = np.arange(-taps // 2 + 1, taps // 2 + 1)[None, :]
    d = k - frac
    h = np.sinc(d) * np.cos(np.pi * d / taps) ** 2
    h /= h.sum(axis=1, keepdims=True)
    wp = np.pad(w, (taps, taps))
    return (wp[i0[:, None] + k + taps] * h).sum(axis=1).astype(
        np.complex64)


def _noisy(x: np.ndarray, snr_db: float, rng) -> np.ndarray:
    sig_p = float(np.mean(np.abs(x[np.abs(x) > 0]) ** 2))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr_db / 10.0)))
    return (x + sigma * (rng.normal(size=x.shape)
                         + 1j * rng.normal(size=x.shape))).astype(
        np.complex64)


@pytest.mark.parametrize("ppm", [20.0, -20.0])
def test_sfo_11a_all_rates_mtu(ppm, rng):
    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.golden import dot11a_np as g

    rates = sorted(C.RATES)                     # all 8
    psdu = fr.build_data_frame(
        bytes(rng.integers(0, 256, MTU_PAYLOAD, dtype=np.uint8)), seq=1)
    waves = [sfo_resample(g.modulate(psdu, r).astype(np.complex64), ppm)
             for r in rates]
    N = max(len(w) for w in waves) + 400
    x = np.zeros((len(rates), N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 60: 60 + len(w)] = w
    # a real clock offset comes with a proportional carrier offset too
    cfo = 2 * np.pi * (5.24e9 * ppm * 1e-6) / 20e6
    x = x * np.exp(1j * cfo * np.arange(N))
    x = _noisy(x, 30.0, rng)
    import jax.numpy as jnp
    out = jrx.rx_pipeline_auto(jnp.asarray(x))
    ok = np.asarray(out["ok"])
    got = np.asarray(out["rate_mbps"])
    assert ok.all(), (f"ppm={ppm}: rates {np.asarray(rates)[ok == 0]} "
                      f"failed (parsed {got[ok == 0]})")
    assert (got == np.asarray(rates)).all()


@pytest.mark.parametrize("ppm", [20.0, -20.0])
def test_sfo_11n_all_mcs_mtu(ppm, rng):
    from sora_tpu.phy.dot11n import rx as nrx
    from sora_tpu.phy.dot11n import tx as ntx

    mcs_list = sorted(NC.MCS)                   # 8..15
    psdu = fr.build_data_frame(
        bytes(rng.integers(0, 256, MTU_PAYLOAD, dtype=np.uint8)), seq=2)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    waves = [np.asarray(ntx.modulate(arr, m, len(psdu)))[0]
             for m in mcs_list]
    N = max(w.shape[-1] for w in waves) + 400
    x = np.zeros((len(mcs_list), 2, N), np.complex64)
    for i, w in enumerate(waves):
        for a in range(2):
            r = sfo_resample(w[a].astype(np.complex64), ppm)
            x[i, a, 60: 60 + len(r)] = r
    cfo = 2 * np.pi * (5.24e9 * ppm * 1e-6) / 20e6
    x = x * np.exp(1j * cfo * np.arange(N))
    x = _noisy(x, 33.0, rng)
    import jax.numpy as jnp
    out = nrx.rx_pipeline_auto(jnp.asarray(x))
    ok = np.asarray(out["ok"])
    got = np.asarray(out["mcs"])
    assert ok.all(), (f"ppm={ppm}: mcs {np.asarray(mcs_list)[ok == 0]} "
                      f"failed (parsed {got[ok == 0]})")


def test_sfo_without_slope_tracking_is_needed(rng):
    """Guard that the scenario is actually hard: with the slope correction
    disabled (slope forced to zero via a tiny monkeypatch), the MTU 6 Mbps
    frame at +20 ppm must FAIL — proving the tracker is load-bearing."""
    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.golden import dot11a_np as g
    import jax.numpy as jnp

    psdu = fr.build_data_frame(
        bytes(rng.integers(0, 256, MTU_PAYLOAD, dtype=np.uint8)), seq=3)
    w = sfo_resample(g.modulate(psdu, 6).astype(np.complex64), 20.0)
    x = np.zeros((1, len(w) + 200), np.complex64)
    x[0, 60: 60 + len(w)] = w
    x = _noisy(x, 30.0, rng)

    orig = jrx._pilot_slope
    try:
        jrx._pilot_slope = lambda pv, window=8: jnp.zeros(pv.shape[:2],
                                                          jnp.float32)
        jrx.extract_symbols.clear_cache()
        jrx.rx_pipeline.clear_cache()
        out = jrx.rx_pipeline(jnp.asarray(x), 6)
        assert not np.asarray(out["ok"])[0], \
            "+20 ppm MTU@6Mbps decoded without slope tracking?!"
    finally:
        jrx._pilot_slope = orig
        jrx.extract_symbols.clear_cache()
        jrx.rx_pipeline.clear_cache()
    out = jrx.rx_pipeline(jnp.asarray(x), 6)
    assert np.asarray(out["ok"])[0]
