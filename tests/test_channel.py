"""Frequency-selective (multipath) channel loopbacks.

The reference runs over real dispersive air; its per-subcarrier
equalization (TChannelEqualization, channel_11a.hpp:534-613) and 2x2
MIMO inversion are what make that work.  Every other test here is
AWGN/flat — these put delay spread (within the 16-sample CP), phase
rotation per tap, CFO and sample-clock offset on together.
"""

import numpy as np
import pytest

from sora_tpu.mac import frame as fr
from sora_tpu.phy import common as C


def _multipath(rng, w, taps):
    """Apply an explicit complex FIR channel [(delay, coeff), ...]."""
    n = len(w) + max(d for d, _ in taps)
    y = np.zeros(n, np.complex128)
    for d, c in taps:
        y[d: d + len(w)] += c * w
    return y.astype(np.complex64)


TAPS = [(0, 1.0), (3, 0.45 * np.exp(0.9j)), (7, 0.2 * np.exp(-2.1j)),
        (11, 0.08 * np.exp(0.3j))]


@pytest.mark.parametrize("rate", [6, 12, 24, 54])
def test_11a_multipath_loopback(rate, rng):
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.phy.dot11a import rx as jrx
    import jax.numpy as jnp

    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 200,
                                                  dtype=np.uint8)), seq=1)
    w = _multipath(rng, g.modulate(psdu, rate), TAPS)
    x = np.zeros((1, len(w) + 300), np.complex64)
    x[0, 50: 50 + len(w)] = w
    x = x * np.exp(1j * 2 * np.pi * 80e3 / 20e6 * np.arange(x.shape[1]))
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = jrx.rx_pipeline(jnp.asarray(x), rate, max_psdu=256)
    assert np.asarray(out["ok"])[0], (rate, np.asarray(out["sig_ok"]))
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu


def test_11a_multipath_plus_sfo(rng):
    """Dispersive channel AND a +20 ppm sample clock on a long frame:
    channel equalization and pilot slope tracking must compose."""
    import sys
    sys.path.insert(0, "tests")
    from test_sfo import sfo_resample
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.phy.dot11a import rx as jrx
    import jax.numpy as jnp

    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 1200,
                                                  dtype=np.uint8)), seq=2)
    w = _multipath(rng, g.modulate(psdu, 12), TAPS)
    w = sfo_resample(w, 20.0)
    x = np.zeros((1, len(w) + 300), np.complex64)
    x[0, 60: 60 + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = jrx.rx_pipeline(jnp.asarray(x), 12, max_psdu=1280)
    assert np.asarray(out["ok"])[0]
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu


@pytest.mark.parametrize("mcs", [9, 13])
def test_11n_mimo_multipath_loopback(mcs, rng):
    """Per-path 2x2 mixing matrices: the channel is genuinely
    frequency-selective AND spatially coupled; the per-subcarrier 2x2 ZF
    inversion must undo both."""
    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx
    import jax.numpy as jnp

    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 140,
                                                  dtype=np.uint8)), seq=3)
    w = np.asarray(gn.modulate(psdu, mcs))           # (2, n)
    delays = [0, 4, 9]
    n = w.shape[1] + max(delays)
    y = np.zeros((2, n), np.complex128)
    for d in delays:
        while True:
            H = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
                 ) / (2.0 if d else np.sqrt(2.0))
            if d or abs(np.linalg.det(H)) > 0.3:
                break
        y[:, d: d + w.shape[1]] += H @ w
    x = np.zeros((1, 2, n + 300), np.complex64)
    x[0, :, 40: 40 + n] = y
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = nrx.rx_pipeline(jnp.asarray(x), mcs, max_psdu=256)
    assert np.asarray(out["ok"])[0], (mcs, np.asarray(out["sig_ok"]))
    nn = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:nn]) == psdu


def test_11b_two_ray_loopback(rng):
    """DSSS with a short echo (inside the 11-chip Barker span): the
    correlator's processing gain absorbs it, as the reference's matched
    filter chain does."""
    from sora_tpu.golden import dot11b_np as gb
    from sora_tpu.phy.dot11b import rx as brx
    import jax.numpy as jnp

    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 60,
                                                  dtype=np.uint8)), seq=4)
    w = _multipath(rng, gb.modulate(psdu, 2), [(0, 1.0),
                                               (2, 0.25 * np.exp(1.1j))])
    x = np.zeros((1, len(w) + 400), np.complex64)
    x[0, 60: 60 + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = brx.rx_pipeline_auto(jnp.asarray(x), max_psdu=len(psdu))
    assert np.asarray(out["ok"])[0]
    nn = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:nn]) == psdu
