"""Golden numpy 802.11n HT 2x2 model: TX/RX loopback through MIMO
channels, HT-SIG integrity, failure paths."""

import numpy as np
import pytest

from sora_tpu.golden import dot11n_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy import dot11n_common as N

MCS_LIST = [8, 9, 10, 11, 12, 13, 14, 15]


def _mimo_channel(rng, delay_spread=0):
    """Random full-rank 2x2 flat channel (unit-ish gains)."""
    while True:
        H = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))) \
            / np.sqrt(2.0)
        if abs(np.linalg.det(H)) > 0.3:
            return H


def _through(H, tx, snr_db=35, rng=None, pad=80):
    y = H @ tx
    y = np.concatenate([np.zeros((2, pad)), y, np.zeros((2, pad))], axis=1)
    if rng is not None:
        p = np.mean(np.abs(y) ** 2)
        sigma = np.sqrt(p / (10 ** (snr_db / 10) + 1e-12) / 2)
        y = y + sigma * (rng.normal(size=y.shape)
                         + 1j * rng.normal(size=y.shape))
    return y


def test_htsig_crc_roundtrip():
    b = N.htsig_bits(13, 777)
    mcs, length, ok = N.parse_htsig(b)
    assert (mcs, length, ok) == (13, 777, True)
    b2 = b.copy()
    b2[3] ^= 1
    assert not N.parse_htsig(b2)[2]


def test_ht_interleaver_is_permutation():
    for nbpsc in (1, 2, 4, 6):
        for iss in (0, 1):
            p = N.ht_interleaver_permutation(nbpsc, iss)
            assert sorted(p) == list(range(52 * nbpsc))
    # stream rotation must differ between streams
    assert not np.array_equal(N.ht_interleaver_permutation(2, 0),
                              N.ht_interleaver_permutation(2, 1))


def test_stream_parser_partition():
    idx = N.stream_parse_indices(104 * 2, 2)
    flat = np.sort(idx.reshape(-1))
    assert np.array_equal(flat, np.arange(208))


def test_puncture_56_roundtrip(rng):
    soft = rng.normal(size=240).astype(np.float64)
    coded = (soft > 0).astype(np.uint8)
    kept = g.puncture(coded, 5, 6)
    assert len(kept) == len(coded) * 6 // 10
    back = g.depuncture(soft[: len(kept)], 5, 6)
    assert back.shape == (len(coded) // 2, 2)


@pytest.mark.parametrize("mcs", MCS_LIST)
def test_loopback_identity_channel(rng, mcs):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 60,
                                                  dtype=np.uint8)), seq=1)
    tx = g.modulate(psdu, mcs)
    y = _through(np.eye(2), tx, rng=None)
    res = g.demodulate(y)
    assert res.ok, (mcs, res.reason)
    assert res.mcs == mcs and res.psdu == psdu


@pytest.mark.parametrize("mcs", [8, 11, 13, 15])
def test_loopback_random_mimo_channel(rng, mcs):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 80,
                                                  dtype=np.uint8)), seq=2)
    tx = g.modulate(psdu, mcs)
    H = _mimo_channel(rng)
    y = _through(H, tx, snr_db=35, rng=rng)
    res = g.demodulate(y)
    assert res.ok, (mcs, res.reason)
    assert res.psdu == psdu


def test_noise_rejected(rng):
    y = (rng.normal(size=(2, 4000)) + 1j * rng.normal(size=(2, 4000)))
    res = g.demodulate(y)
    assert not res.ok


def test_truncated(rng):
    psdu = fr.build_data_frame(b"x" * 200, seq=3)
    tx = g.modulate(psdu, 8)
    y = _through(np.eye(2), tx)[:, :1400]
    res = g.demodulate(y)
    assert not res.ok
    assert res.reason in ("truncated", "htsig_fail", "plcp_header_fail",
                          "no_frame")


def test_golden_1ss_and_sgi_roundtrip(rng):
    """Golden oracle handles single-stream MCS 0-7 (MRC over RX
    antennas, even a single one) and the short guard interval, routed
    by the parsed HT-SIG."""
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 70,
                                                  dtype=np.uint8)), seq=7)
    h = np.array([[0.9 + 0.2j], [0.4 - 0.7j]])
    for sgi in (False, True):
        for mcs in (2, 6):
            y = h @ g.modulate(psdu, mcs, short_gi=sgi)
            x = np.zeros((2, y.shape[1] + 200), np.complex128)
            x[:, 40: 40 + y.shape[1]] = y
            x += (rng.normal(size=x.shape)
                  + 1j * rng.normal(size=x.shape)) * 0.005
            res = g.demodulate(x)
            assert res.ok and res.mcs == mcs, (mcs, sgi, res.reason)
            assert res.psdu == psdu
    # 2-stream short GI
    H = np.array([[1.0, 0.3 + 0.4j], [0.2 - 0.5j, 0.9]])
    y = H @ g.modulate(psdu, 12, short_gi=True)
    x = np.zeros((2, y.shape[1] + 200), np.complex128)
    x[:, 40: 40 + y.shape[1]] = y
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)) * 0.005
    res = g.demodulate(x)
    assert res.ok and res.mcs == 12 and res.psdu == psdu
    # a single RX antenna suffices for the single-stream set
    w = g.modulate(psdu, 4)
    res1 = g.demodulate(np.asarray(w) + (rng.normal(size=w.shape)
                                         + 1j * rng.normal(size=w.shape)
                                         ) * 0.004)
    assert res1.ok and res1.psdu == psdu
