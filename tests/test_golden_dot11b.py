"""802.11b golden model: loopback at all DSSS rates."""

import numpy as np
import pytest

from sora_tpu.golden import dot11b_np as b
from sora_tpu.mac import frame as fr
from sora_tpu.phy import dot11b_common as B


@pytest.mark.parametrize("rate", [1, 2, 5.5, 11])
def test_loopback(rate, rng):
    payload = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    psdu = fr.build_data_frame(payload, seq=3)
    chips = b.modulate(psdu, rate)
    x = np.concatenate([np.zeros(23), chips, np.zeros(30)])
    x = x * np.exp(1j * 0.6)            # arbitrary phase
    x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))) * 0.05
    res = b.demodulate(x)
    assert res.ok, (rate, res.reason)
    assert res.rate_mbps == rate
    assert res.psdu == psdu


def test_loopback_oversampled(rng):
    psdu = fr.build_data_frame(b"eleven megabit cck frame", seq=1)
    chips = b.modulate(psdu, 11)
    x2 = np.repeat(chips, 2)            # crude 2x oversample
    x2 = np.concatenate([np.zeros(31), x2])
    res = b.demodulate(x2, oversample=2)
    assert res.ok, res.reason
    assert res.psdu == psdu


def test_scrambler_self_sync(rng):
    bits = rng.integers(0, 2, 200).astype(np.uint8)
    tx = B.scramble_11b(bits, 0x6C)
    rx = B.descramble_11b(tx, 0x6C)
    assert np.array_equal(rx, bits)
    # self-sync: wrong RX seed still correct after 7 bits
    rx2 = B.descramble_11b(tx, 0)
    assert np.array_equal(rx2[7:], bits[7:])


def test_cck_codebook_unit_power():
    for book in (B.cck11_codebook(), B.cck55_codebook()):
        np.testing.assert_allclose(np.abs(book), 1.0, atol=1e-12)
    # codewords are distinct
    bk = B.cck11_codebook()
    g = bk @ bk.conj().T
    off = np.abs(g - np.diag(np.diag(g)))
    assert off.max() < 8.0 - 1e-9       # none identical


def test_golden_short_preamble_roundtrip(rng):
    """Golden oracle handles the short-preamble format both ways
    (Clause 18.2.5; preamble_type 1 of PHY_11b.hpp:26)."""
    for rate in (2, 5.5, 11):
        psdu = fr.build_data_frame(bytes(rng.integers(
            0, 256, 50, dtype=np.uint8)), seq=int(2 * rate))
        w = b.modulate(psdu, rate, preamble="short")
        x = np.concatenate([np.zeros(70), w, np.zeros(70)])
        x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
              ) * 0.01
        res = b.demodulate(x)
        assert res.ok and res.rate_mbps == rate, (rate, res.reason)
        assert res.psdu == psdu
