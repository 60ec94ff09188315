"""Golden-model tests: decode the reference capture; TX->RX loopback.

This replicates the reference offline-replay strategy (SURVEY.md §4):
kernel/bb/demod11 loads fsample-6.dmp and requires E_ERROR_FRAME_OK
(CRC32 pass); our bar is the same plus byte-level checks.
"""

import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy import common as C


def test_capture_decodes_frame_ok(capture_20msps):
    res = g.demodulate(capture_20msps)
    assert res.ok, res.reason
    assert res.rate_mbps == 6
    assert res.length == 1392
    assert res.fcs_ok
    # data broadcast frame from the Sora test corpus
    assert res.psdu[:2] == b"\x08\x00"
    assert res.psdu[4:10] == b"\xff" * 6


def test_capture_snr_and_cfo(capture_20msps):
    res = g.demodulate(capture_20msps)
    assert abs(res.cfo) < 1e-3          # synthetic capture: no CFO
    assert res.snr_est_db > 25


@pytest.mark.parametrize("rate", [6, 9, 12, 18, 24, 36, 48, 54])
def test_loopback_all_rates(rate, rng):
    payload = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
    psdu = fr.build_data_frame(payload, seq=7)
    wave = g.modulate(psdu, rate)
    # small AWGN + CFO + delay to exercise sync
    delay = 37
    cfo = 2 * np.pi * 80e3 / 20e6       # 80 kHz
    x = np.concatenate([np.zeros(delay), wave, np.zeros(100)])
    x = x * np.exp(1j * cfo * np.arange(len(x)) + 1j * 0.7)
    x = x + (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))) * 0.02
    res = g.demodulate(x)
    assert res.ok, (rate, res.reason)
    assert res.rate_mbps == rate
    assert res.psdu == psdu


def test_loopback_bit_exact_noiseless(rng):
    psdu = fr.build_data_frame(b"hello sora-tpu", seq=1)
    wave = g.modulate(psdu, 54)
    res = g.demodulate(np.concatenate([np.zeros(20), wave, np.zeros(40)]))
    assert res.ok and res.psdu == psdu


def test_scrambler_seed_recovery():
    for seed in (1, 0x5D, 0x7F, 42):
        seq = C.scrambler_sequence(7, seed)
        assert g._seed_from_prefix(seq) == seed


def test_conv_encode_viterbi_roundtrip(rng):
    bits = rng.integers(0, 2, 500).astype(np.uint8)
    bits[-6:] = 0
    coded = g.conv_encode(bits)
    soft = (2.0 * coded - 1.0)
    dec = g.viterbi_decode(soft.reshape(-1, 2))
    assert np.array_equal(dec, bits)


@pytest.mark.parametrize("numden", [(2, 3), (3, 4)])
def test_puncture_depuncture_roundtrip(numden, rng):
    num, den = numden
    n = 18 * 20
    bits = rng.integers(0, 2, n).astype(np.uint8)
    bits[-6:] = 0
    coded = g.conv_encode(bits)
    tx = g.puncture(coded, num, den)
    soft = (2.0 * tx - 1.0)
    ab = g.depuncture(soft, num, den)
    dec = g.viterbi_decode(ab)
    assert np.array_equal(dec, bits)


def test_fcs_table_matches_zlib(rng):
    data = rng.integers(0, 256, 100, dtype=np.uint8)
    assert fr.fcs32_np(data) == fr.fcs32(data.tobytes())


def test_54mbps_40msps_dump_fixture():
    """Top-rate end-to-end coverage: a self-generated 40 Msps 64-QAM
    capture (tests/data/fsample54.dmp, 1500-byte PSDU at 54 Mbps)
    decodes through the raw-capture device front-end path — the corpus
    companion to the reference's 6 Mbps fsample-6.dmp (SURVEY §4)."""
    from sora_tpu.io.dumpfile import load_dump
    from sora_tpu.phy.dot11a import rx as jrx

    raw = load_dump("tests/data/fsample54.dmp")
    res = jrx.demodulate(raw, input_rate="40m")
    assert res.ok, res.reason
    assert res.rate_mbps == 54
    assert res.length == 1500
    # golden numpy chain agrees byte-for-byte (after host 2:1 decimation)
    import numpy as np
    x = raw.astype(np.complex128)
    x -= x.mean()
    gold = g.demodulate(x[0::2])
    assert gold.ok and gold.psdu == res.psdu
