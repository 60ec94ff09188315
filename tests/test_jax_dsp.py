"""JAX DSP kernels vs numpy golden oracles."""

import numpy as np
import pytest

from sora_tpu.dsp import crc as dcrc
from sora_tpu.dsp import fft as dfft
from sora_tpu.dsp import filters as df
from sora_tpu.dsp import mapping as dmap
from sora_tpu.dsp import scramble as dscr
from sora_tpu.dsp import viterbi as dvit
from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy import common as C


def test_dft_matches_numpy(rng):
    x = (rng.normal(size=(5, 64)) + 1j * rng.normal(size=(5, 64))).astype(
        np.complex64)
    np.testing.assert_allclose(
        np.asarray(dfft.fft64(x)), np.fft.fft(x, axis=-1),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dfft.ifft64(x)), np.fft.ifft(x, axis=-1),
        rtol=1e-3, atol=1e-5)


def test_conv_encode_matches_golden(rng):
    bits = rng.integers(0, 2, (3, 100)).astype(np.uint8)
    got = np.asarray(dvit.encode(bits))
    for i in range(3):
        want = g.conv_encode(bits[i])
        assert np.array_equal(got[i], want)


def test_viterbi_decode_roundtrip(rng):
    bits = rng.integers(0, 2, (4, 300)).astype(np.uint8)
    bits[:, -6:] = 0
    coded = np.stack([g.conv_encode(b) for b in bits])
    soft = (2.0 * coded - 1.0).reshape(4, 300, 2).astype(np.float32)
    dec = np.asarray(dvit.decode(soft, terminated=True))
    assert np.array_equal(dec, bits)


def test_viterbi_decode_noisy_matches_golden(rng):
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    bits[-6:] = 0
    coded = g.conv_encode(bits)
    soft = (2.0 * coded - 1.0) + rng.normal(size=len(coded)) * 0.7
    want = g.viterbi_decode(soft.reshape(-1, 2))
    got = np.asarray(dvit.decode(
        soft.reshape(1, -1, 2).astype(np.float32), terminated=True))[0]
    # both must recover the data (oracle agreement on decoded bits)
    assert np.array_equal(got, want)


def test_viterbi_blocks_matches_sequential(rng):
    bits = rng.integers(0, 2, (2, 2000)).astype(np.uint8)
    bits[:, -6:] = 0
    coded = np.stack([g.conv_encode(b) for b in bits])
    soft = ((2.0 * coded - 1.0)
            + rng.normal(size=coded.shape) * 0.45).astype(np.float32)
    sab = soft.reshape(2, 2000, 2)
    seq = np.asarray(dvit.decode(sab, terminated=True))
    blk = np.asarray(dvit.decode_blocks(sab, block=256, overlap=96,
                                        terminated=True))
    assert np.array_equal(seq, blk)
    assert np.array_equal(seq, bits)


def test_scramble_sequence_matches_golden():
    for seed in (1, 9, 0x5D, 0x7F):
        want = C.scrambler_sequence(300, seed)
        got = np.asarray(dscr.sequence(300, seed))
        assert np.array_equal(got, want), seed
        assert int(dscr.seed_from_prefix(want[:7].astype(np.uint8))) == seed


def test_mapping_roundtrip(rng):
    for mod in ("bpsk", "qpsk", "qam16", "qam64"):
        n = dmap.NBPSC[mod] * 48
        bits = rng.integers(0, 2, (2, n)).astype(np.uint8)
        sym = np.asarray(dmap.map_bits(bits, mod))
        want = np.stack([C.map_bits(b, mod) for b in bits])
        np.testing.assert_allclose(sym, want, atol=1e-6)
        soft = np.asarray(dmap.demap_soft(sym, mod))
        assert np.array_equal((soft > 0).astype(np.uint8), bits)


def test_crc32_matches_zlib(rng):
    data = rng.integers(0, 256, 257, dtype=np.uint8)
    assert int(dcrc.crc32_bytes(data)) == fr.fcs32(data.tobytes())


def test_crc32_batch_masked(rng):
    data = rng.integers(0, 256, (3, 64), dtype=np.uint8)
    lengths = np.array([10, 64, 0])
    got = np.asarray(dcrc.crc32_batch(data, lengths))
    assert int(got[0]) == fr.fcs32(data[0, :10].tobytes())
    assert int(got[1]) == fr.fcs32(data[1].tobytes())
    assert int(got[2]) == fr.fcs32(b"")


def test_correlate_variants_agree(rng):
    x = (rng.normal(size=(2, 300)) + 1j * rng.normal(size=(2, 300))
         ).astype(np.complex64)
    p = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex64)
    a = np.asarray(df.correlate(x, p))
    b = np.asarray(df.correlate_stream(x, p))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
    want = np.stack([np.correlate(x[i], p, "valid") for i in range(2)])
    np.testing.assert_allclose(a, want, rtol=1e-3, atol=1e-3)


def test_moving_sum(rng):
    x = rng.normal(size=(2, 50)).astype(np.float32)
    got = np.asarray(df.moving_sum(x, 8))
    want = np.stack([np.convolve(x[i], np.ones(8), "valid")
                     for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
