"""Native host runtime: dump parsing parity, ring semantics, replay."""

import time

import numpy as np
import pytest

from sora_tpu.io.dumpfile import load_dump
from sora_tpu.runtime import native
from sora_tpu.runtime.native import RxRing

CAPTURE = "/root/reference/kernel/test-data/fsample-6.dmp"


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


def test_parse_dump_matches_python(lib):
    a = native.parse_dump(CAPTURE)
    b = load_dump(CAPTURE)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_ring_roundtrip(lib, rng):
    ring = native.RxRing(capacity=1 << 12)
    vs = ring.alloc_vstream()
    x = (rng.normal(size=1000) + 1j * rng.normal(size=1000)
         ).astype(np.complex64)
    ring.write(x)
    assert ring.available(vs) == 1000
    got = ring.read(vs, 1000)
    np.testing.assert_array_equal(got, x)
    assert ring.available(vs) == 0
    ring.close()


def test_ring_multi_reader_and_overrun(lib, rng):
    ring = native.RxRing(capacity=256)
    v0 = ring.alloc_vstream()
    v1 = ring.alloc_vstream()
    x = (np.arange(1000) + 0j).astype(np.complex64)
    ring.write(x)
    # both readers see the stream independently; capacity 256 -> older
    # samples were overwritten and count as drops
    a = ring.read(v0, 4096)
    b = ring.read(v1, 4096)
    assert len(a) == 256 and len(b) == 256
    np.testing.assert_array_equal(a, x[-256:])
    np.testing.assert_array_equal(b, x[-256:])
    assert ring.drops(v0) == 1000 - 256
    ring.close()


def test_replay_paced(lib):
    ring = native.RxRing(capacity=1 << 16)
    vs = ring.alloc_vstream()
    x = (np.ones(50000) + 0j).astype(np.complex64)
    t0 = time.monotonic()
    ring.start_replay(x, rate_sps=1e6)        # 50 ms of samples
    got = 0
    while got < 50000 and time.monotonic() - t0 < 5.0:
        got += len(ring.read(vs, 8192))
        time.sleep(0.002)
    dt = time.monotonic() - t0
    ring.stop()
    ring.close()
    assert got == 50000
    assert dt >= 0.04                          # pacing actually paced


def test_monotonic_ns(lib):
    a = native.monotonic_ns()
    b = native.monotonic_ns()
    assert b >= a


def test_ring_read_windows_overlap_and_quantize():
    """The native windowed reader: overlapping windows assembled straight
    from the ring with gain + saturation, overlap retained in the ring
    (no carry), cursor advancing by hop*batch."""
    from sora_tpu.util.xfer import I16_SCALE

    ring = RxRing(capacity=1 << 16)
    vs = ring.alloc_vstream()
    n = 4096
    x = (np.arange(n) % 97 / 97.0 - 0.5) + 1j * (np.arange(n) % 31 / 31.0)
    ring.write(x.astype(np.complex64))
    window, hop, batch = 1024, 768, 4
    total = window + hop * (batch - 1)
    assert ring.read_windows(vs, window, hop, batch + 8, 1.0) is None
    out = ring.read_windows(vs, window, hop, batch, I16_SCALE)
    assert out is not None
    arr, start = out
    assert start == 0 and arr.shape == (batch, window, 2)
    for b in range(batch):
        ref = x[b * hop: b * hop + window]
        got = (arr[b, :, 0] + 1j * arr[b, :, 1]) / I16_SCALE
        np.testing.assert_allclose(got, ref, atol=1.5 / I16_SCALE)
    # cursor advanced by hop*batch: the overlap region is re-readable
    assert ring.available(vs) == n - hop * batch
    nxt = ring.read_windows(vs, window, hop, 1, I16_SCALE)
    assert nxt is not None
    arr2, start2 = nxt
    assert start2 == hop * batch
    np.testing.assert_allclose(
        (arr2[0, :, 0] + 1j * arr2[0, :, 1]) / I16_SCALE,
        x[hop * batch: hop * batch + window], atol=1.5 / I16_SCALE)
    ring.close()


def test_ring_read_windows_i8_saturates():
    from sora_tpu.util.xfer import I8_SCALE

    ring = RxRing(capacity=1 << 14)
    vs = ring.alloc_vstream()
    x = np.full(2048, 100.0 + 0j, np.complex64)   # way past full scale
    x[100] = 0.5 + 0.25j
    ring.write(x)
    arr, start = ring.read_windows(vs, 1024, 1024, 2, I8_SCALE,
                                   dtype=np.int8)
    assert arr.dtype == np.int8
    assert arr[0, 0, 0] == 127                    # saturated, not wrapped
    assert arr[0, 100, 0] == int(0.5 * I8_SCALE)
    ring.close()


def test_ring_read_windows_span_over_capacity_raises():
    import pytest as _pytest

    ring = RxRing(capacity=1 << 12)
    vs = ring.alloc_vstream()
    with _pytest.raises(ValueError):
        ring.read_windows(vs, 1 << 12, 1 << 11, 8, 1.0)
    ring.close()
