"""Native host runtime: dump parsing parity, ring semantics, replay."""

import time

import numpy as np
import pytest

from sora_tpu.io.dumpfile import load_dump
from sora_tpu.runtime import native

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
