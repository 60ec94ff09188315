"""Soft-MAC: CSMA/CA data+ACK exchange over the virtual air, mgmt frames,
signal cache, FSM helper.  PHY = golden numpy 802.11a chain at 6 Mbps."""

import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import mgmt
from sora_tpu.mac.csma import SignalCache, SoftMac, run_air
from sora_tpu.mac.fsm import Fsm
from sora_tpu.runtime.air import VirtualAir

A1 = b"\x02\x00\x00\x00\x00\x01"
A2 = b"\x02\x00\x00\x00\x00\x02"


def _phy():
    return (lambda psdu, rate: g.modulate(psdu, rate).astype(np.complex64),
            lambda x: g.demodulate(np.asarray(x, np.complex128)))


def _pair(snr_db=30.0, seed=1):
    air = VirtualAir(snr_db=snr_db, seed=seed)
    mod, dem = _phy()
    a = SoftMac(A1, air, mod, dem, rate=6, name="A")
    b = SoftMac(A2, air, mod, dem, rate=6, name="B")
    return air, a, b


def test_fsm_basics():
    m = Fsm("idle")
    hits = []
    m.on("idle", "go", "run", action=lambda: hits.append(1))
    m.on("run", "stop", "idle")
    assert m.fire("go") == "run" and hits == [1]
    assert m.can("stop") and not m.can("go")
    with pytest.raises(ValueError):
        m.fire("go")
    assert m.trace[-1] == ("idle", "go", "run")


def test_data_ack_exchange():
    air, a, b = _pair()
    a.send(b"hello from A", A2)
    run_air(air, [a, b], 400)
    assert b.rx_payloads == [(A1, b"hello from A")]
    assert a.stats.rx_ack == 1 and a.stats.drops == 0
    assert b.stats.tx_ack == 1
    assert a.fsm.state == "idle" and not a._queue


def test_bidirectional_traffic():
    air, a, b = _pair(seed=2)
    for i in range(3):
        a.send(f"a->b {i}".encode(), A2)
        b.send(f"b->a {i}".encode(), A1)
    run_air(air, [a, b], 4000)
    assert sorted(p for _, p in b.rx_payloads) == \
        [f"a->b {i}".encode() for i in range(3)]
    assert sorted(p for _, p in a.rx_payloads) == \
        [f"b->a {i}".encode() for i in range(3)]
    assert a.stats.drops == 0 and b.stats.drops == 0


def test_retransmission_on_no_ack():
    """Receiver deaf (never ACKs) -> sender retries then drops."""
    air = VirtualAir(snr_db=30.0, seed=3)
    mod, dem = _phy()
    a = SoftMac(A1, air, mod, dem, rate=6)
    a.send(b"nobody home", A2)
    run_air(air, [a], 20000)
    assert a.stats.drops == 1
    assert a.stats.retries == 8          # RETRY_LIMIT + 1 timeouts
    assert a.stats.tx_data == 8
    assert a.fsm.state == "idle"


def test_broadcast_no_ack():
    air, a, b = _pair(seed=4)
    a.send(b"to everyone", b"\xff" * 6)
    run_air(air, [a, b], 400)
    assert (A1, b"to everyone") in b.rx_payloads
    assert a.stats.retries == 0 and not a._queue


def test_duplicate_filtered():
    air, a, b = _pair(seed=5)
    a.send(b"once", A2)
    run_air(air, [a, b], 400)
    # replay the exact same PSDU directly at B
    psdu = b.rx_payloads[0]
    wave = a.cache.get(
        [k for k in a.cache._store][0][0], 6)
    b.on_rx(np.concatenate([np.zeros(40, np.complex64),
                            wave.astype(np.complex64)]))
    assert b.stats.rx_dup == 1
    assert len(b.rx_payloads) == 1


def test_signal_cache_hits():
    mod, _ = _phy()
    calls = []
    c = SignalCache(lambda p, r: (calls.append(1), mod(p, r))[1],
                    capacity=2)
    w1 = c.get(b"frame-a" * 4, 6)
    w2 = c.get(b"frame-a" * 4, 6)
    assert np.array_equal(w1, w2) and len(calls) == 1
    assert c.hits == 1 and c.misses == 1
    c.get(b"frame-b" * 4, 6)
    c.get(b"frame-c" * 4, 6)             # evicts frame-a
    c.get(b"frame-a" * 4, 6)
    assert len(calls) == 4


def test_beacon_roundtrip():
    bss = mgmt.Bss(ssid="tpu-net", bssid=b"\x02BSSID")
    psdu = mgmt.build_beacon(bss, timestamp_us=12345, seq=7)
    got = mgmt.parse_beacon(psdu)
    assert got.ssid == "tpu-net" and got.bssid == b"\x02BSSID"
    assert got.rates_mbps == mgmt.DEFAULT_RATES


def test_auth_assoc_roundtrip():
    bss = mgmt.Bss()
    au = mgmt.build_auth(A1, bss.bssid, seq_num=1)
    src, seqn, status = mgmt.parse_auth(au)
    assert (src, seqn, status) == (A1, 1, 0)
    ar = mgmt.build_assoc_resp(A1, bss, aid=5)
    assert mgmt.parse_assoc_resp(ar) == (0, 5)


def test_beacon_over_air():
    air, a, b = _pair(seed=6)
    a.send_beacon(mgmt.Bss(ssid="over-air", bssid=A1))
    run_air(air, [a, b], 600)
    beacons = [p for _, p in b.rx_payloads
               if mgmt.frame_type(p) == mgmt.FC_BEACON]
    assert beacons and mgmt.parse_beacon(beacons[0]).ssid == "over-air"


def test_collision_recovers():
    """Both stations queue at once: CSMA separates them; both succeed."""
    air, a, b = _pair(seed=7)
    a.send(b"from A", A2)
    b.send(b"from B", A1)
    run_air(air, [a, b], 8000)
    assert (A1, b"from A") in b.rx_payloads
    assert (A2, b"from B") in a.rx_payloads
    assert a.stats.drops == 0 and b.stats.drops == 0
