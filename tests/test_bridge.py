"""OS packet reflection tests: application traffic over the software air.

The reference's defining NIC loop — SoraUEnableGetTxPacket pulls OS
packets for TX (dot11main.cpp:413), SoraUIndicateRxPacket feeds decoded
frames back (mac.cpp:900) — recast as TAP / AF_UNIX bridges around the
streaming node (sora_tpu.runtime.bridge)."""

import os
import socket

import numpy as np
import pytest

from sora_tpu.runtime.bridge import (ETH_HDR, PacketReflector,
                                     SocketBridge, TapBridge)
from sora_tpu.runtime.native import RxRing
from sora_tpu.runtime.node import NodeConfig, StreamingNode, TxSink

ADDR_A = b"\x02BRDGA"
ADDR_B = b"\x02BRDGB"


def _pair_nodes():
    ring_a = RxRing(capacity=1 << 22)
    ring_b = RxRing(capacity=1 << 22)
    # backlog_hwm high: the CPU test decodes slower than the pump writes,
    # and the live-edge watchdog must not drop the frame under test
    mk = lambda addr: NodeConfig(
        window=4096, batch=2, overlap=2816, max_psdu=128, addr=addr,
        rate_mbps=None, data_rate=12, min_rate_mbps=12,
        ack_timeout_slots=250, backlog_hwm=1 << 22)
    a = StreamingNode(ring_a, mk(ADDR_A), tx_sink=TxSink(ring_b))
    b = StreamingNode(ring_b, mk(ADDR_B), tx_sink=TxSink(ring_a))
    return (ring_a, ring_b), (a, b)


def _eth(dst: bytes, src: bytes, payload: bytes,
         ethertype: bytes = b"\x08\x00") -> bytes:
    return dst + src + ethertype + payload


def test_application_echo_over_the_air(rng):
    """Bytes in via bridge A come out of bridge B and back: the full
    GetTxPacket -> modulate -> air -> decode -> IndicateRxPacket loop,
    twice (request + application-level echo)."""
    rings, (a, b) = _pair_nodes()
    br_a, app_a = SocketBridge.pair()
    br_b, app_b = SocketBridge.pair()
    ref_a = PacketReflector(a, br_a)
    ref_b = PacketReflector(b, br_b)
    app_a.setblocking(False)
    app_b.setblocking(False)

    req = _eth(ADDR_B, ADDR_A, b"echo request over the air")
    app_a.send(req)

    got_b = got_a = b""
    for _ in range(120):
        for r in rings:
            r.write((rng.normal(size=4096) + 1j * rng.normal(size=4096)
                     ).astype(np.complex64) * 0.01)
        for node, ref in ((a, ref_a), (b, ref_b)):
            node.step()
            ref.step()
        if not got_b:
            try:
                got_b = app_b.recv(2048)
            except BlockingIOError:
                pass
            if got_b:
                assert got_b == req
                # application echo: swap MACs, bounce the payload back
                app_b.send(_eth(got_b[6:12], got_b[:6], got_b[ETH_HDR:]))
        else:
            try:
                got_a = app_a.recv(2048)
            except BlockingIOError:
                pass
            if got_a:
                break
    for node in (a, b):
        node.flush()
    if got_b and not got_a:  # echo may land at flush time on slow CPUs
        try:
            got_a = app_a.recv(2048)
        except BlockingIOError:
            pass
    assert got_b == req, (a.report(), b.report())
    assert got_a == _eth(ADDR_A, ADDR_B, req[ETH_HDR:]), \
        (got_a, a.report(), b.report())
    assert ref_a.pkts_out == 1 and ref_a.pkts_in >= 1
    assert ref_b.pkts_in >= 1 and ref_b.pkts_out == 1
    # both directions rode the CSMA data path, not a side channel (ACK
    # bookkeeping is timing-dependent on a slow CPU pump, so only the
    # data-frame counters are asserted)
    assert a.stats.tx_data >= 1 and b.stats.tx_data >= 1
    for r in rings:
        r.close()


def test_broadcast_ethernet_stays_broadcast(rng):
    """An ethernet broadcast (e.g. ARP who-has) reaches the peer bridge
    without an ACK exchange (802.11 broadcasts are unacknowledged)."""
    rings, (a, b) = _pair_nodes()
    br_a, app_a = SocketBridge.pair()
    br_b, app_b = SocketBridge.pair()
    ref_a = PacketReflector(a, br_a)
    PacketReflector(b, br_b)
    app_b.setblocking(False)

    arp = _eth(b"\xff" * 6, ADDR_A, b"who-has 10.77.0.2",
               ethertype=b"\x08\x06")
    app_a.send(arp)
    got = b""
    for _ in range(80):
        for r in rings:
            r.write((rng.normal(size=4096) + 1j * rng.normal(size=4096)
                     ).astype(np.complex64) * 0.01)
        for node, ref in ((a, ref_a), (b, None)):
            node.step()
            if ref:
                ref.step()
        try:
            got = app_b.recv(2048)
            break
        except BlockingIOError:
            pass
    for node in (a, b):
        node.flush()
    if not got:          # indication may land at flush time on slow CPUs
        try:
            got = app_b.recv(2048)
        except BlockingIOError:
            pass
    assert got == arp, (a.report(), b.report())
    assert b.stats.acks_tx == 0          # broadcast: no ACK
    for r in rings:
        r.close()


_have_tun = os.path.exists("/dev/net/tun") and os.geteuid() == 0


@pytest.mark.skipif(not _have_tun, reason="needs root + /dev/net/tun")
def test_tap_bridge_kernel_roundtrip():
    """Real TAP plumbing: a frame sent into the kernel side of the tap
    arrives via read_frames, and write_frame is seen by an AF_PACKET
    socket bound to the interface."""
    br = TapBridge("soratest0")
    try:
        s = socket.socket(socket.AF_PACKET, socket.SOCK_RAW,
                          socket.htons(0x0003))
        s.bind((br.name, 0))
        s.settimeout(2.0)
        frame = _eth(b"\x02\xaa\xaa\xaa\xaa\xaa", b"\x02\xbb\xbb\xbb\xbb\xbb",
                     b"x" * 50)
        s.send(frame)
        got = []
        for _ in range(50):
            got = br.read_frames()
            if got:
                break
            import time
            time.sleep(0.02)
        assert any(g == frame for g in got), got
        out = _eth(b"\x02\xbb\xbb\xbb\xbb\xbb", b"\x02\xaa\xaa\xaa\xaa\xaa",
                   b"y" * 50)
        br.write_frame(out)
        seen = b""
        import time
        t0 = time.time()
        while time.time() - t0 < 2.0:
            pkt = s.recv(2048)
            if pkt == out:
                seen = pkt
                break
        assert seen == out
        s.close()
    finally:
        br.close()
