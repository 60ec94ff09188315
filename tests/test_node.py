"""Live streaming node: ring -> batched device decode -> MAC -> ACK TX
(the umxsdrbrick loop, dot11main.cpp:365-457 / mac.cpp:190-345)."""

import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac.frame import MacHeader, append_fcs
from sora_tpu.runtime.native import RxRing
from sora_tpu.runtime.node import NodeConfig, StreamingNode, TxSink

ADDR = b"\x02SORA1"
PEER = b"\x02PEER0"


def _traffic(n_frames, rng, rate=12, to=ADDR, gap=700):
    pieces, psdus = [], []
    for i in range(n_frames):
        hdr = MacHeader(addr1=to, addr2=PEER, addr3=to,
                        seq_ctrl=(i & 0xFFF) << 4)
        payload = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
        psdu = append_fcs(hdr.pack() + payload)
        psdus.append(psdu)
        pieces.append(np.zeros(gap, np.complex64))
        pieces.append(g.modulate(psdu, rate).astype(np.complex64))
    pieces.append(np.zeros(3 * gap, np.complex64))
    x = np.concatenate(pieces)
    x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
          ).astype(np.complex64) * 0.01
    return x, psdus


@pytest.fixture()
def node_setup():
    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     addr=ADDR, rate_mbps=None)
    tx = TxSink()
    node = StreamingNode(ring, cfg, tx_sink=tx)
    yield ring, node, tx
    ring.close()


def _drain(ring, node):
    idle = 0
    while idle < 3:
        if node.step():
            idle = 0
        else:
            idle += 1
    node.flush()


def test_node_decodes_and_acks(node_setup, rng):
    ring, node, tx = node_setup
    x, psdus = _traffic(6, rng)
    ring.write(x)
    _drain(ring, node)
    assert node.stats.frame_ok == 6, node.report()
    assert node.stats.acks_tx == 6
    assert len(node.rx_payloads) == 6
    srcs = {s for s, _ in node.rx_payloads}
    assert srcs == {PEER}
    # every fired ACK is a decodable waveform addressed back to the peer
    assert len(tx.fired) == 6


def test_node_dedups_overlap_not_replays(node_setup, rng):
    """The same frame seen through two overlapping windows counts once;
    the same bytes replayed later count again."""
    ring, node, tx = node_setup
    x, psdus = _traffic(1, rng)
    ring.write(x)
    ring.write(x)                    # looped replay: same bytes, later pos
    _drain(ring, node)
    assert node.stats.frame_ok == 2, node.report()
    assert node.stats.dup >= 0


def test_node_cs_gates_idle_air(node_setup, rng):
    ring, node, tx = node_setup
    noise = (rng.normal(size=40000) + 1j * rng.normal(size=40000)
             ).astype(np.complex64) * 0.05
    ring.write(noise)
    _drain(ring, node)
    assert node.stats.frame_ok == 0
    assert node.stats.cs_timeout > 0        # early-out fired
    assert node.stats.decoded_batches == 0  # full decode never ran


def test_node_ignores_other_destinations(node_setup, rng):
    ring, node, tx = node_setup
    x, _ = _traffic(3, rng, to=b"\x02OTHER")
    ring.write(x)
    _drain(ring, node)
    assert node.stats.frame_ok == 0
    assert node.stats.not_for_us == 3
    assert node.stats.acks_tx == 0


def test_node_ack_waveform_decodes(node_setup, rng):
    """The pre-staged ACK fired by the node is itself a valid frame — the
    CompareACK analogue (demod11/main.cpp:16-17)."""
    from sora_tpu.phy.dot11a import rx as arx

    ring, node, tx = node_setup
    x, _ = _traffic(1, rng)
    ring.write(x)
    _drain(ring, node)
    assert tx.fired
    # re-fetch the cached waveform and decode it
    from sora_tpu.mac.frame import build_ack_frame
    wave = node.cache.get(build_ack_frame(PEER), node.cfg.ack_rate)
    xb = np.concatenate([np.zeros(50, np.complex64), wave,
                         np.zeros(50, np.complex64)])
    res = arx.demodulate(xb)
    assert res.ok
    assert res.psdu[4:10] == PEER


def test_node_backlog_watchdog(rng):
    """When the consumer falls behind, the watchdog skips to the live edge
    (the Seek(END_POS) backlog flush, rxstream.hpp:56-64)."""
    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     addr=ADDR, backlog_hwm=32768)
    node = StreamingNode(ring, cfg)
    noise = (rng.normal(size=200_000) + 1j * rng.normal(size=200_000)
             ).astype(np.complex64) * 0.03
    ring.write(noise)
    dropped = node.skip_backlog()
    assert dropped > 0
    assert node.stats.backlog_dropped == dropped
    assert ring.available(node.vs) <= 32768
    ring.close()
