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
                     addr=ADDR, rate_mbps=None, min_rate_mbps=24)
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
                     addr=ADDR, backlog_hwm=32768, min_rate_mbps=24)
    node = StreamingNode(ring, cfg)
    noise = (rng.normal(size=200_000) + 1j * rng.normal(size=200_000)
             ).astype(np.complex64) * 0.03
    ring.write(noise)
    dropped = node.skip_backlog()
    assert dropped > 0
    assert node.stats.backlog_dropped == dropped
    assert ring.available(node.vss[0]) <= 32768
    ring.close()


# -- multi-PHY modes (-b / -n, umxsdrbrick/main.cpp:28-39) --------------------


def _traffic_b(rng, rates=(2, 5.5, 11), to=ADDR, gap=2200, nbytes=40):
    from sora_tpu.golden import dot11b_np as gb

    pieces, psdus = [], []
    for i, rate in enumerate(rates):
        hdr = MacHeader(addr1=to, addr2=PEER, addr3=to,
                        seq_ctrl=(i & 0xFFF) << 4)
        payload = bytes(rng.integers(0, 256, nbytes, dtype=np.uint8))
        psdu = append_fcs(hdr.pack() + payload)
        psdus.append(psdu)
        pieces.append(np.zeros(gap, np.complex64))
        pieces.append(gb.modulate(psdu, rate).astype(np.complex64))
    pieces.append(np.zeros(3 * gap, np.complex64))
    x = np.concatenate(pieces)
    x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
          ).astype(np.complex64) * 0.01
    return x, psdus


def test_node_11b_auto_rate_decodes_and_acks(rng):
    """11b mode: mixed-rate DSSS traffic (2 / 5.5 / 11 Mbps CCK) through
    the two-phase PLCP dispatch; ACKs go out as DSSS waveforms."""
    from sora_tpu.golden import dot11b_np as gb

    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(phy="b", input_rate="11m", window=8192, batch=2,
                     overlap=6144, max_psdu=72, min_rate_mbps=2,
                     addr=ADDR, sample_rate_sps=11e6)
    tx = TxSink()
    node = StreamingNode(ring, cfg, tx_sink=tx)
    x, psdus = _traffic_b(rng)
    ring.write(x)
    _drain(ring, node)
    assert node.stats.frame_ok == 3, node.report()
    assert node.stats.acks_tx == 3
    assert {s for s, _ in node.rx_payloads} == {PEER}
    # the fired ACK is a decodable DSSS waveform at the basic rate
    wave = tx.fired and node.cache.get(
        __import__("sora_tpu.mac.frame", fromlist=["build_ack_frame"]
                   ).build_ack_frame(PEER), node.cfg.ack_rate)
    res = gb.demodulate(np.concatenate(
        [np.zeros(64, np.complex64), wave, np.zeros(64, np.complex64)]))
    assert res.ok and res.rate_mbps == 2
    ring.close()


def test_node_11b_cs_gates_idle_air(rng):
    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(phy="b", input_rate="11m", window=8192, batch=2,
                     overlap=6144, max_psdu=72, min_rate_mbps=2,
                     addr=ADDR)
    node = StreamingNode(ring, cfg)
    noise = (rng.normal(size=60000) + 1j * rng.normal(size=60000)
             ).astype(np.complex64) * 0.05
    ring.write(noise)
    _drain(ring, node)
    assert node.stats.frame_ok == 0
    assert node.stats.cs_timeout > 0
    assert node.stats.decoded_batches == 0
    ring.close()


def _traffic_n(rng, mcss=(8, 11, 15), to=ADDR, gap=800, nbytes=80):
    from sora_tpu.golden import dot11n_np as gn

    rows0, rows1, psdus = [], [], []
    for i, mcs in enumerate(mcss):
        hdr = MacHeader(addr1=to, addr2=PEER, addr3=to,
                        seq_ctrl=(i & 0xFFF) << 4)
        payload = bytes(rng.integers(0, 256, nbytes, dtype=np.uint8))
        psdu = append_fcs(hdr.pack() + payload)
        psdus.append(psdu)
        w = gn.modulate(psdu, mcs).astype(np.complex64)       # (2, N)
        z = np.zeros(gap, np.complex64)
        rows0 += [z, w[0]]
        rows1 += [z, w[1]]
    z = np.zeros(3 * gap, np.complex64)
    x0 = np.concatenate(rows0 + [z])
    x1 = np.concatenate(rows1 + [z])
    n = rng.normal(size=(2, len(x0))) + 1j * rng.normal(size=(2, len(x0)))
    return (x0 + 0.005 * n[0].astype(np.complex64),
            x1 + 0.005 * n[1].astype(np.complex64)), psdus


def test_node_11n_mimo_two_rings(rng):
    """11n mode: 2x2 MIMO frames across two RX rings (the TRxMIMOStream
    analogue), mixed-MCS auto dispatch, legacy-OFDM ACKs."""
    rings = [RxRing(capacity=1 << 20), RxRing(capacity=1 << 20)]
    cfg = NodeConfig(phy="n", window=4096, batch=2, overlap=2816,
                     min_rate_mbps=9,
                     max_psdu=256, addr=ADDR)
    tx = TxSink()
    node = StreamingNode(rings, cfg, tx_sink=tx)
    (x0, x1), psdus = _traffic_n(rng)
    rings[0].write(x0.astype(np.complex64))
    rings[1].write(x1.astype(np.complex64))
    _drain(rings[0], node)
    assert node.stats.frame_ok == 3, node.report()
    assert node.stats.acks_tx == 3
    assert {s for s, _ in node.rx_payloads} == {PEER}
    for r in rings:
        r.close()


def test_node_11n_requires_two_rings():
    import pytest as _pytest

    ring = RxRing(capacity=1 << 16)
    with _pytest.raises(ValueError):
        StreamingNode(ring, NodeConfig(phy="n"))
    ring.close()


# -- data TX: CSMA/CA send path (MAC11_Send, mac.cpp:293-345) -----------------


class _LossyTxSink(TxSink):
    """Drops the first `drop_first` fired waveforms — injected loss for
    observing the BEB retry path."""

    def __init__(self, ring=None, drop_first: int = 0):
        super().__init__(ring)
        self.drop_first = drop_first

    def fire(self, wave):
        if self.drop_first > 0:
            self.drop_first -= 1
            self.fired.append((0.0, len(wave)))
            return
        super().fire(wave)


def _two_nodes(drop_first=0, ack_timeout_slots=250):
    ring_a = RxRing(capacity=1 << 22)
    ring_b = RxRing(capacity=1 << 22)
    mk = lambda addr: NodeConfig(
        window=4096, batch=2, overlap=2816, max_psdu=128, addr=addr,
        rate_mbps=None, data_rate=12, min_rate_mbps=12,
        ack_timeout_slots=ack_timeout_slots)
    # cross-wired rings: each node's TX feeds the other's RX (software air)
    tx_a = _LossyTxSink(ring_b, drop_first=drop_first)
    tx_b = TxSink(ring_a)
    node_a = StreamingNode(ring_a, mk(ADDR), tx_sink=tx_a)
    node_b = StreamingNode(ring_b, mk(PEER), tx_sink=tx_b)
    return (ring_a, ring_b), (node_a, node_b)


def _pump(rings, nodes, rng, chunks, done, chunk=4096):
    """Idle-air clock: write low noise into both rings, step both nodes."""
    for _ in range(chunks):
        for r in rings:
            n = (rng.normal(size=chunk) + 1j * rng.normal(size=chunk)
                 ).astype(np.complex64) * 0.01
            r.write(n)
        for node in nodes:
            node.step()
        if done():
            break
    for node in nodes:
        node.flush()


def test_two_nodes_exchange_data_and_acks(rng):
    """Node A sends data to node B through cross-wired rings; B decodes,
    ACKs; A sees the ACK and confirms — the reference's two-station
    conversation (mac.cpp:190-345) over the software air."""
    rings, (a, b) = _two_nodes()
    payload = b"hello from A" * 4
    a.send(payload, PEER)
    _pump(rings, (a, b), rng, chunks=40,
          done=lambda: a.stats.tx_acked >= 1)
    assert a.stats.tx_data >= 1, a.report()
    assert b.stats.frame_ok >= 1, b.report()
    assert b.rx_payloads and b.rx_payloads[0] == (ADDR, payload)
    assert b.stats.acks_tx >= 1
    assert a.stats.tx_acked == 1, a.report()
    assert a.stats.tx_drops == 0
    for r in rings:
        r.close()


def test_two_nodes_retry_under_loss(rng):
    """A's first transmission is dropped by the air: the ACK timeout
    fires, BEB retries, and the retransmission gets through."""
    rings, (a, b) = _two_nodes(drop_first=1)
    a.send(b"retry me", PEER)
    _pump(rings, (a, b), rng, chunks=120,
          done=lambda: a.stats.tx_acked >= 1)
    assert a.stats.tx_retries >= 1, a.report()
    assert a.stats.tx_data >= 2          # original + retransmission
    assert a.stats.tx_acked == 1, a.report()
    assert b.rx_payloads and b.rx_payloads[0][1] == b"retry me"
    for r in rings:
        r.close()


def test_node_tx_drops_after_retry_limit(rng):
    """With the air fully broken, BEB gives up after RETRY_LIMIT."""
    from sora_tpu.mac.csma import RETRY_LIMIT

    rings, (a, b) = _two_nodes(drop_first=100, ack_timeout_slots=30)
    a.send(b"never arrives", PEER)
    _pump(rings, (a, b), rng, chunks=220,
          done=lambda: a.stats.tx_drops >= 1)
    assert a.stats.tx_drops == 1, a.report()
    assert a.stats.tx_retries == RETRY_LIMIT + 1
    assert a.stats.tx_acked == 0
    for r in rings:
        r.close()


def test_txsink_mimo_duplicates_to_both_rings():
    rings = [RxRing(capacity=1 << 16), RxRing(capacity=1 << 16)]
    tx = TxSink(rings)
    vss = [r.alloc_vstream() for r in rings]
    tx.fire(np.ones(100, np.complex64))
    for r, vs in zip(rings, vss):
        assert len(r.read(vs, 1000)) == 100
        r.close()


def test_node_dense_frames_within_hop(rng):
    """Frames separated by much less than the hop all decode — the
    re-arming RX loop analogue (mac.cpp:190-280): multi-frame-per-window
    top-K candidates, no per-source hop/overlap hand-tuning."""
    ring = RxRing(capacity=1 << 20)
    # auto window/overlap/K from (max_psdu=128, min_rate=12):
    # frames are ~120 samples apart, far below any hop
    cfg = NodeConfig(max_psdu=128, min_rate_mbps=12, addr=ADDR,
                     batch=2, rate_mbps=None)
    assert cfg.max_frames_per_window > 1
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    n = 12
    x, psdus = _traffic(n, rng, rate=24, gap=120)
    ring.write(x)
    _drain(ring, node)
    assert node.stats.frame_ok == n, node.report()
    assert len(node.rx_payloads) == n
    ring.close()


def test_node_config_autosize_and_span_warning(rng):
    cfg = NodeConfig(max_psdu=256, min_rate_mbps=6)
    # span of a 256-byte 6 Mbps frame is 7360 samples
    assert cfg.overlap >= 7360 and cfg.window > cfg.overlap
    with pytest.warns(UserWarning, match="frame span"):
        NodeConfig(window=4096, overlap=1024, max_psdu=1600)


def test_node_runtime_reconfigure(rng):
    """Live rate/threshold switching via the program table — the
    process_kb runtime reconfig (dot11main.cpp:148-204)."""
    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     addr=ADDR, rate_mbps=None, min_rate_mbps=24)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    x, _ = _traffic(2, rng, rate=12)
    ring.write(x)
    _drain(ring, node)
    assert node.stats.frame_ok == 2
    # switch to a fixed-rate program, decode more traffic
    node.reconfigure(rate_mbps=12, detect_threshold=0.5)
    assert node.cfg.detect_threshold == 0.5
    x2, _ = _traffic(2, rng, rate=12)
    ring.write(x2)
    _drain(ring, node)
    assert node.stats.frame_ok == 4, node.report()
    # back to auto: program comes from the table, no rebuild
    before = dict(node._prog_table)
    node.reconfigure(rate_mbps=None)
    assert dict(node._prog_table) == before
    with pytest.raises(ValueError):
        node.reconfigure(window=1234)
    with pytest.raises(ValueError):
        node.reconfigure(phy="n")      # needs two rings
    ring.close()


def test_node_beacons(rng):
    """AP mode: the node queues broadcast beacons on a timer and fires
    them through the CSMA TX path (mgmt beacon loop analogue)."""
    from sora_tpu.mac import mgmt

    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=128,
                     min_rate_mbps=12, addr=ADDR, beacon_interval_s=0.01,
                     ssid="tpu-ap")
    tx = TxSink()
    node = StreamingNode(ring, cfg, tx_sink=tx)
    # idle air so DIFS+backoff complete quickly
    ring.write(np.zeros(40000, np.complex64))
    t_end = __import__("time").perf_counter() + 0.3
    while __import__("time").perf_counter() < t_end:
        node.step()
    node.flush()
    assert node.stats.beacons_tx >= 2
    assert node.stats.tx_data >= 1          # broadcast fired, no ACK wait
    assert tx.fired
    ring.close()


def test_two_nodes_auth_assoc_handshake(rng):
    """Client joins the AP over the software air: auth req -> auth resp
    -> assoc req -> assoc resp, each unicast step ACKed — the mgmt
    handshake of the reference (mgmt.cpp, mgmt.h:17-83)."""
    ring_a = RxRing(capacity=1 << 22)
    ring_b = RxRing(capacity=1 << 22)
    ap_cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=128,
                        addr=ADDR, rate_mbps=None, data_rate=12,
                        min_rate_mbps=12, ack_timeout_slots=250,
                        beacon_interval_s=1e9)
    st_cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=128,
                        addr=PEER, rate_mbps=None, data_rate=12,
                        min_rate_mbps=12, ack_timeout_slots=250)
    ap = StreamingNode(ring_a, ap_cfg, tx_sink=TxSink(ring_b))
    st = StreamingNode(ring_b, st_cfg, tx_sink=TxSink(ring_a))
    st.start_join(ADDR)
    _pump((ring_a, ring_b), (ap, st), rng, chunks=60,
          done=lambda: st.associated_bssid is not None)
    assert st.associated_bssid == ADDR, (ap.report(), st.report())
    assert ap.stations.get(PEER) == 1
    assert ap.stats.mgmt_rx >= 2 and st.stats.mgmt_rx >= 2
    for r in (ring_a, ring_b):
        r.close()


def test_node_candidate_compaction_sparse(rng):
    """An explicit decode_slots bucket smaller than batch*K still decodes
    every frame on sparse air — the compaction path end-to-end through
    the node's src-mapped dispatch (VERDICT r03 item 2)."""
    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(max_psdu=128, min_rate_mbps=12, addr=ADDR,
                     batch=4, rate_mbps=None, decode_slots=8)
    assert cfg.max_frames_per_window > 1
    assert cfg.decode_slots < cfg.batch * cfg.max_frames_per_window
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    n = 10
    x, psdus = _traffic(n, rng, rate=24, gap=4000)   # sparse: ~1/window
    ring.write(x)
    _drain(ring, node)
    assert node.stats.frame_ok == n, node.report()
    assert len(node.rx_payloads) == n
    ring.close()


def test_pipeline_compaction_reports_dropped_candidates(rng):
    """n_cand counts above-threshold candidates BEFORE top-k compaction,
    so the dropped surplus is exactly n_cand - surviving cs_ok rows
    (VERDICT r04 weak 3: a silent cap read as 'decoded everything')."""
    import jax.numpy as jnp

    from sora_tpu.phy.dot11a import rx as arx

    hdr = MacHeader(addr1=ADDR, addr2=PEER, addr3=ADDR)
    psdu = append_fcs(hdr.pack() + b"Q" * 60)
    w = g.modulate(psdu, 24).astype(np.complex64)
    x = np.zeros((2, 8192), np.complex64)
    for b in range(2):                      # 3 real frames per window
        for k in range(3):
            off = 120 + b * 37 + k * (len(w) + 600)
            x[b, off: off + len(w)] += w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    xd = jnp.asarray(x)
    full = arx.rx_pipeline_auto(xd, max_psdu=128, n_frames=4,
                                min_rate_mbps=24)
    n_cand = int(np.asarray(full["n_cand"]))
    assert n_cand == int(np.asarray(full["cs_ok"]).sum()) == 6
    comp = arx.rx_pipeline_auto(xd, max_psdu=128, n_frames=4,
                                n_decode=2, min_rate_mbps=24)
    assert int(np.asarray(comp["n_cand"])) == n_cand
    survived = int(np.asarray(comp["cs_ok"]).sum())
    assert n_cand - survived == n_cand - 2    # drop == surplus, exactly


def test_node_compaction_preserves_carrier_sense(rng):
    """Carrier sense must not depend on decode capacity: with a
    decode_slots bucket far smaller than the frames on the air, every
    traffic window still marks the medium busy (no cs_timeout inside the
    burst, _busy_until spans it) and the dropped surplus is counted in
    compaction_drop — the reference's CCA defers regardless of what
    decodes (mac.cpp:190-280)."""
    ring = RxRing(capacity=1 << 21)
    cfg = NodeConfig(max_psdu=128, min_rate_mbps=12, addr=ADDR,
                     batch=4, rate_mbps=None, decode_slots=2)
    assert cfg.decode_slots < cfg.batch * cfg.max_frames_per_window
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    node.send(b"hold me back", PEER)         # TX pends against busy air
    n = 20
    x, _ = _traffic(n, rng, rate=12, to=b"\x02OTHER", gap=200)  # dense
    ring.write(x)
    _drain(ring, node)
    # every in-burst window was busy: cs_timeout can only come from the
    # trailing-silence windows of the final (flush-padded) batch
    assert node.stats.cs_timeout <= 2 * cfg.batch, node.report()
    assert node.stats.compaction_drop > 0, node.report()
    assert node._busy_until >= len(x) - cfg.window - 3 * 700
    ring.close()


def test_node_44msps_interop_input(rng):
    """Live node fed raw 44 Msps samples (the commercial-NIC interop
    rate): the on-device 44->40->20 front end runs inside the decode and
    detect programs (CreateDemodGraph11a_44M, fb11ademod_config.hpp:221)."""
    import jax.numpy as jnp
    from sora_tpu.phy import frontend as fe

    ring = RxRing(capacity=1 << 22)
    cfg = NodeConfig(max_psdu=256, min_rate_mbps=12, addr=ADDR,
                     batch=2, rate_mbps=None, input_rate="44m")
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    x20, psdus = _traffic(5, rng, rate=12, gap=900)
    x44 = np.array(fe.ofdm_upsample_44m(jnp.asarray(x20[None])))[0]
    x44 = x44 + (rng.normal(size=len(x44)) + 1j *
                 rng.normal(size=len(x44))).astype(np.complex64) * 0.01
    ring.write(x44.astype(np.complex64))
    _drain(ring, node)
    assert node.stats.frame_ok == 5, node.report()
    assert len(node.rx_payloads) == 5
    assert node.stats.acks_tx == 5
    # the pre-staged ACK waveforms went out at the ring's 44 Msps rate:
    # ~2.2x the ~880-sample 20 Msps ACK span
    assert node.tx.fired and 1700 < node.tx.fired[0][1] < 2300, \
        node.tx.fired[0]
    ring.close()


@pytest.mark.parametrize("scale", [1e-2, 3.0])
def test_node_agc_decodes_off_scale_input(rng, scale):
    """Software AGC (VERDICT r03 item 9): the same traffic at 1e-2x and
    3x input amplitude decodes without threshold retuning — the gain is
    tracked from the detect pass's power and applied at the int16
    quantizer, the stand-in for the radio RX gain the reference sets at
    boot (dot11main.cpp:121-146 + HwVeri AGC.cpp)."""
    ring = RxRing(capacity=1 << 22)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     addr=ADDR, rate_mbps=None, min_rate_mbps=24)
    assert cfg.agc
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    n = 8
    x, psdus = _traffic(n, rng, rate=12)
    ring.write((x * scale).astype(np.complex64))
    _drain(ring, node)
    assert node.stats.frame_ok == n, node.report()
    assert len(node.rx_payloads) == n
    # the loop actually adapted toward unit post-gain amplitude
    if scale < 0.1:
        assert node._agc_gain > 10.0, node.report()
    else:
        assert node._agc_gain < 0.7, node.report()
    ring.close()


def test_node_agc_sparse_air_64qam_i8_wire(rng):
    """AGC power comes from the PEAK short-window energy, not the
    window mean (ADVICE r04): a lone 54 Mbps frame in a mostly-idle
    window at 3x amplitude must not be gain-overshot into int8-wire
    clipping — occupancy must not bias the estimate."""
    ring = RxRing(capacity=1 << 22)
    cfg = NodeConfig(max_psdu=256, min_rate_mbps=24, addr=ADDR,
                     batch=2, rate_mbps=None, wire="i8",
                     backlog_hwm=1 << 21)   # whole-burst write, no drop
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    n = 6
    # ~1 frame per window: occupancy ~5% -> the old window-mean estimate
    # under-read amplitude ~4.5x and the quantizer clipped 64-QAM hard
    x, psdus = _traffic(n, rng, rate=54, gap=26000)
    ring.write((x * 3.0).astype(np.complex64))
    _drain(ring, node)
    assert node.stats.frame_ok == n, node.report()
    assert len(node.rx_payloads) == n
    ring.close()


def test_node_agc_idle_noise_never_cranks_gain(rng):
    """Idle air (no carrier) must not raise the gain — release happens
    only while a carrier is detected."""
    ring = RxRing(capacity=1 << 22)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     addr=ADDR, rate_mbps=None, min_rate_mbps=24)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    for _ in range(10):
        ring.write((rng.normal(size=8192) + 1j * rng.normal(size=8192)
                    ).astype(np.complex64) * 0.01)
        node.step()
    node.flush()
    assert node._agc_gain == 1.0, node.report()
    ring.close()


def test_node_i8_wire_decodes(rng):
    """int8 I/Q wire (quarter the boundary bytes): with the AGC holding
    the signal at the 8-bit quantizer's design amplitude, the same
    traffic decodes — including off-scale input the AGC first adapts."""
    ring = RxRing(capacity=1 << 22)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     addr=ADDR, rate_mbps=None, wire="i8",
                     min_rate_mbps=24)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    n = 8
    x, psdus = _traffic(n, rng, rate=12)
    ring.write((x * 0.05).astype(np.complex64))   # -26 dBFS input
    _drain(ring, node)
    # the first frame may land before the AGC settles (it spans ~1.6
    # int8 levels at gain 1) — that's the physical attack time of any
    # AGC, not a decode defect
    assert node.stats.frame_ok >= n - 1, node.report()
    assert node._agc_gain > 5.0
    ring.close()


def test_node_config_rejects_bad_wire():
    with pytest.raises(ValueError):
        NodeConfig(wire="i12")


def test_node_11n_single_stream_mcs(rng):
    """11n mode with a fixed single-stream MCS (0-7): one TX chain on
    the air, two RX rings fed through a random 2x1 channel, MRC decode."""
    from sora_tpu.golden import dot11n_np as gn

    rings = [RxRing(capacity=1 << 20), RxRing(capacity=1 << 20)]
    cfg = NodeConfig(phy="n", window=4096, batch=2, overlap=2816,
                     min_rate_mbps=9,
                     max_psdu=256, addr=ADDR, mcs=4)
    node = StreamingNode(rings, cfg, tx_sink=TxSink())
    while True:
        h = (rng.normal(size=(2, 1)) + 1j * rng.normal(size=(2, 1))
             ) / np.sqrt(2.0)
        if np.abs(h).min() > 0.25:
            break
    pieces0, pieces1, psdus = [], [], []
    for i in range(3):
        hdr = MacHeader(addr1=ADDR, addr2=PEER, addr3=ADDR,
                        seq_ctrl=i << 4)
        psdu = append_fcs(hdr.pack()
                          + bytes(rng.integers(0, 256, 70,
                                               dtype=np.uint8)))
        psdus.append(psdu)
        y = h @ gn.modulate(psdu, 4)                 # (2, n)
        for a, ps in enumerate((pieces0, pieces1)):
            ps.append(np.zeros(900, np.complex64))
            ps.append(y[a].astype(np.complex64))
    for a, ps in enumerate((pieces0, pieces1)):
        ps.append(np.zeros(2700, np.complex64))
        x = np.concatenate(ps)
        x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
              ).astype(np.complex64) * 0.01
        rings[a].write(x)
    _drain(rings[0], node)
    assert node.stats.frame_ok == 3, node.report()
    assert [p for _, p in node.rx_payloads] == [p[24:-4] for p in psdus]
    for r in rings:
        r.close()


def test_node_11n_auto_mixed_stream_classes(rng):
    """Full HT auto: one batch carrying BOTH a 2-stream (MCS 9) and a
    single-stream (MCS 3) frame — the node runs both auto programs and
    picks the per-row winner by which HT-SIG+FCS closed."""
    from sora_tpu.golden import dot11n_np as gn

    rings = [RxRing(capacity=1 << 20), RxRing(capacity=1 << 20)]
    cfg = NodeConfig(phy="n", window=4096, batch=2, overlap=2816,
                     min_rate_mbps=9,
                     max_psdu=256, addr=ADDR)
    node = StreamingNode(rings, cfg, tx_sink=TxSink())
    while True:
        H2 = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
              ) / np.sqrt(2.0)
        if abs(np.linalg.det(H2)) > 0.3:
            break
    while True:
        h1 = (rng.normal(size=(2, 1)) + 1j * rng.normal(size=(2, 1))
              ) / np.sqrt(2.0)
        if np.abs(h1).min() > 0.25:
            break
    psdus, ys = [], []
    for i, (mcs, ch) in enumerate([(9, H2), (3, h1)]):
        hdr = MacHeader(addr1=ADDR, addr2=PEER, addr3=ADDR,
                        seq_ctrl=i << 4)
        psdu = append_fcs(hdr.pack()
                          + bytes(rng.integers(0, 256, 70,
                                               dtype=np.uint8)))
        psdus.append(psdu)
        ys.append(ch @ gn.modulate(psdu, mcs))
    for a in range(2):
        pieces = []
        for y in ys:
            pieces.append(np.zeros(900, np.complex64))
            pieces.append(y[a].astype(np.complex64))
        pieces.append(np.zeros(2700, np.complex64))
        x = np.concatenate(pieces)
        x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
              ).astype(np.complex64) * 0.01
        rings[a].write(x)
    _drain(rings[0], node)
    assert node.stats.frame_ok == 2, node.report()
    assert [p for _, p in node.rx_payloads] == [p[24:-4] for p in psdus]
    for r in rings:
        r.close()


def test_node_reconfigure_across_stream_classes(rng):
    """Live reconfigure from a 2-stream MCS to a single-stream MCS swaps
    in the 1ss program from the table (process_kb analogue across the
    stream classes)."""
    from sora_tpu.golden import dot11n_np as gn

    rings = [RxRing(capacity=1 << 20), RxRing(capacity=1 << 20)]
    cfg = NodeConfig(phy="n", window=4096, batch=2, overlap=2816,
                     min_rate_mbps=9,
                     max_psdu=256, addr=ADDR, mcs=9)
    node = StreamingNode(rings, cfg, tx_sink=TxSink())

    def send_frames(mcs, ch, seq0):
        psdus = []
        pieces = [[], []]
        for i in range(2):
            hdr = MacHeader(addr1=ADDR, addr2=PEER, addr3=ADDR,
                            seq_ctrl=(seq0 + i) << 4)
            psdu = append_fcs(hdr.pack()
                              + bytes(rng.integers(0, 256, 70,
                                                   dtype=np.uint8)))
            psdus.append(psdu)
            y = ch @ gn.modulate(psdu, mcs)
            for a in range(2):
                pieces[a].append(np.zeros(900, np.complex64))
                pieces[a].append(y[a].astype(np.complex64))
        for a in range(2):
            pieces[a].append(np.zeros(2700, np.complex64))
            x = np.concatenate(pieces[a])
            x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
                  ).astype(np.complex64) * 0.01
            rings[a].write(x)
        return psdus

    while True:
        H2 = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
              ) / np.sqrt(2.0)
        if abs(np.linalg.det(H2)) > 0.3:
            break
    send_frames(9, H2, 0)
    _drain(rings[0], node)
    assert node.stats.frame_ok == 2, node.report()

    node.reconfigure(mcs=3)
    h1 = np.array([[0.9 + 0.2j], [0.4 - 0.7j]])
    send_frames(3, h1, 4)
    _drain(rings[0], node)
    assert node.stats.frame_ok == 4, node.report()
    for r in rings:
        r.close()
