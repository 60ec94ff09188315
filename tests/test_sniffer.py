"""Promiscuous sniffer (the umxsniffer analogue, kernel/bb/umxsniffer/):
every good-FCS frame logged regardless of destination, with type names,
a histogram, and pcap output."""

import io

import numpy as np

from sora_tpu.apps.sniffer import Sniffer, format_frame, read_pcap
from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import mgmt
from sora_tpu.mac.frame import MacHeader, append_fcs
from sora_tpu.runtime.native import RxRing
from sora_tpu.runtime.node import NodeConfig

A = b"\x02NODEA"
B = b"\x02NODEB"


def _air(rng):
    """Beacon + two data frames to different destinations + noise gaps."""
    bss = mgmt.Bss(bssid=A, ssid="net", rates_mbps=(6, 12))
    frames = [mgmt.build_beacon(bss, timestamp_us=1234),
              append_fcs(MacHeader(addr1=B, addr2=A, addr3=A,
                                   seq_ctrl=1 << 4).pack() + b"x" * 60),
              append_fcs(MacHeader(addr1=A, addr2=B, addr3=B,
                                   seq_ctrl=2 << 4).pack() + b"y" * 60)]
    pieces = []
    for f in frames:
        pieces.append(np.zeros(700, np.complex64))
        pieces.append(g.modulate(f, 12).astype(np.complex64))
    pieces.append(np.zeros(2100, np.complex64))
    x = np.concatenate(pieces)
    x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
          ).astype(np.complex64) * 0.01
    return x, frames


def _run(sniffer, ring):
    idle = 0
    while idle < 3:
        idle = 0 if sniffer.node.step() else idle + 1
    sniffer.node.flush()


def test_sniffer_captures_everything(rng, tmp_path):
    ring = RxRing(capacity=1 << 20)
    cfg = NodeConfig(window=4096, batch=2, overlap=2816, max_psdu=256,
                     min_rate_mbps=24)
    pcap = str(tmp_path / "cap.pcap")
    out = io.StringIO()
    sn = Sniffer(ring, cfg, pcap_path=pcap, out=out)
    x, frames = _air(rng)
    ring.write(x)
    _run(sn, ring)
    # promiscuous: all 3 frames regardless of addr1 (vs node's not_for_us)
    assert sum(sn.hist.values()) == 3, sn.summary()
    assert sn.hist["beacon"] == 1 and sn.hist["data"] == 2
    # console table has one line per frame with names + addresses
    lines = [l for l in out.getvalue().splitlines() if l.strip()]
    assert len(lines) == 3
    assert any("beacon" in l for l in lines)
    assert any("02:4e:4f:44:45:42" in l for l in lines)   # B as dest
    # pcap round-trips byte-identical frames in capture order
    sn.close()
    rec = read_pcap(pcap)
    assert [f for _, f in rec] == [m["psdu"] for m in sn.frames]
    ring.close()


def test_fc_names():
    assert mgmt.fc_name(mgmt.FC_BEACON) == "beacon"
    assert mgmt.fc_name(mgmt.FC_ACK) == "ack"
    assert mgmt.fc_name(mgmt.FC_DATA) == "data"
    assert mgmt.fc_name(mgmt.FC_AUTH) == "auth"
    assert "st" in mgmt.fc_name(0x00E4)       # unknown subtype fallback


def test_format_frame_ack():
    meta = {"psdu": bytes.fromhex("d4000000") + A + b"\x00" * 4,
            "pos": 20000, "rate_mbps": 6.0, "snr_db": 23.0}
    line = format_frame(meta, 20e6)
    assert "ack" in line and "02:4e:4f:44:45:41" in line
    assert "1.000ms" in line
