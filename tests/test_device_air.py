"""Device-resident software air (runtime/device_air.py): continuity
across rounds, decode of scheduled transmissions, on-device TX staging,
and the batch-granularity two-node MAC conversation.

These are the correctness gates behind the real-time demonstration
(tools/realtime_soak.py): the air must be a gapless continuous stream
(carry), frames straddling a round boundary must decode in the next
round, and the BatchMac block-ack/retransmit loop must deliver every
sequence number even under injected loss.
"""

from __future__ import annotations

import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.runtime.device_air import BatchMac, DeviceAir

W, OV, B = 4096, 1536, 4          # hop 2560, advance 10240


def _mk_air(waves, **kw):
    kw.setdefault("window", W)
    kw.setdefault("batch", B)
    kw.setdefault("overlap", OV)
    kw.setdefault("n_frames", 3)
    kw.setdefault("slots", 8)
    kw.setdefault("noise_rms", 0.01)
    kw.setdefault("max_psdu", 256)
    kw.setdefault("min_rate_mbps", 54)
    return DeviceAir(waves, **kw)


def _match(air, out, base, global_off, tol=600):
    """True iff some ok candidate sits at the scheduled position."""
    ok = np.asarray(out["ok"]).astype(bool)
    pos = air.cand_pos(out, base)
    return bool(np.any(ok & (np.abs(pos - (global_off + 192)) < tol)))


def test_decode_and_boundary_continuity():
    psdus = [fr.build_data_frame(bytes([i]) * 80, seq=i) for i in range(3)]
    waves = [g.modulate(p, 54) for p in psdus]
    span = len(waves[0])
    air = _mk_air(waves)
    adv = air.advance

    # round 0: two clean frames + one STRADDLING the round boundary
    # (starts `span - 300` before the end, so 300 samples of it spill
    # into round 1's air via the device-side carry)
    offs0 = [(0, 400), (1, 5000), (2, adv - span + 300)]
    outs0, base0 = air.step([(e, o, 1.0) for e, o in offs0])
    # round 1: one more frame
    offs1 = [(0, 3000)]
    outs1, base1 = air.step([(e, o, 1.0) for e, o in offs1])
    o0, o1 = outs0[0], outs1[0]

    assert _match(air, o0, base0, 400)
    assert _match(air, o0, base0, 5000)
    for e, off in offs1:
        assert _match(air, o1, base1, base1 + off)
    # the straddler decodes from round 1's first window (carry)
    straddle_pos = base0 + adv - span + 300
    assert _match(air, o0, base0, straddle_pos) or \
        _match(air, o1, base1, straddle_pos)

    # payload integrity: some ok row's header matches psdu[0]'s header
    hdr = np.asarray(o0["hdr"])
    ok = np.asarray(o0["ok"]).astype(bool)
    want = np.frombuffer(psdus[0][: air.hdr_bytes], np.uint8)
    assert any(np.array_equal(hdr[i][: len(want)], want)
               for i in range(len(ok)) if ok[i])


def test_empty_air_is_quiet():
    w = [g.modulate(fr.build_data_frame(b"x" * 40, seq=0), 54)]
    air = _mk_air(w)
    outs, _ = air.step([])
    ok = np.asarray(outs[0]["ok"])
    assert int(ok.sum()) == 0


def test_stage_tx_on_device():
    psdu = fr.build_data_frame(b"A" * 64, seq=9)
    air = _mk_air([np.zeros(2048, np.complex64)], n_entries=4)
    air.stage_tx([2], np.frombuffer(psdu, np.uint8)[None, :], 54)
    outs, base = air.step([(2, 1200, 1.0)])
    assert _match(air, outs[0], base, 1200)
    hdr = np.asarray(outs[0]["hdr"])
    ok = np.asarray(outs[0]["ok"]).astype(bool)
    want = np.frombuffer(psdu[: air.hdr_bytes], np.uint8)
    assert any(np.array_equal(hdr[i][: len(want)], want)
               for i in range(len(ok)) if ok[i])


@pytest.mark.slow
def test_batchmac_conversation_with_loss():
    """A streams sequenced data to B over the shared device air; B
    block-acks each round; an injected loss round forces retransmits;
    every seq must end acked."""
    A, Badr = b"\x02AAAAA", b"\x02BBBBB"
    ma = BatchMac(A, Badr, n_seq=6, payload=48, timeout_rounds=2)
    mb = BatchMac(Badr, A, n_seq=0, payload=48)

    data_len = len(ma.data_psdu(0))
    ba_len = len(mb.block_ack_psdu())
    air = _mk_air([np.zeros(2048, np.complex64)], n_entries=16,
                  n_receivers=2, slots=8)

    per_round = 2
    span = 2048
    for rnd in range(14):
        tx = []
        seqs = ma.want_tx_seqs(rnd, per_round)
        if seqs:
            air.stage_tx([s % 8 for s in seqs],
                         np.stack([np.frombuffer(ma.data_psdu(s), np.uint8)
                                   for s in seqs]), 54)
            # loss injection: round 1's data goes out at -60 dB
            amp = 0.001 if rnd == 1 else 1.0
            tx += [(s % 8, 200 + i * (span + 200), amp)
                   for i, s in enumerate(seqs)]
        if mb.rx_seqs:
            air.stage_tx([8], np.frombuffer(mb.block_ack_psdu(),
                                            np.uint8)[None, :], 54)
            tx.append((8, air.advance - span - 200, 1.0))
        outs, base = air.step(tx)
        oa, ob = outs[0], outs[1]
        ma.consume(np.asarray(oa["hdr"]), np.asarray(oa["ok"]))
        mb.consume(np.asarray(ob["hdr"]), np.asarray(ob["ok"]))
        if ma.done:
            break

    assert ma.done, (sorted(ma.acked), ma.stats)
    assert ma.stats.retransmits >= 1          # the loss round forced one
    assert mb.stats.delivered == 6
    assert data_len <= air.max_psdu and ba_len <= air.max_psdu


def test_multipath_taps_as_descriptors():
    """On-device propagation synthesis: a transmission plus delayed
    complex-gain descriptors (one per tap) decodes through the 4-tap
    in-CP channel — the impaired real-time soak's mechanism."""
    psdu = fr.build_data_frame(b"M" * 100, seq=2)
    w = g.modulate(psdu, 24)
    air = _mk_air([w], min_rate_mbps=24, slots=8)
    taps = [(0, 1.0), (3, 0.45 * np.exp(0.9j)),
            (7, 0.2 * np.exp(-2.1j)), (11, 0.08 * np.exp(0.3j))]
    outs, base = air.step([(0, 600 + d, c) for d, c in taps])
    assert _match(air, outs[0], base, 600)
    hdr = np.asarray(outs[0]["hdr"])
    ok = np.asarray(outs[0]["ok"]).astype(bool)
    want = np.frombuffer(psdu[: air.hdr_bytes], np.uint8)
    assert any(np.array_equal(hdr[i][: len(want)], want)
               for i in range(len(ok)) if ok[i])


def test_dsss_phy_device_air():
    """phy="b": the device air drives the DSSS chain (11 Msps chips,
    first-burst lock — the windowed-decode contract is hop <= gap and
    overlap >= span, as in the 11 Mbps real-time soak)."""
    from sora_tpu.golden import dot11b_np as gb

    psdus = [fr.build_data_frame(bytes([i]) * 40, seq=i)
             for i in range(2)]
    waves = [gb.modulate(p, 11).astype(np.complex64) for p in psdus]
    span = max(len(w) for w in waves)
    air = DeviceAir(waves, window=4608, batch=8, overlap=3072,
                    slots=8, noise_rms=0.01, max_psdu=128,
                    hdr_bytes=64, phy="b")
    assert span <= air.overlap and air.n_frames == 1
    # hop = 1536; schedule with gaps > hop so each frame is
    # first-in-window for at least one window
    offs = [500, 500 + span + 1700]
    outs, base = air.step([(i, o, 1.0) for i, o in enumerate(offs)])
    o = outs[0]
    ok = np.asarray(o["ok"]).astype(bool)
    pos = air.cand_pos(o, base)
    for off in offs:
        assert np.any(ok & (np.abs(pos - off) < 1500)), (off, pos[ok])
    hdr = np.asarray(o["hdr"])
    want = np.frombuffer(psdus[0][: air.hdr_bytes], np.uint8)
    assert any(np.array_equal(hdr[i][: len(want)], want)
               for i in range(len(ok)) if ok[i])


def test_ht_mimo_phy_device_air():
    """phy="n": two-antenna air — the 2x2 HT waveform's both chains ride
    the device air and the MIMO auto pipeline decodes per window (the
    11n real-time soak's mechanism)."""
    from sora_tpu.golden import dot11n_np as gn

    psdus = [fr.build_data_frame(bytes([i]) * 60, seq=i)
             for i in range(2)]
    waves = [np.asarray(gn.modulate(p, 11)) for p in psdus]   # (2, n)
    span = max(w.shape[1] for w in waves)
    air = DeviceAir(waves, window=4096, batch=8, overlap=2048,
                    slots=8, noise_rms=0.01, max_psdu=128,
                    hdr_bytes=64, phy="n")
    assert span <= air.overlap and air.n_ant == 2
    offs = [300, 300 + span + 2100]      # gaps > hop (2048)
    outs, base = air.step([(i, o, 1.0) for i, o in enumerate(offs)])
    o = outs[0]
    ok = np.asarray(o["ok"]).astype(bool)
    pos = air.cand_pos(o, base)
    for off in offs:
        assert np.any(ok & (np.abs(pos - off) < 1200)), (off, pos[ok])
    hdr = np.asarray(o["hdr"])
    want = np.frombuffer(psdus[0][: air.hdr_bytes], np.uint8)
    assert any(np.array_equal(hdr[i][: len(want)], want)
               for i in range(len(ok)) if ok[i])
