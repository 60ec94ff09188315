"""HBM-resident software air: the real-time path of the live node.

The reference's defining claim is SUSTAINED real-time 802.11 processing
(processing cost / signal duration < 1.0, kernel/bb/demod11/
MACStopwatch.h:37-60; the dedicated-core scheduler of
kernel/core/src/_scheduler_u.c:145-199 exists only to hit that bar).
On this harness the axon tunnel (~45 MB/s, ~50 ms RTT) cannot carry a
20 Msps I/Q stream the chip decodes 12x faster than real time, so the
round-4 node measured wall-clock ratio 15x: wire-bound, not
compute-bound.  This module removes the wire from the loop the same way
the reference removes the PCIe bottleneck with its RCB DMA ring: the
AIR lives in device HBM.

* A **waveform cache** (pre-modulated PSDUs, the reference's signal
  cache _signal_cache.c) is staged into HBM once.
* Each **round** advances the air by `hop*batch` samples in ONE jit:
  scatter the round's transmissions into the air buffer (entry, offset,
  amplitude descriptors — a few hundred bytes over the wire), add fresh
  receiver noise, window, and run the full one-jit RX pipeline.  Only
  decoded headers + per-candidate metadata come back (a few KB).
* An **air carry** (window overlap + one max frame length) threads
  rounds ON DEVICE, so the air is a gapless continuous 20 Msps stream:
  frames straddling a round boundary decode in the next round's first
  window, and receiver noise is generated exactly once per air sample.
* With ``n_receivers=2`` the same air is decoded through two
  independent receiver noise realizations (two physical nodes sharing
  a channel), which is what the two-node conversation demo uses.
* All three PHY families ride the same air (phy="a"/"b"/"n"; the HT
  air carries a 2-antenna axis), and all three sustained the < 1.0
  real-time bar for 62 s on this harness (REALTIME_*.json).

Host code (tools/realtime_soak.py, BatchMac below) talks to the air
only through descriptors and decoded headers, at batch granularity —
the MAC round-trip is one air batch (~86 ms), the batched analogue of
the reference's SIFS-scale loop.  The wall-clock-vs-air-time ratio of
the whole loop is the MACStopwatch bar at the system level.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from sora_tpu.mac import frame as fr
from sora_tpu.phy.dot11a import rx as arx
from sora_tpu.phy.dot11a import tx as jtx
from sora_tpu.phy.dot11b import rx as brx
from sora_tpu.util.xfer import device_complex


@jax.jit
def _cache_update(cache, idxs, waves):
    return cache.at[idxs].set(waves)


class DeviceAir:
    """Continuous device-resident air + one-jit air->RX round.

    waves: list of host complex waveforms (the TX cache; entry i is
    referenced by descriptors) — 1-D for phy "a"/"b", (2, n) per-chain
    pairs for phy "n" (the air carries an antenna axis).  All waves
    are zero-padded to a common length L on device; complex amplitude
    scaling happens per transmission descriptor (a multipath tap is
    just an extra delayed descriptor).

    phy selects the per-window decoder: "a" = 20 Msps OFDM
    (rx_pipeline_auto with multi-onset candidates + min_rate cap),
    "b" = 11 Msps DSSS (first-burst lock), "n" = 2x2 HT MIMO
    (first-plateau lock, min_mcs cap via ``min_rate_mbps``).  The
    single-candidate chains ("b"/"n") carry a geometry contract: the
    scheduler must keep hop <= inter-frame gap (so every frame has a
    window starting in its preceding gap — a clean head) and
    overlap >= frame span (containment).
    """

    def __init__(self, waves, *, window: int = 32768, batch: int = 64,
                 overlap: int = 6144, n_frames: int = 8,
                 n_decode: int = 0, slots: int = 384,
                 noise_rms: float = 0.02, max_psdu: int = 1504,
                 hdr_bytes: int = 64, n_receivers: int = 1,
                 min_rate_mbps: int = 6, min_mcs: int = 8,
                 pad_len: int = 0,
                 n_entries: int = 0, phy: str = "a", seed: int = 0):
        assert overlap < window
        assert phy in ("a", "b", "n")
        self.phy = phy    # "a": 20 Msps OFDM; "b": 11 Msps DSSS;
        #                   "n": 2x2 HT MIMO (two air "antennas")
        self.n_ant = 2 if phy == "n" else 1
        if phy in ("b", "n"):
            n_frames = 1  # these chains lock one onset per window;
            #               overlap covers the rest
        self.window, self.batch, self.overlap = window, batch, overlap
        self.hop = window - overlap
        self.nsamp = window + self.hop * (batch - 1)
        self.advance = self.hop * batch           # air samples per round
        self.slots = slots
        self.noise_rms = float(noise_rms)
        self.max_psdu = max_psdu
        self.hdr_bytes = hdr_bytes
        self.n_frames = n_frames
        self.n_decode = n_decode
        self.n_receivers = n_receivers
        self.min_rate_mbps = min_rate_mbps    # 11a air floor (Mbps)
        self.min_mcs = min_mcs                # HT air floor (MCS index)
        self._stage_fns: dict = {}
        A = self.n_ant
        waves = [np.atleast_2d(np.asarray(w, np.complex64))
                 for w in waves]                   # (A_w, n) each
        L = max([w.shape[1] for w in waves] + [pad_len])
        self.L = L = -(-L // 256) * 256
        n_entries = max(n_entries, len(waves))
        cache = np.zeros((n_entries, A, L), np.complex64)
        for i, w in enumerate(waves):
            assert w.shape[0] == A, (w.shape, A)
            cache[i, :, : w.shape[1]] = w
        self._cache = device_complex(cache)
        self.carry_len = self.nsamp - self.advance + L    # overlap + L
        rng = np.random.default_rng(seed)
        carry0 = (rng.normal(size=(A, self.carry_len))
                  + 1j * rng.normal(size=(A, self.carry_len))) * (
                      self.noise_rms / np.sqrt(2.0))
        self._carry = device_complex(carry0.astype(np.complex64))
        self._key = jax.random.PRNGKey(seed)
        self.base = 0                 # global sample index of air[0]
        self.round_idx = 0
        self._fn = jax.jit(self._round_impl)

    def set_entries(self, idxs, waves) -> None:
        """Re-stage waveform cache entries in HBM (host-modulated fresh
        frames — the conversation's per-seq data and per-round block-ack
        frames).  Chunked to a fixed shape of 16 rows so the update jit
        compiles once; a chunk is ~one wave upload (tens of KB), not a
        sample stream."""
        CH = 16
        if not idxs:
            return
        for c0 in range(0, len(idxs), CH):
            ii = list(idxs[c0: c0 + CH])
            ww = list(waves[c0: c0 + CH])
            w = np.zeros((CH, self.n_ant, self.L), np.complex64)
            ix = np.full((CH,), ii[0], np.int32)
            for k, (i, wv) in enumerate(zip(ii, ww)):
                wv = np.atleast_2d(np.asarray(wv, np.complex64))
                assert wv.shape[1] <= self.L, (wv.shape, self.L)
                w[k, :, : wv.shape[1]] = wv
                ix[k] = i
            for k in range(len(ii), CH):      # pad rows rewrite row 0
                w[k] = w[0]
            self._cache = _cache_update(self._cache, jnp.asarray(ix),
                                        device_complex(w))

    def stage_tx(self, idxs, psdus, rate: int) -> None:
        """Modulate PSDUs ON DEVICE (the TX mod graph, phy.dot11a.tx)
        straight into the HBM waveform cache — what a live node's TX
        path does; only the PSDU bytes cross the wire.  All PSDUs in a
        call share one length class."""
        if not idxs:
            return
        assert self.phy == "a", "on-device TX staging is the OFDM path"
        psdus = np.asarray(psdus, np.uint8)
        CH, plen = 128, int(psdus.shape[1])
        fn = self._stage_fns.get((plen, rate))
        if fn is None:
            def _stage(cache, ix, pb, _p=plen, _r=rate):
                w = jtx.modulate(pb, _r, _p)
                assert w.shape[1] <= self.L, (w.shape, self.L)
                wp = jnp.zeros((pb.shape[0], 1, self.L), w.dtype)
                wp = wp.at[:, 0, : w.shape[1]].set(w)
                return cache.at[ix].set(wp)

            fn = self._stage_fns[(plen, rate)] = jax.jit(_stage)
        for c0 in range(0, len(idxs), CH):
            ii = np.full((CH,), idxs[c0], np.int32)
            pb = np.repeat(psdus[c0: c0 + 1], CH, axis=0)
            n = min(CH, len(idxs) - c0)
            ii[:n] = idxs[c0: c0 + n]
            pb[:n] = psdus[c0: c0 + n]
            self._cache = fn(self._cache, jnp.asarray(ii), jnp.asarray(pb))

    # ---- the one-jit round --------------------------------------------------

    def _round_impl(self, cache, carry, key, round_idx, descs):
        n_air = self.nsamp + self.L
        A = self.n_ant
        air = jnp.zeros((A, n_air), jnp.complex64)
        air = air.at[:, : self.carry_len].set(carry)

        def put(i, a):
            e = descs[i, 0]
            off = jnp.clip(descs[i, 1], 0, self.nsamp)
            # complex per-transmission amplitude (milli-units): a
            # multipath tap is just an extra descriptor with a delayed
            # offset and a complex gain
            amp = jnp.where(e >= 0, jax.lax.complex(
                descs[i, 2].astype(jnp.float32),
                descs[i, 3].astype(jnp.float32)) * 1e-3, 0.0 + 0.0j)
            w = cache[jnp.maximum(e, 0)] * amp     # (A, L)
            cur = jax.lax.dynamic_slice(a, (0, off), (A, self.L))
            return jax.lax.dynamic_update_slice(a, cur + w, (0, off))

        air = jax.lax.fori_loop(0, self.slots, put, air)

        key = jax.random.fold_in(key, round_idx)
        kf, key = jax.random.split(key)
        sigma = self.noise_rms / np.sqrt(2.0)
        fresh = self.carry_len
        nz = jax.random.normal(kf, (2, A, n_air - fresh),
                               jnp.float32) * sigma
        air = air.at[:, fresh:].add(jax.lax.complex(nz[0], nz[1]))

        carry_out = jax.lax.dynamic_slice(air, (0, self.advance),
                                          (A, self.carry_len))

        starts = jnp.arange(self.batch) * self.hop
        idx = starts[:, None] + jnp.arange(self.window)[None, :]

        outs = []
        A = self.n_ant
        for r in range(self.n_receivers):
            kr, key = jax.random.split(key)
            wn = jax.random.normal(
                kr, (2, self.batch, A, self.window), jnp.float32)
            # per-receiver front-end noise on top of the shared air;
            # windows: (A, B, window) gather -> (B, A, window)
            xw = jnp.transpose(air[:, idx], (1, 0, 2)) + \
                jax.lax.complex(wn[0], wn[1]) * (0.5 * sigma)
            if self.phy == "b":
                out = brx.rx_pipeline_auto(xw[:, 0],
                                           max_psdu=self.max_psdu)
                out = dict(out)
                out["lts1"] = out["t0"]     # window-relative anchor
            elif self.phy == "n":
                from sora_tpu.phy.dot11n import rx as nrx
                out = nrx.rx_pipeline_auto(xw, max_psdu=self.max_psdu,
                                           min_mcs=self.min_mcs)
            else:
                out = arx.rx_pipeline_auto(
                    xw[:, 0], max_psdu=self.max_psdu,
                    n_frames=self.n_frames, n_decode=self.n_decode,
                    min_rate_mbps=self.min_rate_mbps)
            keep = {k: out[k] for k in
                    ("ok", "det", "length", "rate_mbps", "snr_db",
                     "lts1", "truncated") if k in out}
            if "src" in out:
                keep["src"] = out["src"]
            keep["hdr"] = out["psdu"][:, : self.hdr_bytes]
            outs.append(keep)
        return outs, carry_out

    # ---- host driver --------------------------------------------------------

    def step(self, tx: list[tuple[int, int, float]]):
        """Advance one round.  tx: (entry, LOCAL offset, amplitude)
        transmissions whose starts lie in [0, advance); returns the list
        of per-receiver output dicts of LAZY device arrays plus this
        round's global base sample index."""
        assert len(tx) <= self.slots, (len(tx), self.slots)
        descs = np.full((self.slots, 4), -1, np.int32)
        for i, (e, off, amp) in enumerate(tx):
            assert 0 <= off < self.nsamp, off
            amp = complex(amp)
            descs[i] = (e, off, int(round(amp.real * 1000.0)),
                        int(round(amp.imag * 1000.0)))
        outs, self._carry = self._fn(self._cache, self._carry, self._key,
                                     jnp.int32(self.round_idx),
                                     jnp.asarray(descs))
        base = self.base
        self.base += self.advance
        self.round_idx += 1
        return outs, base

    def cand_pos(self, out: dict, base: int) -> np.ndarray:
        """Global air position of every candidate row (host arrays)."""
        n_rows = np.asarray(out["lts1"]).shape[0]
        if "src" in out:
            w = np.asarray(out["src"]) // self.n_frames
        else:
            w = np.arange(n_rows) // self.n_frames
        return base + w * self.hop + np.asarray(out["lts1"])


# =============================================================================
# Batch-granularity MAC (the two-node conversation of the demo)
# =============================================================================


@dataclass
class BatchMacStats:
    sent: int = 0
    retransmits: int = 0
    delivered: int = 0         # receiver-side unique data frames
    acked: int = 0             # sender-side seqs confirmed
    rounds: int = 0


class BatchMac:
    """Stop-and-wait-window MAC at air-batch granularity.

    The sender streams sequenced data frames; the receiver returns ONE
    block-ack frame per round listing every sequence number it decoded
    (the batched analogue of 802.11 ACKs — at a ~86 ms batch RTT a
    per-frame SIFS ACK is meaningless, so this plays the role of
    802.11e BlockAck).  Unacked seqs retransmit after `timeout_rounds`.
    Frame loss (collisions, noise) is tolerated in both directions.
    """

    BA_MAGIC = b"BA"

    def __init__(self, addr: bytes, peer: bytes, *, n_seq: int,
                 payload: int = 1464, rate: int = 54,
                 timeout_rounds: int = 2, window_frames: int = 64,
                 ba_bits: int = 256):
        # bitmap span past the cumulative ack point: must cover the
        # in-flight window (>= window_frames) or a single loss freezes
        # the ack point and delivered-but-unackable frames retransmit
        self.BA_BITS = int(ba_bits)
        self.addr, self.peer = addr, peer
        self.n_seq = n_seq
        self.payload = payload
        self.rate = rate
        self.timeout = timeout_rounds
        self.window_frames = window_frames
        self.next_seq = 0
        self.outstanding: dict[int, int] = {}   # seq -> round sent
        self.acked: set[int] = set()
        self.rx_seqs: set[int] = set()
        self._ack_floor = 0        # cumulative ack point (amortized)
        self.new_rx: list[int] = []
        self.stats = BatchMacStats()

    # -- frame builders (host; modulated once into the cache by the tool)
    DT_MAGIC = b"DT"

    def data_psdu(self, seq: int) -> bytes:
        hdr = fr.MacHeader(addr1=self.peer, addr2=self.addr,
                           seq_ctrl=(seq & 0xFFF) << 4)
        body = self.DT_MAGIC + seq.to_bytes(4, "little")
        body += bytes((self.payload - len(body)) * [seq & 0xFF])
        return fr.append_fcs(hdr.pack() + body)

    def block_ack_psdu(self) -> bytes:
        """Cumulative ack point + bitmap (TCP-SACK-style BlockAck):
        every seq below `start` is acked, plus bitmap bit k for
        start+k.  Fits inside the hdr peek the air returns."""
        start = self._ack_floor
        while start in self.rx_seqs:
            start += 1
        self._ack_floor = start
        bitmap = bytearray(self.BA_BITS // 8)
        for k in range(self.BA_BITS):
            if start + k in self.rx_seqs:
                bitmap[k // 8] |= 1 << (k % 8)
        hdr = fr.MacHeader(addr1=self.peer, addr2=self.addr)
        body = self.BA_MAGIC + start.to_bytes(4, "little") + bytes(bitmap)
        return fr.append_fcs(hdr.pack() + body)

    # -- per-round logic
    def want_tx_seqs(self, round_idx: int, budget: int,
                     span_limit: int | None = None) -> list[int]:
        """Sequence numbers to transmit this round (retries first).

        ``span_limit`` bounds next_seq - oldest_outstanding: with seq ->
        cache-entry mapping seq % span_limit, this guarantees no two
        in-flight seqs share an entry (the tool's staging discipline)."""
        out = []
        for s, r0 in sorted(self.outstanding.items()):
            if round_idx - r0 >= self.timeout and len(out) < budget:
                out.append(s)
                self.outstanding[s] = round_idx
                self.stats.retransmits += 1
        oldest = min(self.outstanding) if self.outstanding else None
        while (len(out) < budget and self.next_seq < self.n_seq
               and len(self.outstanding) < self.window_frames
               and (span_limit is None or oldest is None
                    or self.next_seq - oldest < span_limit)):
            out.append(self.next_seq)
            self.outstanding[self.next_seq] = round_idx
            if oldest is None:
                oldest = self.next_seq
            self.next_seq += 1
        self.stats.sent += len(out)
        return out

    def consume(self, headers: np.ndarray, ok: np.ndarray) -> None:
        """Feed decoded candidate rows (hdr byte peeks + ok flags)."""
        self.new_rx = []
        for i in range(len(ok)):
            if not ok[i]:
                continue
            h = bytes(headers[i])
            if len(h) < 30:
                continue
            mh = fr.MacHeader.unpack(h[:24])
            if mh.addr1 != self.addr or mh.addr2 != self.peer:
                continue
            body = h[24:]
            if body[:2] == self.BA_MAGIC:        # block-ack for us
                start = int.from_bytes(body[2:6], "little")
                bitmap = body[6: 6 + self.BA_BITS // 8]

                def _ack(s):
                    self.outstanding.pop(s, None)
                    if s not in self.acked:
                        self.acked.add(s)
                        self.stats.acked += 1

                for s in [q for q in self.outstanding if q < start]:
                    _ack(s)
                for k in range(8 * len(bitmap)):
                    if bitmap[k // 8] & (1 << (k % 8)):
                        _ack(start + k)
            elif body[:2] == self.DT_MAGIC:       # data frame
                seq = int.from_bytes(body[2:6], "little")
                if seq not in self.rx_seqs:
                    self.rx_seqs.add(seq)
                    self.stats.delivered += 1
                    self.new_rx.append(seq)
        self.stats.rounds += 1

    @property
    def done(self) -> bool:
        return len(self.acked) >= self.n_seq
