"""Live streaming SDR node: RX ring -> batched device decode -> soft MAC
-> pre-staged TX.

This is the umxsdrbrick analogue — the reference's defining capability: a
*running radio*.  `Dot11_main` boots the radio, maps the RX DMA ring,
starts RX/Viterbi/TX threads, and the MAC polls the demod graph
(kernel/bb/umxsdrbrick/dot11main.cpp:365-457, mac.cpp:190-345,
rxstream.hpp:37-64).  The TPU redesign replaces the thread pipeline with a
windowed, double-buffered device feed:

* The native ring (runtime.native.RxRing) is the SORA_RADIO_RX_STREAM: a
  producer thread (paced replay, or live writes) fills it; the node is a
  vstream reader.
* Samples accumulate into fixed-shape overlapping windows; a batch of
  windows is shipped with ``device_put`` and decoded by ONE jit program
  (the mixed-rate rx_pipeline_auto — the whole RX graph incl. Viterbi).
* JAX async dispatch is the TThreadSeparator: the node issues the decode
  for batch k+1 before fetching batch k's results, so host MAC work and
  device decode overlap (P4 of SURVEY §2.9).
* A cheap carrier-sense jit (detect_only) gates the full decode — the
  TCCA11a no-energy early exit (cca.hpp:165-230): idle air costs the sync
  front end only, never the Viterbi.
* Decoded data frames are ACKed from a precomputed-waveform SignalCache
  (sub-SIFS fire, _signal_cache.h:1-60) into a TX sink that can loop back
  into a ring (the software air) or just stage waveforms (the
  SoraURadioTransferEx analogue, _tx_manager2.c:91-556).

Error taxonomy mirrors the reference's err_stat[] status page
(umxsdrbrick/mgmt.h:81): cs_timeout / plcp_fail / crc_fail / frame_ok...
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from sora_tpu.mac.csma import SignalCache
from sora_tpu.mac.frame import MacHeader, build_ack_frame
from sora_tpu.mac import mgmt
from sora_tpu.util.stopwatch import MacStopwatch


@dataclass
class NodeConfig:
    window: int = 8192            # samples per decode window (at input rate)
    batch: int = 8                # windows per device batch
    overlap: int = 2048           # window overlap >= max frame samples
    input_rate: str = "20m"       # "20m" | "40m" (on-device front end)
    max_psdu: int = 1600
    rate_mbps: int | None = None  # None = mixed-rate auto dispatch
    ack_rate: int = 6
    addr: bytes = b"\x02SORA1"
    sample_rate_sps: float = 20e6
    detect_threshold: float = 0.6
    promiscuous: bool = False     # sniffer mode: log every frame, no ACKs
    backlog_hwm: int = 0          # ring backlog watchdog (0 = auto)


@dataclass
class ErrStats:
    """err_stat[] + print_status analogue (mgmt.h:81)."""
    windows: int = 0
    cs_timeout: int = 0           # windows with no carrier detected
    decoded_batches: int = 0
    frame_ok: int = 0
    plcp_fail: int = 0
    crc_fail: int = 0
    dup: int = 0
    not_for_us: int = 0
    acks_tx: int = 0
    ring_drops: int = 0
    backlog_dropped: int = 0      # samples skipped by the watchdog
    ack_latency_s: list = field(default_factory=list)

    def status_page(self) -> str:
        lines = ["-- node status ------------------------------",
                 f" windows      {self.windows:8d}   cs_timeout "
                 f"{self.cs_timeout:8d}",
                 f" batches      {self.decoded_batches:8d}   ring_drops "
                 f"{self.ring_drops:8d}",
                 f" frame_ok     {self.frame_ok:8d}   dup        "
                 f"{self.dup:8d}",
                 f" plcp_fail    {self.plcp_fail:8d}   crc_fail   "
                 f"{self.crc_fail:8d}",
                 f" not_for_us   {self.not_for_us:8d}   acks_tx    "
                 f"{self.acks_tx:8d}",
                 f" backlog_drop {self.backlog_dropped:8d}"]
        if self.ack_latency_s:
            a = np.asarray(self.ack_latency_s)
            lines.append(f" ack latency  avg {a.mean()*1e6:7.0f} us  "
                         f"max {a.max()*1e6:7.0f} us")
        lines.append("---------------------------------------------")
        return "\n".join(lines)


class TxSink:
    """Pre-staged TX path: `stage` precomputes/fetches the waveform (the
    SoraURadioTransferEx step), `fire` sends it (SoraURadioTx).  With a
    ring attached, fired waveforms mix back into the receive path — the
    software air."""

    def __init__(self, ring=None):
        self.ring = ring
        self.fired: list[tuple[float, int]] = []     # (t, n_samples)

    def fire(self, wave: np.ndarray) -> None:
        self.fired.append((time.perf_counter(), len(wave)))
        if self.ring is not None:
            self.ring.write(np.asarray(wave, np.complex64))


class StreamingNode:
    """One receive chain bound to an RX ring vstream."""

    def __init__(self, ring, cfg: NodeConfig | None = None,
                 tx_sink: TxSink | None = None,
                 modulate: Callable | None = None,
                 on_payload: Callable | None = None,
                 on_frame: Callable | None = None):
        import jax

        self.ring = ring
        self.cfg = cfg or NodeConfig()
        self.vs = ring.alloc_vstream()
        self.tx = tx_sink or TxSink()
        self.stats = ErrStats()
        self.sw = MacStopwatch(sample_rate=self.cfg.sample_rate_sps)
        self.on_payload = on_payload
        self.on_frame = on_frame     # sniffer tap: meta dict per rx frame
        self.rx_payloads: list[tuple[bytes, bytes]] = []
        if modulate is None:
            from sora_tpu.golden import dot11a_np as g

            def modulate(psdu, rate):
                w = g.modulate(psdu, rate).astype(np.complex64)
                if self.cfg.input_rate == "40m":
                    from sora_tpu.phy import frontend as fe
                    import jax.numpy as jnp
                    w = np.asarray(fe.upsample2(jnp.asarray(w[None]))[0])
                return w
        self.cache = SignalCache(modulate)
        self._jax = jax
        self._carry = np.zeros(0, np.complex64)
        self._abs_off = 0                   # stream position of carry[0]
        self._backlog_hwm = (self.cfg.backlog_hwm
                             or 8 * self.cfg.batch * self.cfg.window)
        self._pend: list[tuple[dict, list, float]] = []   # double buffer
        self._seen: dict[tuple[bytes, int], int] = {}     # dedup (hdr, pos)
        self._seen_order: list = []
        self._decode = None
        self._detect = None
        self._build_programs()

    # -- device programs -------------------------------------------------------

    def _build_programs(self):
        from sora_tpu.phy.dot11a import rx as arx

        cfg = self.cfg
        if cfg.rate_mbps is None:
            self._decode = lambda xb: arx.rx_pipeline_auto(
                xb, max_psdu=cfg.max_psdu, input_rate=cfg.input_rate)
        else:
            self._decode = lambda xb: arx.rx_pipeline(
                xb, cfg.rate_mbps, max_psdu=cfg.max_psdu,
                input_rate=cfg.input_rate)

        def detect(xb):
            if cfg.input_rate == "40m":
                from sora_tpu.phy import frontend as fe
                xb = fe.ofdm_frontend_40m(xb)
            return arx.detect_only(xb)

        self._detect = detect

    def warm_up(self) -> None:
        """Compile both programs on a zero batch (dot11main's graph build,
        before the radio starts).  Synchronizes with a host fetch — on the
        axon backend only a device->host transfer truly blocks."""
        from sora_tpu.util.xfer import device_complex

        z = np.zeros((self.cfg.batch, self.cfg.window), np.complex64)
        zd = device_complex(z)
        det, power = self._detect(zd)
        np.asarray(det)
        out = self._decode(zd)
        np.asarray(out["ok"])

    # -- ring consumption ------------------------------------------------------

    def _next_windows(self) -> tuple[np.ndarray, list] | None:
        """Assemble up to `batch` overlapping windows from the ring.
        Returns (x (B, window) complex64, metas) or None if not enough
        samples arrived yet."""
        cfg = self.cfg
        hop = cfg.window - cfg.overlap
        need = cfg.window + hop * (cfg.batch - 1) - len(self._carry)
        if need > 0:
            got = self.ring.read(self.vs, need)
            if len(got):
                self._carry = np.concatenate([self._carry, got])
        total = cfg.window + hop * (cfg.batch - 1)
        if len(self._carry) < total:
            return None
        x = np.empty((cfg.batch, cfg.window), np.complex64)
        metas = []
        for i in range(cfg.batch):
            s = i * hop
            x[i] = self._carry[s: s + cfg.window]
            metas.append(self._abs_off + s)
        adv = hop * cfg.batch
        self._carry = self._carry[adv:]
        self._abs_off += adv
        return x, metas

    # -- main loop -------------------------------------------------------------

    def skip_backlog(self) -> int:
        """Watchdog: when the consumer has fallen behind (ring backlog past
        the high-water mark), drop buffered samples and resume at the live
        edge — the reference's Seek(END_POS) backlog flush
        (rxstream.hpp:56-64, mac.cpp:247-249).  Returns samples dropped."""
        dropped = 0
        avail = self.ring.available(self.vs)
        while avail > self._backlog_hwm:
            got = self.ring.read(self.vs, min(avail, 1 << 18))
            dropped += len(got)
            avail = self.ring.available(self.vs)
        if dropped:
            self._carry = np.zeros(0, np.complex64)
            self._abs_off += dropped        # keep positions monotonic
            self.stats.backlog_dropped += dropped
        return dropped

    def step(self) -> bool:
        """One poll iteration: assemble a batch, CS-gate it, issue the
        decode asynchronously, retire the oldest in-flight batch.  Returns
        True if any work was done (the MAC11a_Receive loop body)."""
        self.skip_backlog()
        nw = self._next_windows()
        if nw is None:
            self._retire(block=False)
            return False
        x, metas = nw
        t0 = time.perf_counter()
        from sora_tpu.util.xfer import device_complex

        xd = device_complex(x)
        self.stats.windows += self.cfg.batch
        det, power = self._detect(xd)
        det = np.asarray(det)
        if (det < self.cfg.detect_threshold).all():
            self.stats.cs_timeout += self.cfg.batch
            self.sw.add(x.size, time.perf_counter() - t0)
            self._retire(block=False)
            return True
        out = self._decode(xd)           # async: returns futures
        self._pend.append((out, metas, t0, x.size))
        # double buffering: retire only when 2 batches are in flight
        while len(self._pend) > 1:
            self._retire(block=True)
        return True

    def flush(self) -> None:
        """Process the carry-buffer remnant (zero-padded to a full batch)
        and retire every in-flight batch — the MAC's Flush/Reset/Seek(END)
        quiesce (mac.cpp:237-249), where pinqueue pad() fills the last
        burst (pinqueue.h:133-145)."""
        cfg = self.cfg
        if len(self._carry) > 0:
            hop = cfg.window - cfg.overlap
            total = cfg.window + hop * (cfg.batch - 1)
            pad = total - len(self._carry)
            if pad > 0:
                self._carry = np.concatenate(
                    [self._carry, np.zeros(pad, np.complex64)])
            self.step()
        while self._pend:
            self._retire(block=True)

    def _retire(self, block: bool) -> None:
        if not self._pend:
            return
        if not block and len(self._pend) < 2:
            return
        out, metas, t0, nsamp = self._pend.pop(0)
        host = {k: np.asarray(v) for k, v in out.items()}
        self._dispatch(host, metas)
        self.sw.add(nsamp, time.perf_counter() - t0)
        self.stats.decoded_batches += 1
        self.stats.ring_drops = self.ring.drops(self.vs)

    # -- MAC dispatch ----------------------------------------------------------

    def _dispatch(self, out: dict, metas: list) -> None:
        cfg = self.cfg
        sub = 2 if cfg.input_rate == "40m" else 1
        for i in range(len(metas)):
            if not out["ok"][i]:
                if not out["cs_ok"][i]:
                    self.stats.cs_timeout += 1
                elif not out["sig_ok"][i]:
                    self.stats.plcp_fail += 1
                else:
                    self.stats.crc_fail += 1
                continue
            n = int(out["length"][i])
            psdu = bytes(out["psdu"][i][:n])
            # dedup across overlapping windows by absolute sample position
            pos = metas[i] + int(out["lts1"][i]) * sub
            key = psdu[:24]          # header incl. seq_ctrl
            # a true duplicate (same frame seen through two overlapping
            # windows) lands at the SAME absolute stream position, up to
            # sync jitter; a looped replay of the same bytes lands much
            # further away and must count as a fresh frame
            old = self._seen.get(key)
            if old is not None and abs(old - pos) <= 64:
                self.stats.dup += 1
                continue
            self._seen[key] = pos
            self._seen_order.append(key)
            if len(self._seen_order) > 4096:
                self._seen.pop(self._seen_order.pop(0), None)
            if self.on_frame is not None:
                meta = {"psdu": psdu, "pos": pos}
                for k in ("rate_mbps", "snr_db", "det", "cfo"):
                    if k in out:
                        meta[k] = float(out[k][i])
                self.on_frame(meta)
            self._handle_frame(psdu, t_decode=time.perf_counter())

    def _handle_frame(self, psdu: bytes, t_decode: float) -> None:
        cfg = self.cfg
        ftype = mgmt.frame_type(psdu)
        if ftype == mgmt.FC_ACK:
            self.stats.frame_ok += 1
            return
        if len(psdu) < 28:
            self.stats.crc_fail += 1
            return
        hdr = MacHeader.unpack(psdu[:24])
        wants_us = hdr.addr1 in (cfg.addr, b"\xff" * 6)
        if not (wants_us or cfg.promiscuous):
            self.stats.not_for_us += 1
            return
        self.stats.frame_ok += 1
        self.rx_payloads.append((hdr.addr2, psdu[24:-4]))
        if self.on_payload is not None:
            self.on_payload(hdr.addr2, psdu[24:-4])
        if hdr.addr1 == cfg.addr and not cfg.promiscuous:
            ack = build_ack_frame(hdr.addr2)
            wave = self.cache.get(ack, cfg.ack_rate)       # pre-staged
            self.tx.fire(wave)
            self.stats.acks_tx += 1
            self.stats.ack_latency_s.append(
                time.perf_counter() - t_decode)

    # -- reporting -------------------------------------------------------------

    def report(self) -> str:
        return (self.stats.status_page() + "\n"
                + "realtime: " + str(self.sw.report()))
